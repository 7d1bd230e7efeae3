"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship tiered rollup on sf0.001;
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (same column names,
doubles rounded to 6 dp on BOTH sides so value-hashes compare stably).

The engine's native input is a transcripts table (conv_id, turn_idx, role,
text, tool, ts). The driver's testdata has no transcripts table, so queries
run over a deterministic transcripts-shaped projection of ``events``
(FIXTURES.md A.3): conv_id = user_id, turn order = (ts, event_id), text =
props, plus events.value as a generic numeric signal.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --- shared projection ------------------------------------------------------

# DuckDB CTEs defining the same transcripts projection used by the Spark side.
_T_SQL = """
t AS (
  SELECT cast(user_id AS varchar) AS conv_id,
         cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int) AS turn_idx,
         event_type AS role, props AS text, event_type AS tool, ts, value
  FROM events
)
"""

_D_SQL = """
d AS (
  SELECT conv_id, turn_idx, ts, value,
         cast(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS double) AS token_count,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)) / 1000000.0 AS latency_s
  FROM t
)
"""

_LONG_SQL = """
l AS (
  SELECT conv_id, ts, 'token_count' AS metric, token_count AS value FROM d
  UNION ALL
  SELECT conv_id, ts, 'latency_s' AS metric, latency_s AS value FROM d WHERE latency_s IS NOT NULL
)
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → transcripts(conv_id, turn_idx, role, text, tool, ts) [+ value]."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.col("event_type").alias("tool"),
        "ts",
        "value",
    )


def _signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(conv_id, turn_idx, ts, value) — events.value as the per-series signal."""
    return _transcripts(spark, sf_dir).select("conv_id", "turn_idx", "ts", "value")


def _round6(df: DataFrame, *cols: str, digits: int = 6) -> DataFrame:
    """Round doubles with an EXPLICIT half-up convention.

    Spark's round() is HALF_UP but DuckDB's is half-even, so exact halves
    (binary fractions like x.xx78125) would hash-mismatch; floor(x*10^d+0.5)
    evaluates identically in both engines. Queries over higher-variance
    aggregates (e.g. var_pop sums whose engines differ in the last ulp) use
    fewer digits so a 1-ulp difference can't straddle the boundary."""
    scale = float(10**digits)
    for c in cols:
        v = F.col(c).cast("double")
        df = df.withColumn(c, F.floor(v * scale + F.lit(0.5)) / scale)
    return df


def _r6(expr: str, alias: str, digits: int = 6) -> str:
    """The DuckDB-side twin of _round6."""
    scale = 10**digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}.0 AS {alias}"


_ROLLUP_CORE = "cnt bigint, sum double, mean double, min double, max double, p50 double, p99 double"


# --- queries ----------------------------------------------------------------


def _q_rollup(tier: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from transcriptts.rollup import rollup, with_derived_metrics

        r = rollup(with_derived_metrics(_transcripts(spark, sf_dir)), tier)
        return _round6(r, "sum", "mean", "min", "max", "p50", "p99")

    return q


def _sql_rollup(trunc: str) -> str:
    return f"""
WITH {_T_SQL}, {_D_SQL}, {_LONG_SQL}
SELECT conv_id, cast(date_trunc('{trunc}', ts) AS timestamp) AS bucket_start, metric,
       count(*) AS cnt, {_r6('sum(value)', 'sum')}, {_r6('avg(value)', 'mean')},
       {_r6('min(value)', 'min')}, {_r6('max(value)', 'max')},
       {_r6('quantile_cont(value, 0.5)', 'p50')}, {_r6('quantile_cont(value, 0.99)', 'p99')}
FROM l GROUP BY 1, 2, 3
"""


def _q_rollup_1h_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h tier via the one-raw-shuffle hierarchical path (1m partials with
    value multisets → merged exactly). `sum`/`mean` are deterministic folds
    over the sorted multiset (rollup._finalize_partials), so the oracle
    reproduces them bit-for-bit with the same sorted fold. Single-tier
    request → no partials are cached (nothing to unpersist)."""
    from transcriptts.rollup import rollup_tiers_hierarchical

    tiers = rollup_tiers_hierarchical(_transcripts(spark, sf_dir), tiers=("1h",))
    return _round6(tiers["1h"], "sum", "mean", "min", "max", "p50", "p99")


# Same rows as _sql_rollup('hour'), but sum/mean via the identical
# sorted-multiset left fold the hierarchical path uses (list_reduce seeds
# with vs[1]; Spark's F.aggregate seeds 0.0 and 0.0+x == x exactly).
_SQL_ROLLUP_HIER = f"""
WITH {_T_SQL}, {_D_SQL}, {_LONG_SQL},
g AS (
  SELECT conv_id, cast(date_trunc('hour', ts) AS timestamp) AS bucket_start, metric,
         count(*) AS cnt, min(value) AS mn, max(value) AS mx,
         quantile_cont(value, 0.5) AS q50, quantile_cont(value, 0.99) AS q99,
         list(value ORDER BY value) AS vs
  FROM l GROUP BY 1, 2, 3
)
SELECT conv_id, bucket_start, metric, cnt,
       {_r6('list_reduce(vs, (acc, x) -> acc + x)', 'sum')},
       {_r6('list_reduce(vs, (acc, x) -> acc + x) / cnt', 'mean')},
       {_r6('mn', 'min')}, {_r6('mx', 'max')},
       {_r6('q50', 'p50')}, {_r6('q99', 'p99')}
FROM g
"""


def _q_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.rollup import downsample

    return downsample(_signal(spark, sf_dir), 4, "value")


_SQL_DOWNSAMPLE = f"""
WITH {_T_SQL}
SELECT conv_id, cast(turn_idx // 4 AS bigint) AS pos, value
FROM t WHERE turn_idx % 4 = 0
"""


def _q_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.rollup import segment_agg

    s = segment_agg(_signal(spark, sf_dir), 8, "value")
    return _round6(s, "seg_mean", "seg_median", "seg_min", "seg_max")


_SQL_SEGMENT_STATS = f"""
WITH {_T_SQL}
SELECT conv_id, cast(turn_idx // 8 AS bigint) AS seg,
       {_r6('avg(value)', 'seg_mean')}, {_r6('quantile_cont(value, 0.5)', 'seg_median')},
       {_r6('min(value)', 'seg_min')}, {_r6('max(value)', 'seg_max')}, count(*) AS seg_cnt
FROM t GROUP BY 1, 2
"""


def _hourly_value_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h rollup of events.value per user — input for the gap-fill queries."""
    t = _transcripts(spark, sf_dir)
    return (
        t.groupBy("conv_id", F.window("ts", "1 hour").alias("w"))
        .agg(F.count("value").alias("cnt"), F.avg("value").alias("mean"))
        .select("conv_id", F.col("w.start").alias("bucket_start"), F.lit("value").alias("metric"), "cnt", "mean")
    )


def _q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.gapfill import gapfill

    g = gapfill(_hourly_value_rollup(spark, sf_dir), "1h", ("mean",), mode="both")
    out = g.select("conv_id", "bucket_start", "is_gap", "mean_locf", "mean_interp")
    return _round6(out, "mean_locf", "mean_interp")


_SQL_GAPFILL = f"""
WITH {_T_SQL},
r AS (SELECT conv_id, date_trunc('hour', ts) AS b, count(*) AS cnt, avg(value) AS mean FROM t GROUP BY 1, 2),
s AS (SELECT conv_id, min(b) AS bmin, max(b) AS bmax FROM r GROUP BY 1),
g AS (SELECT conv_id, unnest(generate_series(bmin, bmax, interval 1 hour)) AS b FROM s),
j AS (SELECT g.conv_id, g.b, r.mean FROM g LEFT JOIN r ON r.conv_id = g.conv_id AND r.b = g.b)
SELECT conv_id, b AS bucket_start, mean IS NULL AS is_gap,
       {_r6('last_value(mean IGNORE NULLS) OVER w_back', 'mean_locf')},
       {_r6('''CASE WHEN mean IS NOT NULL THEN mean ELSE
         last_value(mean IGNORE NULLS) OVER w_back
         + (epoch(b) - last_value(CASE WHEN mean IS NOT NULL THEN epoch(b) END IGNORE NULLS) OVER w_back)
           / (first_value(CASE WHEN mean IS NOT NULL THEN epoch(b) END IGNORE NULLS) OVER w_fwd
              - last_value(CASE WHEN mean IS NOT NULL THEN epoch(b) END IGNORE NULLS) OVER w_back)
           * (first_value(mean IGNORE NULLS) OVER w_fwd - last_value(mean IGNORE NULLS) OVER w_back)
       END''', 'mean_interp')}
FROM j
WINDOW w_back AS (PARTITION BY conv_id ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       w_fwd AS (PARTITION BY conv_id ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


# --- smoothing (SURVEY §2.2) -------------------------------------------------


def _q_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.smooth import sma_window

    return _round6(sma_window(_signal(spark, sf_dir), 5), "value")


_SQL_SMA = f"""
WITH {_T_SQL},
w AS (
  SELECT conv_id, turn_idx,
         avg(value) OVER (PARTITION BY conv_id ORDER BY turn_idx
                          ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS v,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM t
)
SELECT conv_id, cast(turn_idx AS bigint) AS pos, {_r6('v', 'value')}
FROM w WHERE turn_idx <= n - 5
"""


def _q_wma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.smooth import smooth

    return _round6(smooth(_signal(spark, sf_dir), "wma", weights=[0.1, 0.3, 0.6]), "value")


_SQL_WMA = f"""
WITH {_T_SQL},
w AS (
  SELECT conv_id, turn_idx,
         0.1 * value + 0.3 * lead(value, 1) OVER o + 0.6 * lead(value, 2) OVER o AS v,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM t WINDOW o AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, cast(turn_idx AS bigint) AS pos, {_r6('v', 'value')}
FROM w WHERE turn_idx <= n - 3
"""


def _q_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.smooth import smooth

    return _round6(smooth(_signal(spark, sf_dir), "ema", alpha=0.5), "value")


# EMA is a per-series recursion; DuckDB reproduces it by folding each prefix
# of the ordered value list (list_reduce seeds with the first element, which
# matches ema[0] = x[0]).
_SQL_EMA = f"""
WITH {_T_SQL},
s AS (SELECT conv_id, list(value ORDER BY turn_idx) AS vs FROM t GROUP BY conv_id)
SELECT conv_id, cast(i - 1 AS bigint) AS pos,
       {_r6('list_reduce(vs[1:i], (acc, x) -> 0.5 * x + 0.5 * acc)', 'value')}
FROM s, unnest(generate_series(1, len(vs))) AS u(i)
"""


def _q_savgol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.smooth import smooth

    return _round6(
        smooth(_signal(spark, sf_dir), "savgol", window_length=5, poly_order=2), "value"
    )


# --- changepoints (SURVEY §2.3/§2.4) — not SQL-expressible → rows-only -------


def _standardized_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation z-scored events.value (so CUSUM defaults make sense)."""
    s = _signal(spark, sf_dir)
    w = Window.partitionBy("conv_id")
    return s.select(
        "conv_id",
        "turn_idx",
        ((F.col("value") - F.avg("value").over(w)) / F.stddev_pop("value").over(w)).alias("value"),
    )


def _q_pelt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.detect import detect_changepoints

    return detect_changepoints(_standardized_signal(spark, sf_dir), penalty=10.0, cost="l2", min_size=3)


def _q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.detect import detect_cusum

    return detect_cusum(_standardized_signal(spark, sf_dir), threshold_factor=3.0)


def _q_pelt_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.detect import detect_changepoints, segment_stats

    s = _standardized_signal(spark, sf_dir)
    bps = detect_changepoints(s, penalty=10.0, cost="l2", min_size=3)
    out = segment_stats(s, bps)
    return _round6(out, "seg_mean", "seg_min", "seg_max", "seg_var")


def _q_penalty_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.detect import select_penalties

    out = select_penalties(
        _signal(spark, sf_dir), cost="gaussian", method="bic", min_size=3, num_steps=20
    ).select("conv_id", "selected_penalty", "n_breakpoints")
    return _round6(out, "selected_penalty")


# --- forecasting (SURVEY §2.5) -----------------------------------------------


def _q_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.forecast import forecast

    return _round6(forecast(_signal(spark, sf_dir), 3, "ses", alpha=0.3), "yhat")


# SES fold: level starts at x[0] and the loop consumes x[0] again → prepend
# vs[1] so list_reduce's seed models L0 and the fold sees every point.
_SQL_SES = f"""
WITH {_T_SQL},
s AS (SELECT conv_id, list(value ORDER BY turn_idx) AS vs FROM t GROUP BY conv_id)
SELECT conv_id, cast(h AS int) AS h,
       {_r6('list_reduce(list_prepend(vs[1], vs), (acc, x) -> 0.3 * x + 0.7 * acc)', 'yhat')}
FROM s, unnest(generate_series(1, 3)) AS u(h)
"""


def _q_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.forecast import forecast

    return _round6(forecast(_signal(spark, sf_dir), 3, "linear"), "yhat")


# forecast anchored at the LAST OBSERVED VALUE (LinearExtrapolator.cs:110-124)
_SQL_LINEAR = f"""
WITH {_T_SQL},
s AS (
  SELECT conv_id, regr_slope(value, turn_idx) AS slope,
         arg_max(value, turn_idx) AS last_v, count(*) AS n
  FROM t GROUP BY conv_id
)
SELECT conv_id, cast(h AS int) AS h, {_r6('last_v + slope * h', 'yhat')}
FROM s, unnest(generate_series(1, 3)) AS u(h)
WHERE n >= 2
"""


def _q_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.forecast import forecast

    return _round6(
        forecast(_signal(spark, sf_dir), 3, "holt", alpha=0.5, beta=0.5), "yhat"
    )


# --- cold-tier compression (north-star addition) ------------------------------


def _q_gorilla_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla-encode + decode every per-user value series, then aggregate the
    DECODED points. The oracle aggregates the RAW table — equality holds iff
    the compression roundtrip is lossless."""
    from transcriptts.compress import compress_series, decompress_series

    t = _transcripts(spark, sf_dir).select(
        "conv_id", F.lit("value").alias("metric"), F.col("ts").alias("bucket_start"),
        F.col("value").alias("mean"),
    )
    back = decompress_series(compress_series(t, value_col="mean", ts_col="bucket_start"))
    out = back.groupBy("conv_id").agg(
        F.count("value").alias("cnt"),
        F.sum("value").alias("sum"),
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        F.min("bucket_start").alias("ts_min"),
        F.max("bucket_start").alias("ts_max"),
    )
    return _round6(out, "sum", "min", "max")


_SQL_GORILLA = f"""
WITH {_T_SQL}
SELECT conv_id, count(*) AS cnt, {_r6('sum(value)', 'sum')}, {_r6('min(value)', 'min')},
       {_r6('max(value)', 'max')}, min(ts) AS ts_min, max(ts) AS ts_max
FROM t GROUP BY conv_id
"""


# --- training-data pipeline ops (documents / embeddings) ----------------------

_BPE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.datapipe import with_text_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = with_text_stats(docs).select(
        "doc_id", "token_count", "bpe_token_count", "char_count", "punct_ratio", "alpha_ratio"
    )
    return _round6(out, "punct_ratio", "alpha_ratio")


_PUNCT_R6 = _r6(
    "(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text)",
    "punct_ratio",
)
_ALPHA_R6 = _r6("length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text)", "alpha_ratio")
_WS_TOKCNT = "CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END"

_SQL_TEXT_STATS = f"""
SELECT doc_id,
       {_WS_TOKCNT} AS token_count,
       len(regexp_extract_all(text, '{_BPE}')) AS bpe_token_count,
       length(text) AS char_count,
       {_PUNCT_R6},
       {_ALPHA_R6}
FROM documents
"""


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.datapipe import with_lang_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_lang_id(docs).select("doc_id", "lang", "lang_pred")


_SQL_LANG_ID = """
WITH toks AS (
  SELECT doc_id, lang,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS cjk,
         list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t)) AS tk
  FROM documents
),
h AS (
  SELECT doc_id, lang, n_chars, cjk,
         len(list_intersect(tk, ['the','and','of','to','in','is','that','it','for','with'])) AS h_en,
         len(list_intersect(tk, ['der','die','und','das','ist','von','mit','den','nicht','ein'])) AS h_de,
         len(list_intersect(tk, ['le','la','les','et','des','est','dans','que','une','pour'])) AS h_fr,
         len(list_intersect(tk, ['el','la','los','las','que','de','en','es','por','una'])) AS h_es
  FROM toks
)
SELECT doc_id, lang,
  CASE WHEN n_chars = 0 THEN 'en'
       WHEN cjk * 1.0 / greatest(n_chars, 1) > 0.25 THEN 'zh'
       WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'en'
       ELSE (SELECT max(s.l) FROM (VALUES (h_en,'en'),(h_de,'de'),(h_fr,'fr'),(h_es,'es')) s(v, l)
             WHERE s.v = greatest(h_en, h_de, h_fr, h_es))
  END AS lang_pred
FROM h
"""


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.datapipe import dedup_exact

    return dedup_exact(spark.read.parquet(f"{sf_dir}/documents.parquet"))


_SQL_DEDUP_EXACT = """
SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_hash,
       min(doc_id) AS keep_id, count(*) AS dup_count
FROM documents GROUP BY 1
"""


def _q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.datapipe import jaccard_pairs

    out = jaccard_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), k=3, threshold=0.3
    )
    return _round6(out, "jaccard")


_SQL_SHINGLES = """
toks AS (
  SELECT doc_id, list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t)) AS tk
  FROM documents
),
sh AS (
  SELECT doc_id AS id, unnest(list_distinct(
    CASE WHEN len(tk) >= 3
         THEN [array_to_string(tk[i:i+2], ' ') FOR i IN generate_series(1, len(tk) - 2)]
         ELSE [array_to_string(tk, ' ')] END)) AS shingle
  FROM toks
)
"""

_SQL_JACCARD = f"""
WITH {_SQL_SHINGLES},
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2
)
SELECT id_a, id_b, {_r6('i * 1.0 / (sa.n_sh + sb.n_sh - i)', 'jaccard')}
FROM inter JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
WHERE i * 1.0 / (sa.n_sh + sb.n_sh - i) >= 0.3
"""


def _q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.datapipe import minhash_dedup

    out = minhash_dedup(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        num_hashes=32, bands=8, k=3, threshold=0.3, hash_mode="md5",
    )
    return _round6(out, "jaccard")


def _sql_minhash() -> str:
    sig_terms = ", ".join(
        f"min(md5('{i}:' || shingle)) AS s{i}" for i in range(32)
    )
    band_keys = ", ".join(
        "concat(" + ", ".join(f"s{b * 4 + r}" for r in range(4)) + f") AS band{b}" for b in range(8)
    )
    band_union = " UNION ALL ".join(
        f"SELECT id, {b} AS band, band{b} AS key FROM sigs" for b in range(8)
    )
    return f"""
WITH {_SQL_SHINGLES},
sigr AS (SELECT id, {sig_terms} FROM sh GROUP BY id),
sigs AS (SELECT id, {band_keys} FROM sigr),
sigb AS (SELECT id, band, key FROM ({band_union})),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM sigb a JOIN sigb b ON a.band = b.band AND a.key = b.key AND a.id < b.id
),
doc_sh AS (SELECT id, list(DISTINCT shingle) AS shl FROM sh GROUP BY id)
SELECT id_a, id_b,
       {_r6('len(list_intersect(da.shl, db.shl)) * 1.0 / (len(da.shl) + len(db.shl) - len(list_intersect(da.shl, db.shl)))', 'jaccard')}
FROM cand JOIN doc_sh da ON da.id = id_a JOIN doc_sh db ON db.id = id_b
WHERE len(list_intersect(da.shl, db.shl)) * 1.0 /
      (len(da.shl) + len(db.shl) - len(list_intersect(da.shl, db.shl))) >= 0.3
"""


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.datapipe import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cosine_topk(emb, topk=5).select("qid", "cid", "cos", "rank")
    return _round6(out, "cos")


_SQL_COSINE_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sims AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid,
         list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos
  FROM e q JOIN e c ON q.vec_id != c.vec_id
),
ranked AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
  FROM sims
)
SELECT qid, cid, {_r6('cos', 'cos')}, cast(rank AS int) AS rank FROM ranked WHERE rank <= 5
"""


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.datapipe import simhash_pairs

    return simhash_pairs(spark.read.parquet(f"{sf_dir}/documents.parquet"), max_hamming=8)


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.datapipe import ann_lsh_topk

    out = ann_lsh_topk(spark.read.parquet(f"{sf_dir}/embeddings.parquet"), topk=5, n_planes=8)
    return _round6(out, "cos")


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.datapipe import with_quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = with_quality_score(docs).select("doc_id", "stopword_ratio", "quality_score")
    return _round6(out, "stopword_ratio", "quality_score")


_SQL_QUALITY = f"""
WITH s AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS token_count,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
         (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0 / length(text) AS punct_ratio,
         len(list_intersect(list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t)),
             ['the','and','of','to','in','is','that','it','for','with'])) AS stop_hits
  FROM documents
)
SELECT doc_id,
       {_r6('CASE WHEN token_count > 0 THEN stop_hits * 1.0 / token_count ELSE 0 END', 'stopword_ratio')},
       {_r6('''0.35 * least(token_count / 50.0, 1.0) + 0.25 * alpha_ratio
            + 0.2 * (1.0 - least(punct_ratio * 4, 1.0))
            + 0.2 * least(CASE WHEN token_count > 0 THEN stop_hits * 1.0 / token_count ELSE 0 END * 5, 1.0)''', 'quality_score')}
FROM s
"""


# --- statistical functions (SURVEY §2.7) ---------------------------------------


def _q_series_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.stats import series_stats

    out = series_stats(_signal(spark, sf_dir))
    return _round6(
        out, "mean", "median", "var_pop", "stddev_pop", "min", "max",
        "skewness_g1", "kurtosis_pop_excess", "kurtosis_g2", digits=4,
    )


_SQL_SERIES_STATS = f"""
WITH {_T_SQL},
m AS (
  SELECT conv_id, count(*) AS n, avg(value) AS mu, var_pop(value) AS vp,
         quantile_cont(value, 0.5) AS med, min(value) AS mn, max(value) AS mx
  FROM t GROUP BY conv_id
),
z AS (
  SELECT t.conv_id, m.n, m.mu, m.vp, m.med, m.mn, m.mx,
         (t.value - m.mu) / sqrt(m.vp) AS d
  FROM t JOIN m ON t.conv_id = m.conv_id
),
agg AS (
  SELECT conv_id, any_value(n) AS n, any_value(mu) AS mu, any_value(vp) AS vp,
         any_value(med) AS med, any_value(mn) AS mn, any_value(mx) AS mx,
         sum(d * d * d) AS s3, sum(d * d * d * d) AS s4
  FROM z GROUP BY conv_id
)
SELECT conv_id, n,
       {_r6('mu', 'mean', 4)}, {_r6('med', 'median', 4)}, {_r6('vp', 'var_pop', 4)},
       {_r6('sqrt(vp)', 'stddev_pop', 4)}, {_r6('mn', 'min', 4)}, {_r6('mx', 'max', 4)},
       {_r6('CASE WHEN n >= 3 THEN n * s3 / ((n - 1.0) * (n - 2.0)) END', 'skewness_g1', 4)},
       {_r6('CASE WHEN n >= 4 THEN s4 / n - 3 END', 'kurtosis_pop_excess', 4)},
       {_r6('''CASE WHEN n >= 4 THEN ((n + 1.0) * (s4 / n - 3) + 6) * (n - 1.0)
              / ((n - 2.0) * (n - 3.0)) END''', 'kurtosis_g2', 4)}
FROM agg
"""


def _q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from transcriptts.stats import with_normalized

    out = with_normalized(_signal(spark, sf_dir)).select(
        "conv_id", "turn_idx", "normalized", "zscore"
    )
    return _round6(out, "normalized", "zscore")


_SQL_NORMALIZE = f"""
WITH {_T_SQL}
SELECT conv_id, turn_idx,
       {_r6('''CASE WHEN max(value) OVER w - min(value) OVER w > 0
            THEN (value - min(value) OVER w) / (max(value) OVER w - min(value) OVER w)
            ELSE 0 END''', 'normalized')},
       {_r6('''CASE WHEN stddev_pop(value) OVER w > 0.000000001
            THEN (value - avg(value) OVER w) / (stddev_pop(value) OVER w)
            ELSE 0 END''', 'zscore')}
FROM t WINDOW w AS (PARTITION BY conv_id)
"""


# --- contract ---------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tiered 1m rollup of token_count + inter-turn latency over the
    transcripts projection of sf0.001 events."""
    from transcriptts.rollup import rollup_tiers

    tiers = rollup_tiers(_transcripts(spark, "/root/testdata/sf0.001"))
    return tiers["1m"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m": _q_rollup("1m"),
        "rollup_1h": _q_rollup("1h"),
        "rollup_1d": _q_rollup("1d"),
        "rollup_1h_hierarchical": _q_rollup_1h_hierarchical,
        "downsample_k4": _q_downsample,
        "segment_stats_k8": _q_segment_stats,
        "gapfill_locf_interp_1h": _q_gapfill,
        "sma_w5": _q_sma,
        "wma_w3": _q_wma,
        "ema_a05": _q_ema,
        "savgol_w5_p2": _q_savgol,
        "pelt_l2": _q_pelt,
        "cusum_z3": _q_cusum,
        "pelt_segment_stats": _q_pelt_segments,
        "penalty_selection_bic": _q_penalty_selection,
        "ses_forecast_a03": _q_ses,
        "linear_forecast": _q_linear_forecast,
        "holt_forecast": _q_holt,
        "gorilla_roundtrip_agg": _q_gorilla_roundtrip,
        "text_stats": _q_text_stats,
        "quality_score": _q_quality,
        "lang_id": _q_lang_id,
        "dedup_exact": _q_dedup_exact,
        "ngram_jaccard_pairs": _q_jaccard_pairs,
        "minhash_lsh_dedup": _q_minhash_dedup,
        "cosine_topk": _q_cosine_topk,
        "simhash_pairs": _q_simhash_pairs,
        "ann_lsh_topk": _q_ann_lsh,
        "series_stats": _q_series_stats,
        "normalize_zscore": _q_normalize,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1m": _sql_rollup("minute"),
        "rollup_1h": _sql_rollup("hour"),
        "rollup_1d": _sql_rollup("day"),
        "rollup_1h_hierarchical": _SQL_ROLLUP_HIER,
        "downsample_k4": _SQL_DOWNSAMPLE,
        "segment_stats_k8": _SQL_SEGMENT_STATS,
        "gapfill_locf_interp_1h": _SQL_GAPFILL,
        "sma_w5": _SQL_SMA,
        "wma_w3": _SQL_WMA,
        "ema_a05": _SQL_EMA,
        "ses_forecast_a03": _SQL_SES,
        "linear_forecast": _SQL_LINEAR,
        "gorilla_roundtrip_agg": _SQL_GORILLA,
        "text_stats": _SQL_TEXT_STATS,
        "quality_score": _SQL_QUALITY,
        "lang_id": _SQL_LANG_ID,
        "dedup_exact": _SQL_DEDUP_EXACT,
        "ngram_jaccard_pairs": _SQL_JACCARD,
        "minhash_lsh_dedup": _sql_minhash(),
        "cosine_topk": _SQL_COSINE_TOPK,
        "series_stats": _SQL_SERIES_STATS,
        "normalize_zscore": _SQL_NORMALIZE,
        # simhash_pairs / ann_lsh_topk: depend on engine-native xxhash64 /
        # numpy hyperplanes — rows-only; cross-checked in tests/test_datapipe.py
        # savgol_w5_p2: edge polynomial re-fit + middle restore is not
        # SQL-expressible → rows-only check; golden parity covered in
        # tests/test_kernels_smoothing.py::test_savgol_golden_middle_restore
        # pelt_l2 / cusum_z3 / pelt_segment_stats / penalty_selection_bic:
        # sequential DP / stateful scans — rows-only; goldens in
        # tests/test_kernels_detect.py
        # holt_forecast: two-state recursion — rows-only; goldens in
        # tests/test_kernels_forecast.py
    }
