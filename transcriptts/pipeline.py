"""Resumable, snapshot-checkpointed rollup pipeline with lineage + metrics.

North-rule shape: 'rollups run as a resumable Iceberg-snapshot-checkpointed
pipeline emitting per-partition lineage and row-count/byte metrics'. This
sandbox has no Iceberg runtime jars, so the pipeline implements the same
contract on parquet + an atomically-swapped JSON manifest; every concept maps
1:1 onto Iceberg when the catalog is available (snapshot id ↔ Iceberg
snapshot id, manifest swap ↔ commit, watermark ↔ WAP branch publish,
partition dir ↔ hidden partition days(bucket_start)):

layout under root/:
  state.json                    -- atomic checkpoint: per-tier watermark +
                                   last snapshot id + input fingerprint
  tier=<t>/p_date=YYYY-MM-DD/   -- rollup data, partitioned by bucket date
  lineage/<snapshot>.json       -- per-run, per-partition lineage + metrics

Resume semantics:
- a tier whose state entry matches the current input fingerprint is skipped
  entirely (idempotent rerun after a crash between tiers);
- with `incremental=True` and a previously committed watermark, the RAW
  input is filtered to ts >= date(watermark) BEFORE the rollup — a plain
  pushable predicate, so the parquet scan itself prunes to post-watermark
  partitions (at 100 TB this is the whole point: an incremental run never
  rereads history). The affected date partitions are then overwritten via
  dynamic partition overwrite — the standard continuous-aggregate
  maintenance pattern;
- the one metric that looks across the cutoff — inter-turn latency, a
  lag() over the conversation — stays EXACT via a seed-row state table
  (`convstate/`, one row per (conv, date): the date's last turn). The
  incremental batch unions the per-conv last turn before the cutoff, the
  window computes true latencies for the first post-cutoff turns, and the
  seed rows are dropped before aggregation. convstate itself is maintained
  incrementally (only dates >= the cutoff are rewritten);
- state.json is swapped via os.replace AFTER the tier's data lands, so a
  crash at any point leaves a consistent (re-runnable) view.

Every write sorts within partitions by (conv_id, metric, bucket_start) so a
rerun of the same input produces identical logical content (verified by the
resume test with a content hash).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rollup import rollup, with_derived_metrics
from .schema import TIERS


class RollupPipeline:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "lineage"), exist_ok=True)

    # --- state checkpoint ---------------------------------------------------

    @property
    def _state_path(self) -> str:
        return os.path.join(self.root, "state.json")

    def load_state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"tiers": {}}

    def _commit_state(self, state: dict) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        os.replace(tmp, self._state_path)  # atomic snapshot commit

    # --- per-conv seed state (exact cross-cutoff latency) --------------------

    @property
    def _convstate_path(self) -> str:
        return os.path.join(self.root, "convstate")

    def _update_convstate(self, turns: DataFrame, incremental_dates: bool) -> None:
        """Upsert (conv_id, p_date) -> last turn of that date. `turns` is the
        (possibly already cutoff-filtered) batch, so an incremental run only
        rewrites the date partitions it touches.

        The last turn is the single row maximal by (turn_idx, ts) — turn_idx
        FIRST, matching the latency lag() window's ORDER BY turn_idx — so the
        seed row always pairs a turn's true (turn_idx, ts) even when
        timestamps arrive out of order within a conversation."""
        st = (
            turns.groupBy("conv_id", F.to_date("ts").alias("p_date"))
            .agg(F.max(F.struct("turn_idx", "ts")).alias("s"))
            .select(
                "conv_id", "p_date",
                F.col("s.ts").alias("last_ts"),
                F.col("s.turn_idx").alias("last_turn_idx"),
            )
        )
        writer = st.repartition("p_date").write.partitionBy("p_date")
        if incremental_dates and os.path.exists(self._convstate_path):
            # per-write option, NOT spark.conf.set: a session-wide conf leak
            # would silently turn later FULL rewrites (and unrelated user
            # writes) into dynamic overwrites that keep stale partitions
            writer = writer.option("partitionOverwriteMode", "dynamic")
        writer.mode("overwrite").parquet(self._convstate_path)

    def _seed_rows(self, cutoff) -> DataFrame | None:
        """Per-conv last turn strictly before the cutoff date — the lag()
        seed for the incremental window. Partition-pruned read of the tiny
        convstate table; turn_idx keeps its true value so the window order
        is preserved."""
        if not os.path.exists(self._convstate_path):
            return None
        st = self.spark.read.parquet(self._convstate_path).where(
            F.col("p_date") < F.to_date(F.lit(cutoff))
        )
        return (
            st.groupBy("conv_id")
            .agg(F.max(F.struct("last_turn_idx", "last_ts")).alias("s"))
            .select(
                "conv_id",
                F.col("s.last_turn_idx").alias("turn_idx"),
                F.lit(None).cast("string").alias("role"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.col("s.last_ts").alias("ts"),
            )
        )

    # --- run ------------------------------------------------------------------

    _COLS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")

    def incremental_metrics(self, transcripts: DataFrame, watermark: str) -> DataFrame:
        """The incremental tier input: RAW input filtered at the watermark
        DATE before deriving and rolling up — a plain `ts >=` predicate the
        parquet scan prunes on (asserted at plan level in
        tests/test_pipeline.py), since dynamic overwrite swaps whole p_date
        partitions and the cutoff aligns to date granularity. The lag()
        window gets its cross-cutoff context from one seed row per
        conversation (convstate), dropped again before aggregation."""
        cutoff_ts = F.to_timestamp(F.to_date(F.lit(watermark)))
        src = transcripts.select(*self._COLS).where(F.col("ts") >= cutoff_ts)
        seeds = self._seed_rows(watermark)
        batch = src if seeds is None else src.unionByName(seeds)
        return with_derived_metrics(batch).where(F.col("ts") >= cutoff_ts)

    def run(
        self,
        transcripts: DataFrame,
        tiers: tuple[str, ...] = ("1m", "1h", "1d"),
        input_fingerprint: str | None = None,
        incremental: bool = False,
        debug_counts: bool = False,
    ) -> dict:
        """Compute + persist the requested tiers; returns the run report.

        input_fingerprint identifies the input version (e.g. source snapshot
        id / max ingest ts). Tiers already committed for this fingerprint are
        skipped — that is the resume path. debug_counts additionally counts
        each tier's (filtered) aggregation input — an extra pass, tests only.
        """
        if input_fingerprint is None:
            agg = transcripts.select(
                F.count("*").alias("n"), F.max("ts").alias("mx"), F.min("ts").alias("mn")
            ).collect()[0]
            input_fingerprint = f"n={agg['n']}/min={agg['mn']}/max={agg['mx']}"

        derived_full = None  # built lazily: full-recompute tiers only
        state = self.load_state()
        report: dict = {"snapshot_ids": {}, "skipped": [], "metrics": {}}
        ran_full = False
        min_cutoff: str | None = None

        for tier in tiers:
            entry = state["tiers"].get(tier)
            if entry and entry.get("fingerprint") == input_fingerprint:
                report["skipped"].append(tier)
                continue
            snapshot_id = f"{tier}-{uuid.uuid4().hex[:12]}"
            t0 = time.time()

            prev_watermark = entry.get("watermark") if (entry and incremental) else None
            if prev_watermark is not None:
                d = self.incremental_metrics(transcripts, prev_watermark)
                if min_cutoff is None or prev_watermark < min_cutoff:
                    min_cutoff = prev_watermark
            else:
                if derived_full is None:
                    derived_full = with_derived_metrics(transcripts)
                d = derived_full
                ran_full = True
            r = rollup(d, tier)
            batch_rows = d.count() if debug_counts else None
            out = (
                r.withColumn("p_date", F.to_date("bucket_start"))
                .repartition("p_date")
                .sortWithinPartitions("conv_id", "metric", "bucket_start")
            )
            path = os.path.join(self.root, f"tier={tier}")
            writer = out.write.partitionBy("p_date")
            if prev_watermark is not None and os.path.exists(path):
                # incremental: swap only the p_date partitions present in the
                # batch. Per-write option (see _update_convstate) so full
                # rewrites in the same session stay full replacements.
                writer = writer.option("partitionOverwriteMode", "dynamic")
            writer.mode("overwrite").parquet(path)
            wall = time.time() - t0

            written = self.spark.read.parquet(path)
            part_stats = [
                row.asDict()
                for row in written.groupBy("p_date")
                .agg(F.count("*").alias("rows"), F.max("bucket_start").alias("max_bucket"))
                .orderBy("p_date")
                .collect()
            ]
            watermark = str(max(p["max_bucket"] for p in part_stats)) if part_stats else None
            total_rows = sum(p["rows"] for p in part_stats)
            byte_size = sum(
                os.path.getsize(os.path.join(dp, fn))
                for dp, _, fns in os.walk(path)
                for fn in fns
                if fn.endswith(".parquet")
            )

            lineage = {
                "snapshot_id": snapshot_id,
                "tier": tier,
                "input_fingerprint": input_fingerprint,
                "incremental_from": prev_watermark,
                "rows": total_rows,
                "bytes": byte_size,
                "wall_sec": round(wall, 3),
                "partitions": [
                    {"p_date": str(p["p_date"]), "rows": p["rows"], "max_bucket": str(p["max_bucket"])}
                    for p in part_stats
                ],
            }
            with open(os.path.join(self.root, "lineage", f"{snapshot_id}.json"), "w") as f:
                json.dump(lineage, f, indent=2)

            # commit AFTER data + lineage land (crash before this line →
            # tier is simply recomputed on the next run)
            state["tiers"][tier] = {
                "fingerprint": input_fingerprint,
                "snapshot_id": snapshot_id,
                "watermark": watermark,
                "rows": total_rows,
                "bytes": byte_size,
            }
            self._commit_state(state)
            report["snapshot_ids"][tier] = snapshot_id
            report["metrics"][tier] = {
                "rows": total_rows,
                "bytes": byte_size,
                "wall_sec": round(wall, 3),
                "incremental_from": prev_watermark,
            }
            if batch_rows is not None:
                report["metrics"][tier]["batch_rows"] = batch_rows

        # maintain the per-(conv, date) seed state for the NEXT incremental
        # run; an all-incremental run only rewrites post-cutoff dates.
        if report["snapshot_ids"]:
            base = transcripts.select(*self._COLS)
            if not ran_full and min_cutoff is not None:
                cutoff_ts = F.to_timestamp(F.to_date(F.lit(min_cutoff)))
                self._update_convstate(base.where(F.col("ts") >= cutoff_ts), incremental_dates=True)
            else:
                self._update_convstate(base, incremental_dates=False)

        return report

    def read_tier(self, tier: str) -> DataFrame:
        if tier not in TIERS:
            raise ValueError(f"unknown tier {tier!r}")
        return self.spark.read.parquet(os.path.join(self.root, f"tier={tier}"))

    def compact_tier(
        self, tier: str, max_files_per_partition: int = 1, min_files_to_compact: int = 2
    ) -> dict:
        """compact_partitions over one tier's layout, with a lineage record.

        The tier pipeline's own writes are already 1 file per p_date
        (repartition('p_date') before write), so this is a no-op unless a
        partition was produced by an external writer or an old layout —
        the append-mode surfaces (raw-turns store, cold archive) are where
        compaction routinely fires; use compact_partitions directly there.
        """
        report = compact_partitions(
            self.spark,
            os.path.join(self.root, f"tier={tier}"),
            max_files_per_partition=max_files_per_partition,
            min_files_to_compact=min_files_to_compact,
        )
        report["tier"] = tier
        if report["compacted"]:
            snapshot_id = f"compact-{tier}-{uuid.uuid4().hex[:12]}"
            lineage = {
                "snapshot_id": snapshot_id,
                "tier": tier,
                "op": "compact",
                "partitions": report["compacted"],
                "files_before": report["files_before"],
                "files_after": report["files_after"],
            }
            with open(os.path.join(self.root, "lineage", f"{snapshot_id}.json"), "w") as f:
                json.dump(lineage, f, indent=2)
            report["snapshot_id"] = snapshot_id
        return report


    def content_hash(self, tier: str) -> str:
        """Order-insensitive logical content hash of a tier (resume tests)."""
        df = self.read_tier(tier).drop("p_date")
        row = df.select(
            F.sha2(
                F.concat_ws(
                    "|",
                    *[F.coalesce(F.col(c).cast("string"), F.lit("null")) for c in sorted(df.columns)],
                ),
                256,
            ).alias("h")
        ).agg(F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"))
        return str(row.collect()[0]["s"])

def compact_partitions(
    spark: SparkSession,
    root: str,
    max_files_per_partition: int = 1,
    min_files_to_compact: int = 2,
    partition_prefix: str = "p_date=",
) -> dict:
    """Merge small files inside each hive partition of a parquet layout —
    the small-file problem: append-mode writers (incremental raw-turn
    ingests, per-expiry archive runs) each leave their own task files, and
    at 100 TB a scan's task count and listing cost are driven by FILE
    count, not bytes.

    Per-partition, all-or-nothing: each partition dir with >=
    `min_files_to_compact` parquet files is rewritten to
    `max_files_per_partition` files via coalesce into a hidden `.compact-*`
    temp dir, verified by row count, then swapped with two renames
    (`part -> part.old`, `tmp -> part`). The swap is NOT a single atomic
    operation: a crash can land in three states, all of which the NEXT run
    heals before scanning — (1) only `.compact-*` temp left: removed
    (unswapped output is unverified); (2) `part.old` present and the live
    dir missing (crash between the renames): `.old` renamed back, no data
    loss; (3) both present (crash before the final cleanup): the live dir
    is already the verified compacted output, `.old` removed. Rows are
    bit-identical through every recovery path (crash-injection tests in
    tests/test_pipeline.py).

    Reader semantics: between the two renames there is a window in which the
    partition directory does not exist — a concurrent reader that lists at
    that instant sees the partition absent for the life of that scan.
    Readers needing strict completeness should not race compaction (run it
    in a maintenance window, as with any in-place file-level rewrite).
    Single-writer op: do not run two compactions on the same root
    concurrently (recovery would mistake the other's live temp dirs for
    crash leftovers). Only oversized partitions are touched — O(dirty
    partitions), never O(table).
    """
    if not os.path.isdir(root):
        return {"compacted": [], "files_before": 0, "files_after": 0}

    def parquet_files(d: str) -> list[str]:
        return [fn for fn in os.listdir(d) if fn.endswith(".parquet")]

    # heal leftovers of a previously-interrupted run (states 1-3 above)
    for name in sorted(os.listdir(root)):
        full = os.path.join(root, name)
        if not os.path.isdir(full):
            continue
        if name.startswith(".compact-"):
            shutil.rmtree(full)
        elif name.startswith(partition_prefix) and name.endswith(".old"):
            live = full[: -len(".old")]
            if os.path.isdir(live):
                shutil.rmtree(full)
            else:
                os.rename(full, live)

    report: dict = {"compacted": [], "files_before": 0, "files_after": 0}
    for name in sorted(os.listdir(root)):
        part_dir = os.path.join(root, name)
        if not (name.startswith(partition_prefix) and os.path.isdir(part_dir)):
            continue
        if name.endswith(".old"):  # unreachable post-recovery; defensive
            continue  # pragma: no cover
        files = parquet_files(part_dir)
        report["files_before"] += len(files)
        if len(files) < max(min_files_to_compact, max_files_per_partition + 1):
            report["files_after"] += len(files)
            continue
        src = spark.read.parquet(part_dir)
        n_before = src.count()
        tmp_dir = os.path.join(root, f".compact-{name}-{uuid.uuid4().hex[:8]}")
        src.coalesce(max_files_per_partition).write.mode("overwrite").parquet(tmp_dir)
        n_after = spark.read.parquet(tmp_dir).count()
        if n_after != n_before:  # pragma: no cover - defensive
            shutil.rmtree(tmp_dir)
            raise RuntimeError(
                f"compaction row-count mismatch for {part_dir}: {n_before} -> {n_after}"
            )
        old_dir = part_dir + ".old"
        os.rename(part_dir, old_dir)
        os.rename(tmp_dir, part_dir)
        shutil.rmtree(old_dir)
        report["files_after"] += len(parquet_files(part_dir))
        report["compacted"].append(name.split("=", 1)[1])
    return report

