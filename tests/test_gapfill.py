"""Gap-fill goldens (FIXTURES.md B.7) + column-expression vs pandas-UDF
cross-check."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from transcriptts.gapfill import gapfill, gapfill_pandas
from transcriptts.rollup import rollup, with_derived_metrics
from transcriptts.synth import synth_transcripts_arrow

BASE = dt.datetime(2025, 1, 1)


def _mini_rollup(spark):
    """Buckets {0,1,4} present with mean values 10, 20, 50 → gaps at 2,3."""
    rows = [
        ("c", BASE + dt.timedelta(minutes=m), "token_count", 1, float(v), float(v), float(v), float(v), float(v), float(v))
        for m, v in [(0, 10), (1, 20), (4, 50)]
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, bucket_start timestamp, metric string, cnt long, "
        "sum double, mean double, min double, max double, p50 double, p99 double",
    )


def test_gapfill_locf_and_interp(spark):
    out = {r["bucket_start"].minute: r for r in gapfill(_mini_rollup(spark), "1m").collect()}
    assert sorted(out) == [0, 1, 2, 3, 4]
    assert [out[m]["is_gap"] for m in range(5)] == [False, False, True, True, False]
    assert out[2]["mean_locf"] == 20.0 and out[3]["mean_locf"] == 20.0
    # linear between (1,20) and (4,50): minute 2 → 30, minute 3 → 40
    assert out[2]["mean_interp"] == pytest.approx(30.0)
    assert out[3]["mean_interp"] == pytest.approx(40.0)
    assert out[0]["mean_locf"] == 10.0 and out[0]["mean_interp"] == 10.0


def test_gapfill_leading_gap_stays_null(spark):
    rows = [
        ("c", BASE + dt.timedelta(minutes=m), "x", cnt, v, v, v, v, v, v)
        for m, cnt, v in [(0, None, None), (2, 1, 7.0)]
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, bucket_start timestamp, metric string, cnt long, "
        "sum double, mean double, min double, max double, p50 double, p99 double",
    )
    out = {r["bucket_start"].minute: r for r in gapfill(df, "1m").collect()}
    assert out[0]["mean_locf"] is None and out[0]["mean_interp"] is None
    assert out[1]["mean_locf"] is None and out[1]["mean_interp"] is None
    assert out[2]["mean_locf"] == 7.0


def test_pandas_gapfill_matches_column_expressions(spark):
    tbl = synth_transcripts_arrow(n_convs=20, metronome_turns=0, seed=5)
    r1m = rollup(with_derived_metrics(spark.createDataFrame(tbl.to_pandas())), "1m")
    a = {
        (r["conv_id"], r["metric"], r["bucket_start"]): r
        for r in gapfill(r1m, "1m", ("mean", "p50")).collect()
    }
    b = gapfill_pandas(r1m, "1m", ("mean", "p50")).collect()
    assert len(a) == len(b) > 0
    for r in b:
        ra = a[(r["conv_id"], r["metric"], r["bucket_start"])]
        for c in ("mean_locf", "mean_interp", "p50_locf", "p50_interp"):
            va, vb = ra[c], r[c]
            if va is None or (isinstance(va, float) and math.isnan(va)):
                assert vb is None or math.isnan(vb), (c, ra, r)
            else:
                assert vb == pytest.approx(va, abs=1e-9), (c, ra, r)
        assert bool(r["is_gap"]) == bool(ra["is_gap"])
