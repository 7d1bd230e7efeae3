"""Resumable pipeline tests (FIXTURES.md B.7 resume scenario)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from transcriptts.pipeline import RollupPipeline
from transcriptts.synth import synth_transcripts_arrow


@pytest.fixture()
def transcripts(spark):
    tbl = synth_transcripts_arrow(n_convs=25, metronome_turns=200, seed=33)
    return spark.createDataFrame(tbl.to_pandas())


def test_pipeline_full_run_and_resume(spark, transcripts, tmp_path):
    root = str(tmp_path / "tiers")
    p = RollupPipeline(spark, root)
    report = p.run(transcripts)
    assert set(report["snapshot_ids"]) == {"1m", "1h", "1d"}
    for t in ("1m", "1h", "1d"):
        assert p.read_tier(t).count() > 0
        assert report["metrics"][t]["rows"] > 0 and report["metrics"][t]["bytes"] > 0

    hashes = {t: p.content_hash(t) for t in ("1m", "1h", "1d")}

    # rerun same input → everything skipped, nothing rewritten
    report2 = p.run(transcripts)
    assert sorted(report2["skipped"]) == ["1d", "1h", "1m"]
    assert report2["snapshot_ids"] == {}

    # simulate crash: 1d output + state entry lost between tiers
    shutil.rmtree(os.path.join(root, "tier=1d"))
    st = p.load_state()
    del st["tiers"]["1d"]
    p._commit_state(st)

    report3 = p.run(transcripts)
    assert sorted(report3["skipped"]) == ["1h", "1m"]  # only 1d recomputed
    assert set(report3["snapshot_ids"]) == {"1d"}
    assert {t: p.content_hash(t) for t in ("1m", "1h", "1d")} == hashes  # identical content


def test_pipeline_lineage_records(spark, transcripts, tmp_path):
    root = str(tmp_path / "tiers")
    p = RollupPipeline(spark, root)
    report = p.run(transcripts, tiers=("1h",))
    sid = report["snapshot_ids"]["1h"]
    with open(os.path.join(root, "lineage", f"{sid}.json")) as f:
        lin = json.load(f)
    assert lin["tier"] == "1h" and lin["rows"] > 0 and lin["bytes"] > 0
    assert len(lin["partitions"]) >= 1
    assert sum(pt["rows"] for pt in lin["partitions"]) == lin["rows"]
    st = p.load_state()
    assert st["tiers"]["1h"]["snapshot_id"] == sid
    assert st["tiers"]["1h"]["watermark"] is not None


def test_pipeline_incremental_append(spark, tmp_path):
    import datetime as dt

    root = str(tmp_path / "tiers")
    p = RollupPipeline(spark, root)
    base = dt.datetime(2025, 3, 1)
    mk = lambda rows: spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    first = [("c", i, "user", "a b c", None, base + dt.timedelta(minutes=i)) for i in range(10)]
    p.run(mk(first), tiers=("1m",))
    n1 = p.read_tier("1m").count()

    # append 5 more minutes; incremental run recomputes only the tail buckets
    both = first + [("c", 10 + j, "user", "d e", None, base + dt.timedelta(minutes=10 + j)) for j in range(5)]
    rep = p.run(mk(both), tiers=("1m",), incremental=True)
    assert rep["snapshot_ids"].get("1m")
    assert p.read_tier("1m").count() > n1
    # incremental result must equal a full recompute from scratch
    p2 = RollupPipeline(spark, str(tmp_path / "tiers_full"))
    p2.run(mk(both), tiers=("1m",))
    assert p.content_hash("1m") == p2.content_hash("1m")
    assert p.read_tier("1m").count() == p2.read_tier("1m").count()


def test_pipeline_incremental_scans_only_tail(spark, tmp_path):
    """The incremental run must (a) aggregate only post-watermark rows —
    the raw filter is a pushable ts predicate, not a post-aggregation
    restriction — and (b) still produce latencies identical to a full
    recompute across the date cutoff, via the convstate seed rows."""
    import datetime as dt

    root = str(tmp_path / "tiers")
    p = RollupPipeline(spark, root)
    mk = lambda rows: spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    day1 = dt.datetime(2025, 3, 1, 10, 0)
    day2 = dt.datetime(2025, 3, 2, 9, 0)
    # conversation c crosses the date boundary: last day-1 turn at 10:50,
    # first day-2 turn at 09:00 → its latency (79_800s) only exists if the
    # window saw the day-1 seed row from convstate
    d1 = [("c", i, "user", "a b c", None, day1 + dt.timedelta(minutes=10 * i)) for i in range(6)]
    d2 = [("c", 6 + j, "user", "d e", None, day2 + dt.timedelta(minutes=10 * j)) for j in range(3)]
    p.run(mk(d1 + d2), tiers=("1m", "1h", "1d"))

    tail = [("c", 9 + j, "user", "f g", None, day2 + dt.timedelta(hours=8, minutes=10 * j)) for j in range(2)]
    allrows = d1 + d2 + tail
    rep = p.run(mk(allrows), tiers=("1m", "1h", "1d"), incremental=True, debug_counts=True)
    for t in ("1m", "1h", "1d"):
        assert rep["metrics"][t]["incremental_from"] is not None
        # only the watermark-date rows were aggregated (day-2: 3 + 2 turns),
        # never the 6 day-1 turns — the raw scan is bounded
        assert rep["metrics"][t]["batch_rows"] == len(d2) + len(tail)

    full = RollupPipeline(spark, str(tmp_path / "full"))
    full.run(mk(allrows), tiers=("1m", "1h", "1d"))
    for t in ("1m", "1h", "1d"):
        assert p.content_hash(t) == full.content_hash(t), t

    # the cross-midnight latency made it into the incrementally-recomputed
    # day-2 1d bucket: 09:00 minus 10:50 the day before = 79_800s
    row = [
        r
        for r in p.read_tier("1d").collect()
        if r["metric"] == "latency_s" and str(r["bucket_start"]).startswith("2025-03-02")
    ]
    assert row and row[0]["cnt"] == len(d2) + len(tail)
    assert row[0]["max"] == 79_800.0
