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
