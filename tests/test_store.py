"""Raw-turns store: range-partitioned layout + per-turn text fidelity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from transcriptts.store import read_raw_turns, turns_fingerprint, write_raw_turns
from transcriptts.synth import synth_transcripts_arrow


def _transcripts(spark, **kw):
    tbl = synth_transcripts_arrow(n_convs=20, metronome_turns=300, seed=7, **kw)
    return spark.createDataFrame(tbl.to_pandas())


def test_roundtrip_preserves_per_turn_text(spark, tmp_path):
    src = _transcripts(spark)
    path = str(tmp_path / "raw")
    write_raw_turns(src, path)
    back = read_raw_turns(spark, path)

    assert back.count() == src.count()

    # the north-star invariant: per-turn text equality under stable
    # (conv_id, turn_idx) ordering, order-insensitively fingerprinted
    a = {tuple(r) for r in turns_fingerprint(src).collect()}
    b = {tuple(r) for r in turns_fingerprint(back.drop("p_date")).collect()}
    assert a == b

    # layout: hive p_date partitions exist and time scans prune on them
    assert any(d.startswith("p_date=") for d in os.listdir(path))
    some_date = sorted(
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("p_date=")
    )[0]
    pruned = back.where(F.col("p_date") == some_date)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "p_date" in plan


def test_fingerprint_distinguishes_null_and_empty_text(spark):
    rows_null = [("c", 0, "user", None, None, None)]
    rows_empty = [("c", 0, "user", "", None, None)]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    fp_null = turns_fingerprint(spark.createDataFrame(rows_null, schema)).collect()[0]["text_fp"]
    fp_empty = turns_fingerprint(spark.createDataFrame(rows_empty, schema)).collect()[0]["text_fp"]
    assert fp_null != fp_empty


def test_fingerprint_is_partitioning_invariant(spark):
    """Same logical rows through different physical layouts → same fp."""
    src = _transcripts(spark)
    fp1 = {tuple(r) for r in turns_fingerprint(src).collect()}
    shuffled = src.repartition(7, "ts")  # scramble row placement
    fp2 = {tuple(r) for r in turns_fingerprint(shuffled).collect()}
    assert fp1 == fp2


def test_hot_conversation_spreads_across_ranges(spark, tmp_path):
    """Skew mitigation: the metronome conversation's turns must not land in
    a single range partition — ts participates in the range key, so the
    boundaries fall inside the hot conversation."""
    src = _transcripts(spark)
    hot = (
        src.groupBy("conv_id").count().orderBy(F.desc("count")).limit(1).collect()[0]["conv_id"]
    )
    n = 8
    ranged = src.repartitionByRange(n, "conv_id", "ts").withColumn(
        "pid", F.spark_partition_id()
    )
    hot_parts = ranged.where(F.col("conv_id") == hot).select("pid").distinct().count()
    assert hot_parts > 1
