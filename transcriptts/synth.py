"""Deterministic synthetic transcript generator.

Produces the engine's input table ``(conv_id, turn_idx, role, text, tool, ts)``
entirely from a seed — used by tests and the bench harness (no external data).
Design properties (FIXTURES.md A.1):

- seeded numpy PCG64 → byte-stable across runs and parallelism levels;
- a configurable *hot conversation* fraction with ~hot_factor× the median turn
  count (exercises skew mitigation);
- inter-turn gaps drawn from a mixture of sub-minute and multi-minute pauses so
  1-minute buckets contain both dense and empty stretches (exercises gap-fill);
- one optional *metronome* conversation at exactly 1 turn/second so time-bucket
  rollups coincide with the reference's positional segment fixtures
  (ResamplingTests.cs:59-216).

Generation is vectorized numpy → pyarrow; for large row counts use
``synth_transcripts_spark`` which fans generation out across executors with
``mapInArrow`` (each task generates its own conversation range — no driver
materialization, no shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BASE_TS_US = np.int64(1735689600000000)  # 2025-01-01T00:00:00Z in microseconds

_WORDS = np.array(
    "the a of to and in is it you that he was for on are with as i his they be "
    "at one have this from or had by word but what some we can out other were "
    "all there when up use your how said an each she which do their time if "
    "will way about many then them write would like so these her long make "
    "thing see him two has look more day could go come did number sound no "
    "most people my over know water than call first who may down side been now "
    "find any new work part take get place made live where after back little "
    "only round man year came show every good me give our under name".split()
)

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["search", "calc", "browser", "python", "sql"])


def _gen_conv_batch(
    conv_ids: np.ndarray,
    n_turns: np.ndarray,
    seed: int,
    gap_profile: str = "mixed",
) -> pa.Table:
    """Generate all turns for a batch of conversations as one Arrow table."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    total = int(n_turns.sum())
    conv_rep = np.repeat(conv_ids, n_turns)
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in n_turns]) if total else np.array([], dtype=np.int32)

    # inter-turn gaps (microseconds): mixture of quick exchanges (1-30 s) and
    # long pauses (2-40 min) so minute buckets have holes.
    if gap_profile == "metronome":
        gaps = np.full(total, 1_000_000, dtype=np.int64)
    else:
        quick = rng.integers(1_000_000, 30_000_000, size=total)
        slow = rng.integers(120_000_000, 2_400_000_000, size=total)
        gaps = np.where(rng.random(total) < 0.85, quick, slow).astype(np.int64)
    # first turn of each conversation starts at a conv-specific offset
    starts = rng.integers(0, 86_400_000_000, size=len(conv_ids)).astype(np.int64)
    first_of_conv = turn_idx == 0
    gaps[first_of_conv] = 0
    bounds = np.zeros(len(conv_ids) + 1, dtype=np.int64)
    np.cumsum(n_turns, out=bounds[1:])
    ts = np.empty(total, dtype=np.int64)
    cum = np.cumsum(gaps)
    for i in range(len(conv_ids)):  # per-conv cumulative reset (cheap: vector ops dominate)
        s, e = bounds[i], bounds[i + 1]
        base = cum[s]
        ts[s:e] = BASE_TS_US + starts[i] + (cum[s:e] - base)

    roles = _ROLES[turn_idx % 3]
    tool_mask = roles == "tool"
    tools = np.where(tool_mask, _TOOLS[rng.integers(0, len(_TOOLS), size=total)], None)

    # text: deterministic word counts 1..60, skewed low; content seeded
    n_words = (1 + (rng.pareto(2.5, size=total) * 8)).astype(np.int64).clip(1, 60)
    word_idx = rng.integers(0, len(_WORDS), size=int(n_words.sum()))
    words = _WORDS[word_idx]
    offsets = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(n_words, out=offsets[1:])
    texts = [" ".join(words[offsets[i] : offsets[i + 1]]) for i in range(total)]

    return pa.table(
        {
            "conv_id": pa.array(conv_rep, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools.tolist(), type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def _conv_plan(n_convs: int, seed: int, hot_fraction: float, hot_factor: int,
               mean_turns: int, metronome_turns: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (conv_ids, n_turns) plan. Hot convs are hot_factor× longer."""
    rng = np.random.default_rng(np.random.PCG64(seed ^ 0x5EED))
    base = rng.geometric(1.0 / mean_turns, size=n_convs).clip(2, mean_turns * 20)
    hot = rng.random(n_convs) < hot_fraction
    n_turns = np.where(hot, base * hot_factor, base).astype(np.int64)
    conv_ids = np.array([f"conv-{i:08d}" for i in range(n_convs)])
    if metronome_turns > 0:
        conv_ids = np.concatenate([conv_ids, np.array(["conv-metronome"])])
        n_turns = np.concatenate([n_turns, np.array([metronome_turns], dtype=np.int64)])
    return conv_ids, n_turns


def synth_transcripts_arrow(
    n_convs: int = 200,
    seed: int = 42,
    hot_fraction: float = 0.02,
    hot_factor: int = 50,
    mean_turns: int = 12,
    metronome_turns: int = 600,
) -> pa.Table:
    """Driver-side generation (tests, small benches)."""
    conv_ids, n_turns = _conv_plan(n_convs, seed, hot_fraction, hot_factor, mean_turns, metronome_turns)
    metro = conv_ids == "conv-metronome"
    parts = []
    if (~metro).any():
        parts.append(_gen_conv_batch(conv_ids[~metro], n_turns[~metro], seed))
    if metro.any():
        parts.append(_gen_conv_batch(conv_ids[metro], n_turns[metro], seed + 1, gap_profile="metronome"))
    return pa.concat_tables(parts)


def synth_transcripts_spark(
    spark,
    n_convs: int = 200,
    seed: int = 42,
    hot_fraction: float = 0.02,
    hot_factor: int = 50,
    mean_turns: int = 12,
    metronome_turns: int = 600,
    slices: int | None = None,
):
    """Distributed generation: each task generates a contiguous conv range.

    The per-conv plan is recomputed inside every task from the seed (cheap,
    deterministic) so no row data ever touches the driver. Deterministic for a
    fixed (seed, slices) pair; pass an explicit ``slices`` (or materialize to
    parquet once) when two runs must see byte-identical input — the scaling
    bench does exactly that.
    """
    from pyspark.sql import functions as F  # noqa: F401

    import pandas as pd

    conv_ids, n_turns = _conv_plan(n_convs, seed, hot_fraction, hot_factor, mean_turns, metronome_turns)
    slices = slices or spark.sparkContext.defaultParallelism
    bounds = np.linspace(0, len(conv_ids), slices + 1).astype(int)
    ranges = [(int(lo), int(hi)) for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
    rdf = spark.createDataFrame(pd.DataFrame(ranges, columns=["lo", "hi"])).repartition(len(ranges), "lo")

    from .schema import TRANSCRIPTS_SCHEMA

    def gen(batches):
        for batch in batches:
            b = batch.to_pydict()
            for lo, hi in zip(b["lo"], b["hi"]):
                ids, nt = conv_ids[lo:hi], n_turns[lo:hi]
                metro = ids == "conv-metronome"
                if (~metro).any():
                    # seed offset by lo keeps ranges independent yet deterministic
                    yield from _gen_conv_batch(ids[~metro], nt[~metro], seed + 1000 + lo).to_batches()
                if metro.any():
                    yield from _gen_conv_batch(ids[metro], nt[metro], seed + 1, gap_profile="metronome").to_batches()

    return rdf.mapInArrow(gen, TRANSCRIPTS_SCHEMA)
