"""spark-submit entry point.

Package + submit (the north-rule launch mode):

    cd /root/repo && zip -r /tmp/transcriptts.zip transcriptts
    spark-submit --master local[32] --py-files /tmp/transcriptts.zip \
        transcriptts/cli.py rollup --input /tmp/transcripts.parquet --root /tmp/tiers

Subcommands:
  synth   --out PATH --convs N [--seed S] [--metronome N] [--slices N]
  rollup  --input PATH --root PATH [--tiers 1m,1h,1d] [--incremental]
  bench   --input PATH [--tiers ...]    (prints one JSON line: turns/sec)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="transcriptts")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_synth = sub.add_parser("synth")
    p_synth.add_argument("--out", required=True)
    p_synth.add_argument("--convs", type=int, default=10000)
    p_synth.add_argument("--seed", type=int, default=42)
    p_synth.add_argument("--metronome", type=int, default=86400)
    p_synth.add_argument("--slices", type=int, default=64)

    p_roll = sub.add_parser("rollup")
    p_roll.add_argument("--input", required=True)
    p_roll.add_argument("--root", required=True)
    p_roll.add_argument("--tiers", default="1m,1h,1d")
    p_roll.add_argument("--incremental", action="store_true")

    p_bench = sub.add_parser("bench")
    p_bench.add_argument("--input", required=True)
    p_bench.add_argument("--tiers", default="1m,1h,1d")
    p_bench.add_argument(
        "--passes", type=int, default=3,
        help="timed steady-state passes; min wall is reported (the sandbox "
        "host has noisy-neighbor variance up to 2x — min ~= quiet-host time)",
    )
    p_bench.add_argument("--persist-derived", action="store_true")
    p_bench.add_argument(
        "--percentile-mode", choices=("exact", "approx"), default="exact",
        help="exact = interpolating percentiles (reference parity, default); "
        "approx = mergeable Greenwald-Khanna sketches — the documented 100-TB "
        "configuration (map-side partials MERGE, no per-bucket sorted buffers)")

    args = ap.parse_args(argv)

    # spark-submit provides the app JVM; builder.getOrCreate attaches to it.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"transcriptts-{args.cmd}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    if args.cmd == "synth":
        from transcriptts.synth import synth_transcripts_spark

        df = synth_transcripts_spark(
            spark, n_convs=args.convs, seed=args.seed,
            metronome_turns=args.metronome, slices=args.slices,
        )
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"written": args.out, "rows": spark.read.parquet(args.out).count()}))

    elif args.cmd == "rollup":
        from transcriptts.pipeline import RollupPipeline

        df = spark.read.parquet(args.input)
        report = RollupPipeline(spark, args.root).run(
            df, tiers=tuple(args.tiers.split(",")), incremental=args.incremental
        )
        print(json.dumps(report))

    elif args.cmd == "bench":
        # Per-tier wide aggregation (rollup_tiers), NOT the hierarchical
        # array-merge path: measured on 16M turns, three lean built-in
        # percentile shuffles beat one shuffle that materializes + persists
        # per-bucket value arrays (24.6s vs 51.3s at local[32]; the array
        # path also degrades badly under memory pressure at low core counts).
        # rollup_tiers_hierarchical stays the right shape when raw-scan IO
        # dominates (remote storage), which a warm local page cache hides.
        from transcriptts.rollup import rollup_tiers

        df = spark.read.parquet(args.input)
        n_turns = df.count()

        from concurrent.futures import ThreadPoolExecutor

        def run_tiers() -> None:
            # submit the three tier jobs concurrently: each tier's plan (and
            # hence the work decomposition) is unchanged, but the scheduler
            # can fill the idle slots of one job's straggler wave / planning
            # gap with another job's tasks — dead time that otherwise grows
            # with core count and erodes measured scaling efficiency
            tiers = rollup_tiers(
                df,
                persist_derived=args.persist_derived,
                percentile_mode=args.percentile_mode,
            )
            with ThreadPoolExecutor(max_workers=len(tiers)) as ex:
                futs = [
                    ex.submit(lambda t=t: t.write.format("noop").mode("overwrite").save())
                    for t in tiers.values()
                ]
                for f in futs:
                    f.result()
            if args.persist_derived:
                spark.catalog.clearCache()

        # untimed warmup pass: JIT/codegen compilation and page cache, so the
        # timed passes measure steady-state throughput at both core counts
        run_tiers()
        walls = []
        loads_pre, loads_post = [], []
        for _ in range(max(args.passes, 1)):
            # per-pass 1-min load BEFORE and AFTER: external tenant bursts on
            # this shared box hit individual passes, so per-leg load alone
            # cannot attribute a slow pass — these columns can
            loads_pre.append(round(os.getloadavg()[0], 2))
            t0 = time.time()
            run_tiers()
            walls.append(round(time.time() - t0, 3))
            loads_post.append(round(os.getloadavg()[0], 2))
        wall = min(walls)
        # median is the fair cross-leg estimator when legs run different
        # pass counts (equal wall-clock exposure): the min of more samples
        # is biased lower under noise, the median is not
        sw = sorted(walls)
        wall_med = sw[len(sw) // 2] if len(sw) % 2 else (sw[len(sw) // 2 - 1] + sw[len(sw) // 2]) / 2
        cores = spark.sparkContext.defaultParallelism
        print(
            json.dumps(
                {
                    "turns": n_turns,
                    "tiers": 3,
                    "wall_sec": wall,
                    "wall_sec_median": round(wall_med, 3),
                    "wall_sec_all": walls,
                    "load1_pre_all": loads_pre,
                    "load1_post_all": loads_post,
                    "turns_per_sec": round(n_turns * 3 / wall, 1),
                    "turns_per_sec_median": round(n_turns * 3 / wall_med, 1),
                    "cores": cores,
                }
            )
        )

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
