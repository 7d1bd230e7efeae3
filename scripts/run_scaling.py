#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: efficiency >= 0.8 from N to 4N).

No real cluster exists in this sandbox, so the two 'cluster sizes' are two
parallelism levels of the SAME job on the SAME input: local[8] vs local[32]
(8 vs 32 executor threads in one JVM, per the task brief). Each level runs
in its own spark-submit process with --py-files, so JVM warmup and codegen
caches are not shared.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/run_scaling.py [--turns 4000000] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "transcriptts")
        for dirpath, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))


def spark_submit(master: str, zip_path: str, cli_args: list[str], shuffle_partitions: int) -> dict:
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    cmd = [
        "spark-submit",
        "--master", master,
        # IDENTICAL work decomposition at both parallelism levels: fixed
        # shuffle-partition count (4x the high core count) so the efficiency
        # ratio measures parallel speedup, not a partitioning change.
        # (shuffle=cores cripples BOTH levels: 2-4x slower than 128.)
        "--conf", f"spark.sql.shuffle.partitions={shuffle_partitions}",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        "--conf", "spark.driver.memory=64g",
        # shuffle spill dir on tmpfs: the sandbox's root disk serializes
        # concurrent shuffle writes (~25% wall at 32 cores); a real cluster
        # would use local NVMe per executor
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--py-files", zip_path,
        os.path.join(REPO, "transcriptts", "cli.py"),
        *cli_args,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"spark-submit failed: {' '.join(cmd)}")
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError("no JSON line in spark-submit output")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    zip_path = "/tmp/transcriptts.zip"
    make_zip(zip_path)

    data_path = f"/tmp/transcriptts_scaling_{args.turns}.parquet"
    if not os.path.exists(data_path):
        n_convs = max(100, args.turns // 24)
        r = spark_submit(
            f"local[{args.high}]", zip_path,
            ["synth", "--out", data_path, "--convs", str(n_convs), "--slices", "128"],
            4 * args.high,
        )
        print("synth:", r, file=sys.stderr)

    results = {}
    for cores in (args.low, args.high):
        best = None
        for _ in range(args.repeats):
            r = spark_submit(
                f"local[{cores}]", zip_path,
                ["bench", "--input", data_path, "--passes", str(args.passes)],
                4 * args.high,
            )
            print(f"local[{cores}]:", r, file=sys.stderr)
            if best is None or r["turns_per_sec"] > best["turns_per_sec"]:
                best = r
        results[cores] = best

    lo, hi = results[args.low], results[args.high]
    factor = args.high / args.low
    efficiency = hi["turns_per_sec"] / (factor * lo["turns_per_sec"])
    summary = {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "low_cores": args.low,
        "high_cores": args.high,
        "turns": lo["turns"],
        "low_turns_per_sec": lo["turns_per_sec"],
        "high_turns_per_sec": hi["turns_per_sec"],
        "low_wall_sec": lo["wall_sec"],
        "high_wall_sec": hi["wall_sec"],
        "passes_north_rule": efficiency >= 0.8,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers

## Scaling efficiency (north rule: >= 0.8 from N to 4N)

Sandbox substitution for a real cluster (per task brief): the same tiered
rollup job (1m/1h/1d continuous aggregates over {lo['turns']:,} synthetic
transcript turns, fully materialized via noop sink) run via
`spark-submit --py-files /tmp/transcriptts.zip` at two parallelism levels
on the same pre-generated parquet input, with an IDENTICAL work
decomposition (shuffle partitions fixed at {4 * args.high} for both).
Protocol: per JVM, one untimed warmup pass then {args.passes} timed passes
taking the min (the sandbox host has noisy neighbors — identical passes
vary up to 2x; min ~= quiet-host time); best of {args.repeats} JVM runs.

| config | turns/sec | wall sec (min) | all timed passes |
|---|---|---|---|
| local[{args.low}] ({args.low} cores) | {lo['turns_per_sec']:,} | {lo['wall_sec']} | {lo.get('wall_sec_all')} |
| local[{args.high}] ({args.high} cores) | {hi['turns_per_sec']:,} | {hi['wall_sec']} | {hi.get('wall_sec_all')} |

**Efficiency = {hi['turns_per_sec']:,} / ({factor:.0f} x {lo['turns_per_sec']:,}) =
{efficiency:.3f}** → north rule (>= 0.8): {'PASS' if efficiency >= 0.8 else 'FAIL'}.

'turns/sec' = input turns x 3 tiers / wall seconds — the rolled-up-turns
throughput metric from BASELINE.json. Reproduce with
`python scripts/run_scaling.py --turns {args.turns}`.

## Reference baseline

SignalSharp publishes no benchmark numbers (BASELINE.md §1: benchmark
project is an empty BenchmarkDotNet switcher shell). The comparison target
is therefore the driver-defined throughput metric above plus per-query
timings recorded in BENCH_r{{N}}.json by the round driver (bench.py).
"""
        )
    print("wrote BENCH/BASELINE.md", file=sys.stderr)


if __name__ == "__main__":
    main()
