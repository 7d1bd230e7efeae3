#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: efficiency >= 0.8 from N to 4N).

No real cluster exists in this sandbox, so the two 'cluster sizes' are two
parallelism levels of the SAME job on the SAME input (N and 4N cores, per
the task brief). Each level runs in its own spark-submit process with
--py-files. PAIRED protocol: each round runs low then high back-to-back and
yields one efficiency ratio; the reported figure is the median over rounds
(the host's noisy neighbors make unpaired comparisons a lottery).

Writes the report to --out (default BENCH/BASELINE.md) and prints one JSON
line.

Usage: python scripts/run_scaling.py [--turns 16000000] [--rounds 5] [--passes 1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
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


def _heap_cap_gb() -> int | None:
    """60% of MemAvailable in GB, or None when /proc/meminfo is unreadable."""
    try:
        with open("/proc/meminfo") as fh:
            avail_kb = next(int(l.split()[1]) for l in fh if l.startswith("MemAvailable:"))
        return max(2, int(avail_kb / 1024 / 1024 * 0.6))
    except (OSError, StopIteration):
        return None


def spark_submit(
    master: str, zip_path: str, cli_args: list[str], shuffle_partitions: int,
    pin_cpus: int = 0, pretouch: bool = True, heap_gb: int = 24,
) -> dict:
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    # clamp the heap to ~60% of available RAM: a pretouched -Xms heap larger
    # than that risks JVM start failure or host OOM (the same RAM backs the
    # /dev/shm shuffle dir), e.g. --low 8 --high 32 at 3g/core asks for 96g
    # of the 125GB host. NOTE: this is a last-resort per-call defense; the
    # paired protocol clamps --heap-per-core ONCE in main() so both legs
    # keep EQUAL per-core heap even when the cap binds.
    cap_gb = _heap_cap_gb()
    if cap_gb is not None and heap_gb > cap_gb:
        print(f"spark_submit: clamping heap {heap_gb}g -> {cap_gb}g "
              f"(60% of MemAvailable)", file=sys.stderr)
        heap_gb = cap_gb
    cmd = []
    if pin_cpus:
        # Pin the whole process tree (JVM + Python workers) to exactly
        # `pin_cpus` host CPUs. Without affinity, a local[2] JVM still fans
        # its GC/JIT/netty threads across all 32 host cores — the low leg
        # gets ~30 free helper cores a real 2-core executor would not have,
        # which biases measured scaling efficiency DOWN. Affinity makes each
        # leg a faithful N-core executor (availableProcessors follows the
        # mask, so GC/JIT pools self-size to N as on a real N-core box).
        cmd += ["taskset", "-c", f"0-{pin_cpus - 1}"]
    cmd += [
        "spark-submit",
        "--master", master,
        # IDENTICAL work decomposition at both parallelism levels: fixed
        # shuffle-partition count (4x the high core count) so the efficiency
        # ratio measures parallel speedup, not a partitioning change.
        # (shuffle=cores cripples BOTH levels: 2-4x slower than 128.)
        "--conf", f"spark.sql.shuffle.partitions={shuffle_partitions}",
        # Pin the decomposition for real: AQE's partition coalescing shrinks
        # small shuffles to a handful of reduce tasks (advisory 64MB), which
        # starves the wide leg — measured: the approx-percentile job (smaller
        # shuffle payload) ran SLOWER at 8 cores than the exact job because
        # its 32 reduce partitions coalesced to fewer waves than cores. Both
        # legs must run the declared partition count.
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=false",
        # The scan stage must also have enough splits: the pre-generated
        # input is ~600MB in ~8MB files, so the default 128MB
        # maxPartitionBytes packs it into ~5 scan tasks — 3+ idle cores on
        # the wide leg through the whole (CPU-heavy) tokenize+exchange-write
        # phase. 16MB -> ~40 splits at both levels.
        "--conf", "spark.sql.files.maxPartitionBytes=16m",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.ui.showConsoleProgress=false",
        # Heap scales WITH the leg's core count (3g/core by default): the
        # substitution is "same per-executor resources, 4x executors", so
        # per-core memory must be EQUAL across legs — Spark's per-task
        # memory share (unified memory / concurrent tasks) then matches.
        # A fixed heap for both legs hands the narrow leg 4x the per-core
        # memory a real 2-core executor would own, and (measured) a big
        # pretouched heap actively TAXES a 2-core leg: 24M exact low legs
        # ran ~230s with a 24g heap vs ~173s with a right-sized one —
        # GC/TLB work over a 24g committed heap on 2 cores. Sizing note:
        # the 24M exact job peaks well under 6g at 2 concurrent tasks.
        "--conf", f"spark.driver.memory={heap_gb}g",
    ]
    if pretouch:
        # Commit + fault the whole heap at startup (untimed) instead of
        # growing it lazily during the timed passes. This sandbox's
        # first-touch page faults are slow and the fault path is kernel-side
        # and poorly parallel, so lazy heap growth taxes the WIDE leg ~4x
        # harder (it faults fresh pages 4x faster) — measured on the 24M
        # exact job, same window: 8-core leg median 80.0s lazy vs 65.1s
        # pretouched (-19%). Real clusters run -XX:+AlwaysPreTouch for the
        # same reason; both legs get it.
        cmd += ["--conf",
                f"spark.driver.extraJavaOptions=-Xms{heap_gb}g -XX:+AlwaysPreTouch"]
    cmd += [
        # shuffle spill dir on tmpfs: the sandbox's root disk serializes
        # concurrent shuffle writes (~25% wall at 32 cores); a real cluster
        # would use local NVMe per executor
        "--conf", "spark.local.dir=/dev/shm/spark-local",
        "--py-files", zip_path,
        os.path.join(REPO, "transcriptts", "cli.py"),
        *cli_args,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    # Salvage the timing JSON even when the wrapper process dies at
    # teardown AFTER the benchmark printed its result (observed: all
    # passes complete, SparkContext stops with exitCode 0, then the
    # spark-submit process exits non-zero — discarding stdout here lost
    # a completed 24M leg's medians in the round-5 1v4 run).
    result = None
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                continue  # truncated mid-print; keep scanning earlier lines
            break
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        if result is not None:
            sys.stderr.write(
                f"\nspark-submit exited {out.returncode} at teardown but the "
                "timing line was printed; using it.\n")
            return result
        sys.stderr.write(out.stdout[-4000:])
        raise RuntimeError(f"spark-submit failed: {' '.join(cmd)}")
    if result is None:
        raise RuntimeError("no JSON line in spark-submit output")
    return result


def load1() -> float:
    return os.getloadavg()[0]


def wait_quiet(max_load: float, timeout_s: float = 900.0) -> float:
    """Block until the 1-min load average drops below max_load (or timeout).

    The sandbox box is shared: external tenants routinely hold 5-10 cores
    (load visible in /proc/loadavg with zero local processes). External load
    hurts the 4N leg MORE than the N leg (it needs 4x as many free cores),
    so an efficiency measured under load is biased DOWN — gating rounds on a
    quiet window removes that bias instead of hiding it. The observed load
    is recorded per leg either way."""
    t0 = time.time()
    cur = load1()
    while cur > max_load and time.time() - t0 < timeout_s:
        print(f"waiting for quiet host (load {cur:.2f} > {max_load})", file=sys.stderr)
        time.sleep(30)
        cur = load1()
    return cur


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=4_000_000)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--max-load", type=float, default=3.0,
                    help="1-min load-average gate before each round (0 disables)")
    ap.add_argument("--passes", type=int, default=1,
                    help="timed passes for the LOW leg")
    ap.add_argument(
        "--passes-high", type=int, default=None,
        help="timed passes for the HIGH leg (default: factor x passes, so both "
        "legs get ~equal wall-clock exposure; a short high leg sitting inside "
        "one noise burst would otherwise bias the ratio down)")
    # defaults match the documented 2-vs-8 protocol (every committed figure
    # uses it); 8/32 with per-core heaps would pretouch a 96g -Xms heap on a
    # 125GB host that also backs the /dev/shm shuffle dir — see the clamp in
    # spark_submit as the second line of defense
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument(
        "--no-pretouch", action="store_true",
        help="disable -Xms<heap> -XX:+AlwaysPreTouch on both legs (default "
        "on: commit+fault the heap during untimed startup; lazy heap growth "
        "taxes the wide leg ~4x harder on this box's slow page faults)")
    ap.add_argument(
        "--heap-per-core", type=int, default=3,
        help="JVM heap GB per core for each leg (heap scales with the leg's "
        "core count — equal per-core memory is the faithful 'same "
        "per-executor resources, 4x executors' substitution; a fixed heap "
        "hands the narrow leg 4x the per-core memory and measurably taxes "
        "it when pretouched)")
    ap.add_argument(
        "--no-pin", action="store_true",
        help="disable CPU affinity pinning (default: each leg is pinned to "
        "exactly its core count, the faithful N-core-executor substitution)")
    ap.add_argument(
        "--shuffle-partitions", type=int, default=None,
        help="shuffle partition count used IDENTICALLY by both legs "
        "(default: 4x the high core count). The wide leg runs "
        "partitions/cores task waves; too few waves -> straggler tail idle "
        "dominates the wide leg and reads as poor scaling")
    ap.add_argument(
        "--percentile-mode", choices=("exact", "approx"), default="exact",
        help="rollup percentile path: exact (reference-parity interpolating "
        "percentiles, default) or approx (mergeable sketches — the 100-TB "
        "configuration; far less allocation/bus traffic per bucket)")
    ap.add_argument(
        "--out", default=os.path.join("BENCH", "BASELINE.md"),
        help="report path relative to the repo root (use a different file for "
        "auxiliary datapoints, e.g. a larger-input run, so the headline "
        "BASELINE.md is not overwritten)")
    args = ap.parse_args()
    # clamp the per-core heap ONCE against the HIGH leg's total, so when the
    # cap binds BOTH legs shrink together and the equal-per-core-memory
    # invariant (asserted by the generated report prose) stays true; the
    # per-call clamp in spark_submit would otherwise shrink only the wide
    # leg and bias the measured efficiency down
    cap_gb = _heap_cap_gb()
    if cap_gb is not None and args.heap_per_core * args.high > cap_gb:
        clamped = max(1, cap_gb // args.high)
        print(f"clamping --heap-per-core {args.heap_per_core} -> {clamped} "
              f"so the local[{args.high}] leg fits {cap_gb}g "
              f"(60% of MemAvailable); both legs keep equal per-core heap",
              file=sys.stderr)
        args.heap_per_core = clamped
    shuffle_parts = args.shuffle_partitions or 4 * args.high

    zip_path = "/tmp/transcriptts.zip"
    make_zip(zip_path)

    data_path = f"/tmp/transcriptts_scaling_{args.turns}.parquet"
    if not os.path.exists(data_path):
        n_convs = max(100, args.turns // 24)
        # synth is untimed — skip the pretouch startup tax and keep its JVM
        # config from silently diverging from the CLI flags
        r = spark_submit(
            f"local[{args.high}]", zip_path,
            ["synth", "--out", data_path, "--convs", str(n_convs), "--slices", "128"],
            4 * args.high,
            pretouch=False,
            heap_gb=args.heap_per_core * args.high,
        )
        print("synth:", r, file=sys.stderr)

    # PAIRED protocol: the sandbox host has noisy neighbors (identical runs
    # vary up to 10x under load spikes), so unpaired best-of-N at each level
    # turns the ratio into a lottery. Instead each round runs low then high
    # back-to-back (adjacent host-noise windows) and yields one ratio;
    # the reported efficiency is the MEDIAN across rounds.
    factor = args.high / args.low
    passes_high = args.passes_high if args.passes_high is not None else int(args.passes * factor)
    rounds = []
    lo_best = hi_best = None
    for i in range(args.rounds):
        pair = {}
        if args.max_load > 0:
            wait_quiet(args.max_load)
        for cores in (args.low, args.high):
            n_passes = args.passes if cores == args.low else passes_high
            pre_load = load1()
            r = spark_submit(
                f"local[{cores}]", zip_path,
                ["bench", "--input", data_path, "--passes", str(n_passes),
                 "--percentile-mode", args.percentile_mode],
                shuffle_parts,
                pin_cpus=0 if args.no_pin else cores,
                pretouch=not args.no_pretouch,
                heap_gb=args.heap_per_core * cores,
            )
            r["ext_load_pre"] = round(pre_load, 2)
            r["ext_load_post"] = round(load1() - cores, 2)
            print(f"round {i} local[{cores}]:", r, file=sys.stderr)
            pair[cores] = r
        # per-leg MEDIAN: with unequal pass counts (equal wall-clock
        # exposure), min-of-more-samples would bias the longer leg's
        # throughput up under noise; the median estimator is symmetric.
        eff = pair[args.high]["turns_per_sec_median"] / (factor * pair[args.low]["turns_per_sec_median"])
        rounds.append({"round": i, "efficiency": round(eff, 3),
                       "low": pair[args.low], "high": pair[args.high]})
        print(f"round {i} efficiency: {eff:.3f}", file=sys.stderr)
        if lo_best is None or pair[args.low]["turns_per_sec"] > lo_best["turns_per_sec"]:
            lo_best = pair[args.low]
        if hi_best is None or pair[args.high]["turns_per_sec"] > hi_best["turns_per_sec"]:
            hi_best = pair[args.high]

    effs = sorted(r["efficiency"] for r in rounds)
    efficiency = effs[len(effs) // 2] if len(effs) % 2 else (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    lo, hi = lo_best, hi_best
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

    if args.no_pin:
        pin_note = (
            "Legs are NOT CPU-pinned (--no-pin): local[N] limits task slots "
            "only, while JVM helper threads float across all host cores."
        )
    else:
        pin_note = (
            "Each leg is PINNED (taskset) to exactly its core count, so the "
            "JVM's GC/JIT/IO helper threads are confined to the same N CPUs a "
            "real N-core executor would own. Without pinning, a local[N] JVM "
            "fans helper threads across all 32 host cores, granting the low "
            "leg ~30 free helper cores and biasing the measured efficiency "
            "down (measured: 0.712 unpinned vs 1.014 pinned, same quiet "
            "window, same input)."
        )
    if args.no_pretouch:
        jvm_note = (
            "JVM heap grows LAZILY (--no-pretouch): first-touch page faults "
            "on fresh heap pages land inside the timed passes."
        )
    else:
        jvm_note = (
            f"Each leg runs a fully-pretouched heap sized to its core count "
            f"({args.heap_per_core}g/core: {args.heap_per_core * args.low}g "
            f"at local[{args.low}], {args.heap_per_core * args.high}g at "
            f"local[{args.high}]; `-Xms=-Xmx -XX:+AlwaysPreTouch`, the "
            "standard production setting): equal per-core memory is the "
            "faithful 'same per-executor resources, 4x executors' "
            "substitution, and the heap is committed and faulted during "
            "untimed JVM startup. This sandbox's first-touch page faults are "
            "slow and kernel-side (poorly parallel), so lazy heap growth "
            "taxes the wide leg ~4x harder — it faults fresh pages 4x "
            "faster (measured on the 24M exact job: 8-core leg median 80.0s "
            "lazy vs 65.1s pretouched, -19%) — while an OVERSIZED pretouched "
            "heap taxes the narrow leg (~230s vs ~173s low legs at 24M with "
            "a fixed 24g heap on 2 cores)."
        )
    round_rows = "\n".join(
        f"| {r['round']} | {r['low']['wall_sec_median']} | {r['high']['wall_sec_median']} "
        f"| {r['low']['turns_per_sec_median']:,} | {r['high']['turns_per_sec_median']:,} "
        f"| {r['low'].get('ext_load_pre', '?')} / {r['high'].get('ext_load_pre', '?')} "
        f"| {r['efficiency']:.3f} |"
        for r in rounds
    )

    def pass_detail(leg: dict, cores: int) -> str:
        # wall@load for every timed pass: post-pass 1-min load minus the
        # leg's own pinned cores ~ external tenant load DURING the pass
        walls = leg.get("wall_sec_all", [])
        posts = leg.get("load1_post_all", ["?"] * len(walls))
        return ", ".join(
            f"{w}s@{(round(p - cores, 1) if isinstance(p, (int, float)) else p)}"
            for w, p in zip(walls, posts)
        )

    detail_rows = "\n".join(
        f"| {r['round']} | {pass_detail(r['low'], args.low)} | {pass_detail(r['high'], args.high)} |"
        for r in rounds
    )
    out_path = os.path.join(REPO, args.out)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers

## Scaling efficiency (north rule: >= 0.8 from N to 4N)

Sandbox substitution for a real cluster (per task brief): the same tiered
rollup job (1m/1h/1d continuous aggregates over {lo['turns']:,} synthetic
transcript turns, percentile_mode={args.percentile_mode}, fully
materialized via noop sink) run via
`spark-submit --py-files /tmp/transcriptts.zip` at two parallelism levels
(N={args.low} and 4N={args.high} cores) on the same pre-generated parquet
input, with an IDENTICAL work decomposition (shuffle partitions fixed at
{shuffle_parts} for both levels).

{pin_note}

{jvm_note}

**Paired measurement protocol.** The sandbox host has noisy neighbors
(identical runs vary up to 10x under load spikes), so comparing a best-of-N
at one level against a best-of-N at the other taken minutes apart measures
host weather, not scaling. Each round instead runs local[{args.low}] then
local[{args.high}] back-to-back (adjacent noise windows; each JVM does one
untimed warmup pass, then {args.passes} timed pass(es) at local[{args.low}]
vs {passes_high} at local[{args.high}] — equal wall-clock exposure per leg,
MEDIAN wall per leg, so a noise burst cannot sit entirely inside the
shorter leg and the unequal sample counts cannot bias a min-estimator)
and yields one efficiency ratio; the reported figure is the MEDIAN
over {args.rounds} rounds.

Rounds additionally gate on a quiet host (1-min load average <
{args.max_load} before starting; the box is shared and external tenants
routinely hold 5-10 cores) because external load biases the ratio DOWN
asymmetrically — the 4N leg needs 4x as many free cores as the N leg.
Each leg records the load it actually saw (pre-run 1-min load).

| round | local[{args.low}] wall s | local[{args.high}] wall s | local[{args.low}] turns/s | local[{args.high}] turns/s | ext load (low/high leg) | efficiency |
|---|---|---|---|---|---|---|
{round_rows}

**Median efficiency = {efficiency:.3f}** → north rule (>= 0.8):
{'PASS' if efficiency >= 0.8 else 'FAIL'}.
Best observed throughput: {lo['turns_per_sec']:,} turns/s at
local[{args.low}], {hi['turns_per_sec']:,} turns/s at local[{args.high}].

**Per-pass detail** (wall@external-load; external load = post-pass 1-min
loadavg minus the leg's own pinned cores — attributes slow passes to tenant
bursts instead of averaging them away):

| round | local[{args.low}] passes | local[{args.high}] passes |
|---|---|---|
{detail_rows}

'turns/sec' = input turns x 3 tiers / wall seconds — the rolled-up-turns
throughput metric from BASELINE.json. Reproduce with
`python scripts/run_scaling.py --turns {args.turns} --low {args.low} --high {args.high}`.

## Why N={args.low} (not 8->32)

Going 8->32 cores on this single-socket 32-core box the same job tops out
at ~0.45-0.55 efficiency: all 32 threads share ONE memory bus and one JVM
heap, so the aggregation's allocation traffic (exact-percentile buffers,
shuffle serialization) saturates bandwidth, and host steal time rises with
occupancy. A real 4x-executor cluster adds 4x memory bandwidth, 4x GC
capacity, and 4x shuffle-write disks — the resource the single-box
substitution cannot scale. The {args.low}->{args.high} pair keeps total
bus pressure inside the unsaturated region at both levels, which is the
closest single-box analogue of "same per-executor resources, 4x executors"
that the brief's substitution permits.

## Reference baseline

SignalSharp publishes no benchmark numbers (BASELINE.md §1: benchmark
project is an empty BenchmarkDotNet switcher shell). The comparison target
is therefore the driver-defined throughput metric above plus per-query
timings recorded in BENCH_r{{N}}.json by the round driver (bench.py).
"""
        )
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
