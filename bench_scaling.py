"""Two-parallelism scaling evidence (BASELINE.json north rule).

No multi-node cluster exists in this sandbox, so per the driver
instruction the two-cluster-size criterion (N vs 4N executors,
efficiency >= 0.8) is evidenced by running the IDENTICAL replay job at
local[N] and local[4N] on the SAME deterministic input, in separate
processes (one JVM per parallelism level).

Writes BENCH/scaling_r{round}.json and refreshes the table in
BENCH/BASELINE.md.

Run:  python bench_scaling.py [--low 8 --high 32 --events 4000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def run_bench(cpus: int, n_events: int, sf_dir: str, strategy: str,
              n_batches: int = 8) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_N_EVENTS=str(n_events),
        BENCH_STRATEGY=strategy,
        BENCH_N_BATCHES=str(n_batches),
        BENCH_ONLY_REPLAY="1",  # scaling criterion measures the replay only
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from bench at cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--strategy", default="mor")
    ap.add_argument("--n-batches", type=int, default=8)
    ap.add_argument("--repeat", type=int, default=1,
                    help="repeat the (low, high) pair N times; report "
                         "per-run AND median efficiency (host variance)")
    args = ap.parse_args()

    pairs = []
    all_runs = []
    for i in range(args.repeat):
        results = {}
        for cpus in (args.low, args.high):
            r = run_bench(cpus, args.events, args.sf_dir, args.strategy,
                          args.n_batches)
            results[cpus] = r
            print(f"run {i+1} local[{cpus}]: "
                  f"{r['replay']['events_per_sec']} events/sec "
                  f"({r['replay']['replay_secs']}s)", flush=True)
        lo, hi = results[args.low]["replay"], results[args.high]["replay"]
        eff = (hi["events_per_sec"] / lo["events_per_sec"]) / (
            args.high / args.low
        )
        pairs.append({
            "low_events_per_sec": lo["events_per_sec"],
            "high_events_per_sec": hi["events_per_sec"],
            "low_secs": lo["replay_secs"],
            "high_secs": hi["replay_secs"],
            "scaling_efficiency": round(eff, 3),
        })
        all_runs.append(results)
        print(f"run {i+1} efficiency: {eff:.3f}", flush=True)

    effs = sorted(p["scaling_efficiency"] for p in pairs)
    median = effs[len(effs) // 2] if len(effs) % 2 else round(
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3
    )
    summary = {
        "low_cpus": args.low,
        "high_cpus": args.high,
        "events": pairs and all_runs[0][args.low]["replay"]["events"],
        "n_batches": args.n_batches,
        "strategy": args.strategy,
        "core_ratio": args.high / args.low,
        "repeats": args.repeat,
        "per_run_efficiency": [p["scaling_efficiency"] for p in pairs],
        "median_efficiency": median,
        "best_efficiency": max(effs),
        "meets_0_8_target_median": median >= 0.8,
        "pairs": pairs,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump({"summary": summary, "runs": all_runs}, f, indent=1, default=str)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
