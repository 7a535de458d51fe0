"""Two-parallelism scaling evidence (BASELINE.json north_rule).

Runs the identical crawl-wave job on the identical corpus at local[8] (N)
and local[32] (4N) in separate subprocesses (fresh JVM each), computes
    efficiency = (throughput_4N / throughput_N) / 4
and writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [--pages 60000] [--weight 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, args) -> dict:
    cmd = [
        sys.executable, os.path.join(ROOT, "scripts", "crawl_bench.py"),
        "--cpus", str(cpus), "--pages", str(args.pages),
        "--weight", str(args.weight), "--seeds", str(args.seeds),
        "--depth", str(args.depth), "--data-dir", args.data_dir,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--weight", type=int, default=16)
    ap.add_argument("--seeds", type=int, default=20000)
    ap.add_argument("--depth", type=int, default=1)
    ap.add_argument("--data-dir", default="/tmp/scaling_corpus")
    args = ap.parse_args()

    # pre-generate the shared corpus at full parallelism (input data,
    # excluded from both timed runs)
    subprocess.run([
        sys.executable, os.path.join(ROOT, "scripts", "crawl_bench.py"),
        "--cpus", "32", "--pages", str(args.pages), "--weight", str(args.weight),
        "--seeds", str(args.seeds), "--depth", str(args.depth),
        "--data-dir", args.data_dir, "--gen-only",
    ], capture_output=True, text=True, check=True)

    r8 = run_level(8, args)
    r32 = run_level(32, args)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0

    md = f"""# BENCH/BASELINE — crawl throughput + scaling evidence

Same wave job, same deterministic corpus ({args.pages} pages, weight
{args.weight} ≈ real-page extraction cost, {args.seeds} seeds, depth
{args.depth}), two parallelism levels (sandbox stand-in for N vs 4N
executors per the driver instructions).

| run | master | urls processed | seconds | urls/sec |
|---|---|---|---|---|
| N  | local[8]  | {r8['urls_processed']} | {r8['seconds']} | {r8['urls_per_sec']} |
| 4N | local[32] | {r32['urls_processed']} | {r32['seconds']} | {r32['urls_per_sec']} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target >= 0.8, BASELINE.json north_rule)

Notes
- throughput includes the full wave pipeline: dequeue (salted per-host
  budget windows) -> bloom seen-prune -> fetch-sim join -> extract UDF ->
  link enqueue -> atomic snapshot commit; corpus generation is excluded
  (it is input data, golden text included).
- fixed per-run cost (JVM + python-worker warmup + bootstrap, ~8-10 s) is
  amortized over the run; at 10^10-URL scale waves are millions of URLs
  and this cost vanishes — the sandbox run is sized so extraction
  dominates the same way.
"""
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"n8": r8, "n32": r32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
