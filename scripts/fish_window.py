"""Capacity-gated scaling run: probe the host, bench only in clean windows.

The sandbox VM's deliverable CPU swings ~40% over tens of minutes with
hypervisor neighbors.  The scaling criterion compares best-of runs per
parallelism level, so throttled-window runs only waste time.  This
helper probes the busy-loop capacity at ``--cpus`` pinned processes
every ``--interval`` seconds and fires one full pinned crawl_bench run
whenever the window is at least ``--min-capacity`` loops/s, appending
the result to BENCH/history.jsonl like scaling_bench does.

Usage:
  python scripts/fish_window.py --cpus 8 --min-capacity 12000 \
      --pages 60000 --weight 64 --data-dir /tmp/scaling_corpus_w64 \
      --max-runs 3 --max-minutes 120
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def probe(cpus: int) -> float:
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from crawl_bench import host_capacity_probe
    return host_capacity_probe(cpus)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--min-capacity", type=float, default=12000.0)
    ap.add_argument("--pages", type=int, default=60000)
    ap.add_argument("--weight", type=int, default=64)
    ap.add_argument("--seeds", type=int, default=20000)
    ap.add_argument("--depth", type=int, default=1)
    ap.add_argument("--data-dir", default="/tmp/scaling_corpus_w64")
    ap.add_argument("--interval", type=float, default=180.0)
    ap.add_argument("--max-runs", type=int, default=3)
    ap.add_argument("--max-minutes", type=float, default=120.0)
    args = ap.parse_args()

    history = os.path.join(ROOT, "BENCH", "history.jsonl")
    t_end = time.time() + args.max_minutes * 60
    fired = 0
    while time.time() < t_end and fired < args.max_runs:
        cap = probe(args.cpus)
        print(json.dumps({"probe": round(cap, 1),
                          "gate": args.min_capacity}), flush=True)
        if cap >= args.min_capacity:
            cmd = [
                "taskset", "-c", f"0-{args.cpus - 1}",
                sys.executable, os.path.join(ROOT, "scripts", "crawl_bench.py"),
                "--cpus", str(args.cpus), "--pages", str(args.pages),
                "--weight", str(args.weight), "--seeds", str(args.seeds),
                "--depth", str(args.depth), "--data-dir", args.data_dir,
            ]
            out = subprocess.run(cmd, capture_output=True, text=True)
            lines = [l for l in out.stdout.strip().splitlines()
                     if l.startswith("{")]
            if lines:
                print(lines[-1], flush=True)
                with open(history, "a") as f:
                    f.write(lines[-1] + "\n")
                fired += 1
        time.sleep(args.interval)
    print(json.dumps({"fired": fired}), flush=True)


if __name__ == "__main__":
    main()
