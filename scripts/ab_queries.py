"""Same-window A/B for per-query bench regressions.

Two experiments, both interleaved so hypervisor weather hits every
condition equally:

1. ORDERING (one process): does running a heavy query immediately before
   the target inflate the target's time (GC/cache pressure — the r3
   suite-order hypothesis)?  Conditions per rep: target alone vs target
   right after the heavy query.

2. REV (subprocesses): same query, two engine revisions checked out as
   worktrees, alternated A/B/A/B with a capacity probe before each run —
   if medians match, the regression was host weather, not code.

Usage:
  python scripts/ab_queries.py ordering --targets docs_gopher_quality,docs_line_dedup \
      --heavy emb_near_dup_pairs_lsh_banded --reps 5
  python scripts/ab_queries.py rev --targets docs_line_dedup \
      --other-root /tmp/repo_old --reps 5
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _time_query(spark, name: str) -> float:
    from pink_spider_spark import queries as Q

    t0 = time.time()
    Q.QUERY_BUILDERS[name](spark, SF_DIR).write.mode("overwrite") \
        .format("noop").save()
    return time.time() - t0


def cmd_ordering(args):
    from pink_spider_spark.session import get_spark

    spark = get_spark(app_name="ab-ordering")
    targets = args.targets.split(",")
    # warmup: one pass of everything so JIT/scan caches are equal
    for name in targets + [args.heavy]:
        _time_query(spark, name)
    out = {t: {"alone": [], "after_heavy": []} for t in targets}
    for _rep in range(args.reps):
        for t in targets:
            out[t]["alone"].append(round(_time_query(spark, t), 3))
        _time_query(spark, args.heavy)
        for t in targets:
            out[t]["after_heavy"].append(round(_time_query(spark, t), 3))
    for t, d in out.items():
        d["median_alone"] = round(statistics.median(d["alone"]), 3)
        d["median_after_heavy"] = round(
            statistics.median(d["after_heavy"]), 3)
    print(json.dumps({"experiment": "ordering", "sf_dir": SF_DIR,
                      "heavy": args.heavy, "results": out}))
    spark.stop()


_REV_SNIPPET = r'''
import sys, time, json
sys.path.insert(0, sys.argv[1])
import os
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pink_spider_spark.session import get_spark
from pink_spider_spark import queries as Q
spark = get_spark(app_name="ab-rev")
sf = sys.argv[3]
name = sys.argv[2]
Q.QUERY_BUILDERS[name](spark, sf).write.mode("overwrite").format("noop").save()
t0 = time.time()
Q.QUERY_BUILDERS[name](spark, sf).write.mode("overwrite").format("noop").save()
print("ABSEC " + str(round(time.time() - t0, 3)))
spark.stop()
'''


def cmd_rev(args):
    from crawl_bench import host_capacity_probe  # scripts/ is on sys.path

    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    targets = args.targets.split(",")
    here_root = args.here_root or ROOT
    out = {}
    for t in targets:
        runs = {"here": [], "other": [], "cap_here": [], "cap_other": []}
        for _rep in range(args.reps):
            for label, root in (("here", here_root), ("other", args.other_root)):
                runs[f"cap_{label}"].append(round(host_capacity_probe(32), 1))
                r = subprocess.run(
                    [sys.executable, "-c", _REV_SNIPPET, root, t, SF_DIR],
                    capture_output=True, text=True)
                line = [l for l in r.stdout.splitlines()
                        if l.startswith("ABSEC")]
                runs[label].append(float(line[-1].split()[1]) if line else None)
        vals_h = [v for v in runs["here"] if v is not None]
        vals_o = [v for v in runs["other"] if v is not None]
        runs["median_here"] = round(statistics.median(vals_h), 3) if vals_h else None
        runs["median_other"] = round(statistics.median(vals_o), 3) if vals_o else None
        out[t] = runs
    print(json.dumps({"experiment": "rev", "sf_dir": SF_DIR,
                      "other_root": args.other_root, "results": out}))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    o = sub.add_parser("ordering")
    o.add_argument("--targets", required=True)
    o.add_argument("--heavy", default="emb_near_dup_pairs_lsh_banded")
    o.add_argument("--reps", type=int, default=5)
    o.set_defaults(fn=cmd_ordering)
    r = sub.add_parser("rev")
    r.add_argument("--targets", required=True)
    r.add_argument("--other-root", required=True)
    r.add_argument("--here-root", default=None,
                   help="engine root for the 'here' arm (default: this repo)")
    r.add_argument("--reps", type=int, default=5)
    r.set_defaults(fn=cmd_rev)
    args = ap.parse_args()
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    args.fn(args)


if __name__ == "__main__":
    main()
