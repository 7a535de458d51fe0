"""Regenerate CORRECTNESS_LOCAL_r05.json: every queries() entry vs its
DuckDB oracle at sf0.01 AND sf0.1, per-query rows + hash-match + secs.
Round 5: hash-match requires BOTH canonicalization paths — the fetchall
canon (row-value truth) AND the driver-faithful pandas canon (dtype +
hashable-schema sensitive; see verify_oracle.py docstring) — so a query
only counts green if the driver's own gate would also pass it."""
import json, os, subprocess, sys, time

sys.path.insert(0, "/root/repo")
import duckdb
from pink_spider_spark import queries as Q
from pink_spider_spark.session import get_spark

sys.path.insert(0, "/root/repo/scripts")
from verify_oracle import TABLES, pandas_canon_hash, value_hash

spark = get_spark(app_name="gen-correctness")
out = {}
counts = {}
for sf, sf_dir in (("0.01", "/root/testdata/sf0.01"),
                   ("0.1", "/root/testdata/sf0.1")):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_ok = 0
    for name, fn in Q.QUERY_BUILDERS.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        cur = con.execute(Q.ORACLES[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        ok = (len(srows) == len(orows)
              and sorted(sdf.columns) == sorted(ocols)
              and value_hash([tuple(r) for r in srows], sdf.columns)
              == value_hash(orows, ocols))
        if ok:
            import pandas as pd
            try:
                spdf = pd.DataFrame.from_records(
                    [tuple(r) for r in srows], columns=sdf.columns)
                opdf = con.execute(Q.ORACLES[name]).fetch_df()
                ok = pandas_canon_hash(spdf) == pandas_canon_hash(opdf)
            except TypeError:
                ok = False
        n_ok += ok
        out.setdefault(name, {})[sf] = {
            "hash_match": bool(ok), "rows": len(srows),
            "secs": round(time.time() - t0, 1)}
        print(f"{sf} {name}: {'ok' if ok else 'FAIL'}", flush=True)
    counts[sf] = n_ok
    con.close()

rev = subprocess.check_output(["git", "rev-parse", "--short", "HEAD"],
                              cwd="/root/repo").decode().strip()
doc = {"engine_rev": rev,
       "generated": "2026-08-21 round 5 local verify_oracle.py (dual canon)",
       "hash_match_sf0.01": counts["0.01"],
       "hash_match_sf0.1": counts["0.1"],
       "queries": dict(sorted(out.items())),
       "queries_total": len(Q.QUERY_BUILDERS)}
with open("/root/repo/CORRECTNESS_LOCAL_r05.json", "w") as f:
    json.dump(doc, f, indent=1, sort_keys=False)
print("TOTALS", counts, "of", len(Q.QUERY_BUILDERS))
spark.stop()
