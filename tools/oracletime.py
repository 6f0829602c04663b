#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the denominator of the judge's strict
bench ratio (Spark oracle-subset seconds / DuckDB oracle seconds).

Usage: python3 tools/oracletime.py <sfDir> <outDir-with-oracle_sql.json>

Runs every oracle SQL once against the sfDir parquet tables and prints a
JSON line with per-query and total seconds.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name in sorted(oracle):
        t0 = time.time()
        try:
            con.execute(oracle[name]).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = f"ERROR {e}"[:80]
    ok = {k: v for k, v in times.items() if isinstance(v, float)}
    print(json.dumps({"n": len(ok), "errors": len(times) - len(ok),
                      "total_sec": round(sum(ok.values()), 2),
                      "queries": times}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
