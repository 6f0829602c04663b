#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/selfcheck.py <sfDir> <outDir>

For every <outDir>/<name> parquet dump with an entry in oracle_sql.json:
run the SQL in DuckDB over the sfDir parquet tables, sort columns by name,
and compare row count, schema (column names), and per-cell values
(hash-style exact compare; floats compared exactly since both sides are
expected to round identically).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # a query that crashed in Verify writes NO dump dir — surface it instead
    # of silently skipping (an all-pass gate over a missing result is worse
    # than a failure)
    dumped = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracle) - dumped):
        print(f"FAIL {name}: oracle present but no parquet dump (query crashed in Verify?)")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # the driver sorts rows by every column before hashing — an
        # unsortable column (e.g. a numpy array) fails THERE even when the
        # values match, so mirror that step (round-4 emb_quantize_int8 bite)
        try:
            got = got.sort_values(by=list(got.columns), ignore_index=True)
            want = want.sort_values(by=list(want.columns), ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: driver-parity row sort failed (unsortable column?): {e}"); n_fail += 1; continue
        bad = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype != object and b.dtype != object:
                    eq = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
                else:
                    eq = (a.astype(str).values == b.astype(str).values) | (pd.isna(a).values & pd.isna(b).values)
                if not eq.all():
                    i = int((~eq).argmax())
                    bad.append(f"{c}[row {i}]: {a.iloc[i]!r} vs {b.iloc[i]!r} ({int((~eq).sum())} cells)")
            except Exception as e:
                bad.append(f"{c}: compare error {e}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
