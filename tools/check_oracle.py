#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet dump written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
testdata parquet tables, and compares as sorted sets (columns sorted by
name, rows sorted, exact values).
"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        want = con.sql(sql).df()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            fails += 1
            continue
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            fails += 1
            continue
        ok = True
        for c in g.columns:
            for i, (a, b) in enumerate(zip(g[c], w[c])):
                if a != b and not (isinstance(a, float) and isinstance(b, float)
                                   and (math.isnan(a) and math.isnan(b))):
                    print(f"FAIL {name}: col {c} row {i}: {a!r} != {b!r} "
                          f"({type(a).__name__} vs {type(b).__name__})")
                    ok = False
                    break
            if not ok:
                break
        if ok:
            print(f"OK   {name} ({len(g)} rows)")
        else:
            fails += 1
    except Exception as e:
        print(f"ERR  {name}: {e}")
        fails += 1
print(f"\n{len(oracle)} oracle queries, {fails} failures")
sys.exit(1 if fails else 0)
