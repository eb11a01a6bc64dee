#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet dump written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
testdata parquet tables, and compares as sorted sets (columns sorted by
name, rows sorted, exact values).
"""
import json, sys, math
import pandas as pd
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
        got_rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        want_rel = con.sql(sql)
        # Type check FIRST: the driver hashes serialized values, so a
        # HUGEINT-vs-BIGINT oracle mismatch fails there even when every
        # value compares equal in pandas (VERDICT r3 #3). The driver DOES
        # tolerate width differences within a family (Spark size()=INT32 vs
        # DuckDB len()=BIGINT hash-matched in r3), so compare type FAMILIES:
        # HUGEINT is its own family and gets flagged against BIGINT.
        def family(t):
            t = str(t).upper()
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
                return "int"
            if t in ("FLOAT", "DOUBLE"):
                return "float"
            return t  # HUGEINT, DECIMAL(..), VARCHAR, BOOLEAN, TIMESTAMP, ...
        got_types = dict(zip(got_rel.columns, [family(t) for t in got_rel.types]))
        want_types = dict(zip(want_rel.columns, [family(t) for t in want_rel.types]))
        type_mismatch = {c: (got_types[c], want_types[c])
                         for c in got_types
                         if c in want_types and got_types[c] != want_types[c]}
        if type_mismatch:
            print(f"FAIL {name}: type mismatch {type_mismatch}")
            fails += 1
            continue
        got = got_rel.df()
        want = want_rel.df()
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
                # NaN/NaT/None compare unequal to themselves — treat
                # both-missing as equal (pd.isna covers all three).
                try:
                    both_na = bool(pd.isna(a)) and bool(pd.isna(b))
                except (TypeError, ValueError):
                    both_na = False
                if a != b and not both_na:
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
