#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sf tables,
and compares row counts, column names, and values (sorted by all columns).
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = nooracle = 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    got = con.sql(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
    if name not in oracles:
        status = "rows-only"
        nooracle += 1
        print(f"  [{status}] {name}: {len(got)} rows")
        continue
    want = con.sql(oracles[name]).fetchdf()
    problems = []
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        problems.append(f"cols differ: spark={gcols} oracle={wcols}")
    elif len(got) != len(want):
        problems.append(f"rowcount: spark={len(got)} oracle={len(want)}")
    else:
        g = got[gcols].sort_values(gcols).reset_index(drop=True)
        w = want[wcols].sort_values(wcols).reset_index(drop=True)
        for c in gcols:
            gv, wv = g[c], w[c]
            # The driver's hash is TYPE-sensitive (e.g. DuckDB HUGEINT vs
            # Spark BIGINT fails even with equal values) — mimic that here
            # so the local gate never shows a false green. Integer WIDTHS are
            # equivalent though (driver r1 passed q07 int32-vs-int64).
            def canon(dt):
                s = str(dt)
                return "int64" if s in ("int8", "int16", "int32", "int64") else s
            if canon(gv.dtype) != canon(wv.dtype):
                problems.append(f"col {c} dtype differs: spark={gv.dtype} oracle={wv.dtype}")
                continue
            try:
                import pandas as pd
                if not gv.equals(wv):
                    # tolerate dtype-only differences by value compare
                    neq = (gv.astype(object).where(pd.notnull(gv), None) !=
                           wv.astype(object).where(pd.notnull(wv), None))
                    if neq.any():
                        i = neq[neq].index[0]
                        problems.append(f"col {c} differs at row {i}: spark={gv[i]!r} oracle={wv[i]!r}")
            except Exception as e:
                problems.append(f"col {c}: compare error {e}")
    if problems:
        fail += 1
        print(f"  [FAIL] {name}: " + "; ".join(problems[:3]))
    else:
        ok += 1
        print(f"  [ok]   {name}: {len(got)} rows")
print(f"\n{ok} ok, {fail} fail, {nooracle} rows-only")
sys.exit(1 if fail else 0)
