#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's oracle SQL in
DuckDB over the same parquet tables and compare with the Spark outputs
(columns sorted by name, rows sorted, exact value equality)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify-out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))]) \
        if glob.glob(f"{d}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        results[name] = f"rows-only: {len(spark_df)} rows"
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {e}"
        continue
    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        results[name] = f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        continue
    if len(a) != len(b):
        results[name] = f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
        continue
    bad = []
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == 'f' or b[c].dtype.kind == 'f':
            import numpy as np
            av = av.astype(float); bv = bv.astype(float)
            neq = ~np.isclose(av, bv, rtol=0, atol=0, equal_nan=True)
            nexact = int(neq.sum())
            if nexact:
                close = np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
                nclose = int((~close).sum())
                bad.append(f"{c}: {nexact} not bit-equal ({nclose} beyond 1e-9; "
                           f"max diff {abs(av-bv).max():.2e})")
        else:
            neq = (pd.Series(av).astype(str) != pd.Series(bv).astype(str))
            if neq.any():
                i = int(neq.idxmax())
                bad.append(f"{c}: {int(neq.sum())} diffs e.g. row {i}: {av[i]!r} vs {bv[i]!r}")
    results[name] = "OK" if not bad else "VALUE MISMATCH: " + "; ".join(bad)

w = max(len(k) for k in results)
nok = 0
for k, v in sorted(results.items()):
    print(f"{k:<{w}}  {v}")
    if v == "OK" or v.startswith("rows-only"):
        nok += 1
print(f"\n{nok}/{len(results)} clean")
