#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: run each oracle SQL in
DuckDB against the same sf dir and compare to the Verify parquet dumps.

Two comparison levels per query:
  - tolerant (the historical check): sorted columns/rows, atol 1e-9;
  - STRICT (replicates the driver's bit-exact per-value hash): dtype KINDS
    must match (int64 `1` vs float64 `1.0` is a FAIL — DuckDB SUM over
    integers returns HUGEINT which pandas widens to float64) and float
    values must be byte-identical (so `-0.0` vs `+0.0` and one-ulp ROUND
    divergences FAIL). The round-11 lesson: 15 queries passed the tolerant
    check and failed the driver's hash on exactly these two signatures.

A query line reads `OK` only when BOTH levels pass; `STRICT-DIFF` lines
show the first offending column with spark/duck reprs. Strict failures
count toward the exit code (close.sh gates on `FAILURES: 0`).
Usage: check_oracle.py <sfdir> <verify_outdir>"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def strict_diff(a, b):
    """First strict mismatch between canon frames, or None.
    Checks dtype kind per column, then byte-exact values (floats via
    bit pattern so -0.0 != +0.0 and NaN == NaN)."""
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        ak, bk = a[c].dtype.kind, b[c].dtype.kind
        if ak != bk:
            return f"{c}: dtype kind {a[c].dtype} vs {b[c].dtype}"
        if ak == "f":
            neq = av.view(np.uint64) != bv.view(np.uint64)
        else:
            neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
        if neq.any():
            i = int(np.where(neq)[0][0])
            return f"{c}: n={int(neq.sum())} spark={av[i]!r} duck={bv[i]!r}"
    return None

fail = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    spark_df = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)" + (" EMPTY!" if len(spark_df)==0 else ""))
        if len(spark_df) == 0: fail += 1
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fail += 1; continue
    a, b = canon(spark_df.copy()), canon(duck_df.copy())
    if list(a.columns) != list(b.columns):
        print(f"{name}: COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}"); fail += 1; continue
    if len(a) != len(b):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"); fail += 1; continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
    except AssertionError as e:
        print(f"{name}: VALUE MISMATCH: {str(e).splitlines()[-1][:200]}"); fail += 1; continue
    sd = strict_diff(a, b)
    if sd is not None:
        print(f"{name}: STRICT-DIFF {sd}"); fail += 1; continue
    print(f"{name}: OK ({len(a)} rows)")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
