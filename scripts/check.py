#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: check.py SFDIR OUTDIR [query ...]

Reads OUTDIR/<name>/ parquet (written by graft.Verify), runs
OUTDIR/oracle_sql.json in DuckDB against SFDIR's tables, sorts columns by
name and rows by all columns, and compares values exactly.
"""
import sys, json, glob, math
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp(name, spark_df, oracle_df):
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            av = av.astype(float).fillna(math.nan)
            bv = bv.astype(float).fillna(math.nan)
            # Sign-aware: the driver hashes FORMATTED values, so -0.0 != 0.0
            # even though they compare numerically equal.
            same_sign = np.signbit(av.to_numpy()) == np.signbit(bv.to_numpy())
            neq = ~(((av == bv) & same_sign) | (av.isna() & bv.isna()))
        else:
            av = av.astype(str); bv = bv.astype(str)
            neq = av != bv
        if neq.any():
            i = neq.idxmax()
            return (f"VALUE col={c} row={i} spark={a[c][i]!r} oracle={b[c][i]!r} "
                    f"(n_mismatch={int(neq.sum())})")
    return None

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        try:
            spark_df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); fail += 1; continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {str(e)[:200]}"); fail += 1; continue
        err = cmp(name, spark_df, oracle_df)
        if err:
            print(f"FAIL {name}: {err}"); fail += 1
        else:
            print(f"ok   {name} ({len(oracle_df)} rows)"); ok += 1
    print(f"== {ok} ok, {fail} fail ==")
    sys.exit(1 if fail else 0)

main()
