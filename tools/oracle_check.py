#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>

Reads oracle_sql.json from the Verify output dir, runs each SQL in DuckDB
against the sf parquet tables, loads the matching Spark parquet result, and
compares (columns sorted by name, rows sorted by all columns, exact values).
NOT part of the shipped library — harness tooling only.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, exp: pd.DataFrame, got: pd.DataFrame) -> str:
    if sorted(exp.columns) != sorted(got.columns):
        return f"COLS expected={sorted(exp.columns)} got={sorted(got.columns)}"
    if len(exp) != len(got):
        return f"ROWS expected={len(exp)} got={len(got)}"
    exp, got = canon(exp), canon(got)
    # Dtype-strict: the driver's hash is dtype-sensitive (DuckDB HUGEINT
    # surfaces as float64 while Spark emits int64 — equal values, different
    # hash). Flag any int-vs-float mismatch instead of float-casting it away.
    for c in exp.columns:
        e_f = pd.api.types.is_float_dtype(exp[c])
        g_f = pd.api.types.is_float_dtype(got[c])
        if e_f != g_f:
            return (f"DTYPE col {c}: oracle={exp[c].dtype} spark={got[c].dtype}"
                    " (driver hash will mismatch; CAST the oracle)")
    for c in exp.columns:
        e, g = exp[c], got[c]
        if pd.api.types.is_float_dtype(e) or pd.api.types.is_float_dtype(g):
            ef = e.astype(float).to_numpy()
            gf = g.astype(float).to_numpy()
            exact = all((a == b) or (math.isnan(a) and math.isnan(b))
                        for a, b in zip(ef, gf))
            if not exact:
                diffs = [abs(a - b) for a, b in zip(ef, gf)
                         if not (a == b or (math.isnan(a) and math.isnan(b)))]
                return (f"FLOAT col {c}: {len(diffs)} diffs, "
                        f"max={max(diffs):.3e}")
        else:
            es = e.astype(str).to_numpy()
            gs = g.astype(str).to_numpy()
            bad = [(a, b) for a, b in zip(es, gs) if a != b]
            if bad:
                return f"VAL col {c}: {len(bad)} diffs, first={bad[0]}"
    return "OK"


def main() -> None:
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    names = sorted(set(oracle) | {
        os.path.basename(d) for d in glob.glob(f"{outdir}/*")
        if os.path.isdir(d)})
    for name in names:
        res_dir = f"{outdir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"  {name:28s} MISSING spark result")
            continue
        got = pd.read_parquet(res_dir)
        if name not in oracle:
            print(f"  {name:28s} rows-only ({len(got)} rows)")
            n_ok += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"  {name:28s} ORACLE SQL ERROR: {exc}")
            continue
        verdict = compare(name, exp, got)
        print(f"  {name:28s} {verdict}")
        if verdict == "OK":
            n_ok += 1
    print(f"{n_ok}/{len(names)} OK")
    if n_ok != len(names):
        sys.exit(1)


if __name__ == "__main__":
    main()
