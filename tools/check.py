#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against views named
after the fixture tables. Sorts columns by name and rows by all columns,
then compares values. Driver-side python (duckdb/pandas) is fine here —
this script is a dev tool, not part of the engine.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = sorted(d for d in os.listdir(outdir)
                     if os.path.isdir(os.path.join(outdir, d)))
    for name in results:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(spark_df)} rows)")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        ok = True
        for c in s.columns:
            a, b = s[c].values, d[c].values
            # normalize NULL representations (None vs NaN) across engines
            an = pd.isna(pd.Series(a)).values
            bn = pd.isna(pd.Series(b)).values
            if an.any() or bn.any():
                if not np.array_equal(an, bn):
                    print(f"  col {c}: null-mask mismatch"); ok = False; continue
                a, b = a[~an], b[~bn]
                if len(a) == 0:
                    continue
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = np.array_equal(a.astype('float64'), b.astype('float64'))
                close = np.allclose(a.astype('float64'), b.astype('float64'),
                                    rtol=1e-12, atol=1e-12, equal_nan=True)
                if not eq:
                    tag = "(close but not bit-equal!)" if close else "(DIVERGENT)"
                    print(f"  col {c}: float mismatch {tag}")
                    if not close:
                        idx = np.where(~np.isclose(a.astype('float64'),
                                                   b.astype('float64'), equal_nan=True))[0][:5]
                        for i in idx:
                            print(f"    row {i}: spark={a[i]!r} duck={b[i]!r}")
                    ok = False
            else:
                if not (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all():
                    mism = np.where(pd.Series(a).astype(str).values
                                    != pd.Series(b).astype(str).values)[0][:5]
                    print(f"  col {c}: value mismatch at rows {mism}")
                    for i in mism:
                        print(f"    row {i}: spark={a[i]!r} duck={b[i]!r}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(results) - n_pass - n_fail} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
