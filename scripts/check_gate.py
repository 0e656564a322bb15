"""Local replica of the driver's correctness gate: runs every
__spark_entry__.queries() entry and its oracle_sql() twin side-by-side,
comparing row count, column names/order-insensitive values.

Usage: python scripts/check_gate.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str, sf: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.sql(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        errs.append(f"row count: spark={len(sdf)} oracle={len(odf)}")
        return errs
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
            b[c].dtype, np.floating
        ):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            bad = ~(np.isclose(av, bv, rtol=0, atol=0) | (np.isnan(av) & np.isnan(bv)))
            exact = bad.sum()
            loose = (~(np.isclose(av, bv, rtol=1e-9, atol=1e-12))).sum()
            if exact:
                tag = "EXACT-mismatch" if loose == 0 else "VALUE-mismatch"
                idx = np.flatnonzero(bad)[:3]
                errs.append(
                    f"col {c}: {exact}/{len(av)} {tag}; e.g. "
                    + "; ".join(f"{av[i]!r} vs {bv[i]!r}" for i in idx)
                )
        else:
            bad = av != bv
            if bad.any():
                idx = np.flatnonzero(bad)[:3]
                errs.append(
                    f"col {c}: {bad.sum()}/{len(av)} mismatches; e.g. "
                    + "; ".join(f"{av[i]!r} vs {bv[i]!r}" for i in idx)
                )
    return errs


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:]
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", sf)

    import __spark_entry__ as e
    from neural_search_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8, app_name="gate-check")
    qs = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if names and not any(s in name for s in names):
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception:
            print(f"[FAIL] {name}: spark query raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            n_rowsonly += 1
            continue
        try:
            odf = run_oracle(oracles[name], sf)
        except Exception as ex:
            print(f"[FAIL] {name}: oracle raised: {str(ex).splitlines()[0][:200]}")
            n_fail += 1
            continue
        errs = compare(name, sdf, odf)
        if errs:
            print(f"[FAIL] {name} ({len(sdf)} rows):")
            for er in errs:
                print("   ", er)
            n_fail += 1
        else:
            print(f"[ok] {name}: {len(sdf)} rows match")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rowsonly} rows-only, {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
