"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares:
  - row count
  - column names (sorted)
  - order-insensitive value hash (columns sorted by name, rows sorted,
    floats rounded to 9 significant-ish decimals before hashing)
plus a tolerance-based float comparison so we can distinguish "hash
brittleness" from "actually wrong values".

Usage: python tools/check_oracles.py [query_name ...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

DEFAULT_SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.map(lambda x: "∅NULL" if pd.isna(x) else str(x))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    payload = df.to_csv(index=False, float_format="%.6f", na_rep="∅NULL").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if value_hash(a) != value_hash(b):
        # find the offending columns with tolerance
        if len(a) == len(b):
            for c in a.columns:
                col_a, col_b = a[c], b[c]
                if pd.api.types.is_float_dtype(col_a) and pd.api.types.is_float_dtype(col_b):
                    va, vb = col_a.to_numpy(), col_b.to_numpy()
                    diff = np.abs(va - vb)
                    both_nan = np.isnan(va) & np.isnan(vb)
                    bad = np.sum(~((diff <= 1e-6) | both_nan))
                    if bad:
                        i = int(np.argmax(~(diff <= 1e-6)))
                        problems.append(
                            f"col {c}: {bad} rows differ >1e-6 "
                            f"(e.g. row {i}: {col_a.iloc[i]} vs {col_b.iloc[i]})"
                        )
                else:
                    neq = (col_a.astype(str) != col_b.astype(str))
                    if neq.any():
                        i = int(np.argmax(neq.to_numpy()))
                        problems.append(
                            f"col {c}: {int(neq.sum())} rows differ "
                            f"(e.g. row {i}: {col_a.iloc[i]!r} vs {col_b.iloc[i]!r})"
                        )
            if not problems:
                problems.append("hash mismatch but values within tolerance "
                                "(row-order canonicalization issue?)")
        else:
            problems.append("hash mismatch (and row counts differ)")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=DEFAULT_SF)
    args = ap.parse_args()

    import __spark_entry__ as ent
    from mqtt_influx_storage_service_spark.session import get_spark

    qs, oracles = ent.queries(), ent.oracle_sql()
    names = args.names or sorted(qs)

    spark = get_spark("check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        if name not in qs:
            print(f"?? {name}: not in queries()")
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(spark_pdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} failed "
          f"of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
