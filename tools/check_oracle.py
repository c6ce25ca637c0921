"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count + column names + order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bento_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            df[c] = col.round(6)
        elif col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("int64")
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    except Exception:
        df = df.reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.6f").encode()
    return hashlib.md5(payload).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not silently filter everything out and print
        # 'ALL OK' having checked nothing
        print(f"FAIL  unknown query name(s): {sorted(unknown)} (known: {sorted(qs)})")
        return 2
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            ok = len(sdf) >= 0
            print(f"rows-only  {name}: rows={len(sdf)} cols={sorted(sdf.columns)} ({dt:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        elif canon(sdf) != canon(odf):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
            if "value-hash mismatch" in problems[-1] and len(sdf) == len(odf):
                s = sdf[sorted(sdf.columns)].sort_values(by=sorted(sdf.columns)).reset_index(drop=True)
                o = odf[sorted(odf.columns)].sort_values(by=sorted(odf.columns)).reset_index(drop=True)
                for c in s.columns:
                    sc, oc = s[c], o[c]
                    try:
                        if sc.dtype.kind == "f" or oc.dtype.kind == "f":
                            neq = ~((sc - oc).abs() < 1e-5) & ~(sc.isna() & oc.isna())
                        else:
                            neq = sc.astype(str) != oc.astype(str)
                        if neq.any():
                            i = neq.idxmax()
                            print(f"    first diff col={c} row={i}: spark={sc[i]!r} oracle={oc[i]!r} "
                                  f"(dtypes {sc.dtype}/{oc.dtype}, {int(neq.sum())} diffs)")
                    except Exception as e:
                        print(f"    col={c}: compare error {e} (dtypes {sc.dtype}/{oc.dtype})")
            n_fail += 1
        else:
            print(f"OK    {name}: rows={len(sdf)} ({dt:.1f}s)")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
