"""Simulate the driver's correctness gate: run each queries() entry on Spark
and its oracle_sql() on DuckDB at the given sf, compare row count + sorted
column names + order-insensitive values. Usage:
    python tools/check_oracles.py [sf_dir] [name ...]
"""

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from rust_chunking_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v))
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(sdf)} rows "
                  f"({'OK' if len(sdf) >= 0 else '??'})")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWS {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            status.append(f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not status:
            a, b = normalize(sdf), normalize(odf)
            if not a.equals(b):
                diff = (a != b)
                bad_cols = [c for c in a.columns if diff[c].any()]
                i = diff.any(axis=1).idxmax()
                status.append(f"VALUES differ cols={bad_cols} "
                              f"first@{i}: {a.iloc[i].to_dict()} vs {b.iloc[i].to_dict()}")
        if status:
            failures.append(name)
            print(f"{name:28s} FAIL: {'; '.join(status)[:400]}")
        else:
            print(f"{name:28s} OK ({len(sdf)} rows)")
    print()
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
