"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet tables,
compare row count + schema + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)].copy()

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm(x) for x in v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return v

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from parquet_go_spark.session import get_spark

    spark = get_spark(cores="8", app_name="correctness", driver_memory="8g",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows={len(spdf)} (rows-only, no oracle)")
            if len(spdf) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if len(spdf) != len(odf):
            print(f"FAIL  {name}: rows {len(spdf)} vs {len(odf)}")
            ok = False
        elif sorted(spdf.columns) != sorted(odf.columns):
            print(
                f"FAIL  {name}: cols {sorted(spdf.columns)} vs {sorted(odf.columns)}"
            )
            ok = False
        else:
            a, b = canon(spdf), canon(odf)
            if a != b:
                bad = next(
                    (i for i, (x, y) in enumerate(zip(a, b)) if x != y), None
                )
                print(f"FAIL  {name}: value mismatch at sorted row {bad}")
                if bad is not None:
                    print(f"      spark : {a[bad]}")
                    print(f"      oracle: {b[bad]}")
                ok = False
        if ok:
            print(f"ok    {name}: rows={len(spdf)}")
        else:
            failures.append(name)
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
