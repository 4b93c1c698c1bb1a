"""Local correctness harness mirroring the driver's t2 gate.

Runs every registry query through Spark AND its DuckDB oracle on the same
parquet fixtures, then compares row count, column names, and values
(columns sorted by name, rows sorted, floats rounded-as-declared).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from spark_s3_shuffle_spark.queries.registry import QUERIES
from spark_s3_shuffle_spark.session import get_spark
from spark_s3_shuffle_spark.sources.catalog import TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 6)
    if isinstance(value, (list, tuple)):
        return tuple(canon(v) for v in value)
    return value


def rows_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # repr-keyed sort: mixed None/str columns (ROLLUP/CUBE null groups) are
    # not orderable directly; any deterministic total order works since both
    # sides sort identically before comparison.
    return sorted((tuple(canon(r[i]) for i in order) for r in rows), key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    con = duck_connection(sf_dir)
    failures = []
    ran = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = spec.builder(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, f"columns {scols} vs {dcols}"))
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        sc, dc = rows_canon(scols, srows), rows_canon(dcols, drows)
        if sc != dc:
            diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            failures.append((name, f"values differ, first diffs: {diff}"))
            print(f"FAIL {name}: values differ; first diffs: {diff}")
            continue
        print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{ran - len(failures)}/{ran} pass")
    if failures:
        print("FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
