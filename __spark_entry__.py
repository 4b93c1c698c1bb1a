"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the engine's declared-query registry
(``spark_s3_shuffle_spark.queries.registry``): one entry per implemented
operator from SURVEY.md §2, each paired with the DuckDB oracle SQL the
driver cross-checks at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_s3_shuffle_spark.queries.registry import oracle_sql_map, query_map
from spark_s3_shuffle_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY §7 M0) on sf0.001."""
    apply_runtime_confs(spark)
    return query_map()["q12_tpch_q1_agg"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    builders = query_map()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in builders.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for hash-specific /
    approximate ops → driver records the weaker rows-only check)."""
    return oracle_sql_map()
