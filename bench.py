"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line ``{"metric", "value", "unit", "queries", "sf"}``.

- data dir: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
- master:   local[$SPARK_GRAFT_CPUS] (default all cores)
- runs:     $SPARK_GRAFT_BENCH_RUNS timed runs per query (default 1) after a
            JVM/codegen warmup; median reported when runs > 1.

Besides the oracle-checked registry queries, times the bench-only tier
(SURVEY §2.2): approx_count_distinct (B20) and batch sliding/session
windows (B38/B39).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from spark_s3_shuffle_spark.queries.registry import QUERIES
from spark_s3_shuffle_spark.session import get_spark
from spark_s3_shuffle_spark.sources.catalog import load_table


def bench_only_queries():
    """B20/B38/B39: approximate & window ops with no deterministic oracle."""

    def b20_approx_distinct(spark, sf_dir):
        return load_table(spark, sf_dir, "orders").agg(
            F.approx_count_distinct("o_custkey").alias("n")
        )

    def b38_sliding_window(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.groupBy(F.window("event_ts", "10 minutes", "5 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def b39_session_window(spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        return (
            ev.groupBy(F.session_window("event_ts", "5 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    return {
        "b20_approx_count_distinct": b20_approx_distinct,
        "b38_sliding_window": b38_sliding_window,
        "b39_session_window": b39_session_window,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    spark = get_spark("engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    builders = {name: spec.builder for name, spec in QUERIES.items()}
    builders.update(bench_only_queries())

    # warmup: JVM + codegen + parquet footer caches
    builders["q12_tpch_q1_agg"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name, fn in builders.items():
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            samples.append(time.monotonic() - t0)
        timings[name] = round(statistics.median(samples), 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "bench_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
