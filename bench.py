"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line ``{"metric", "value", "unit", "queries", "sf"}``.

- data dir: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
- master:   local[$SPARK_GRAFT_CPUS] (default all cores)
- runs:     $SPARK_GRAFT_BENCH_RUNS timed runs per query (default 3; 5 in
            baseline mode) after a JVM/codegen warmup; the MINIMUM is
            reported (noise-rejecting estimator — see run_suite).

Baseline mode (BASELINE.md protocol — makes the ≤2× gate measurable):

    python bench.py --baseline     # vanilla session, min-of-5, writes
                                   # BASELINE_BENCH.json next to this file

The vanilla session is stock ``SparkSession.builder`` + Kryo + AQE (the
protocol's stated config) with Spark-default shuffle partitions — none of
the engine's session tuning. A subsequent engine run reads
BASELINE_BENCH.json and emits per-query ``ratios`` (engine/baseline) plus
``ratio_max``; the gate is every ratio ≤ 2.

Besides the oracle-checked registry queries, times the bench-only tier
(SURVEY §2.2): approx_count_distinct (B20) and batch sliding/session
windows (B38/B39). Offline preparation steps (the IVF index build for
q34b) run before timing via ``registry.prepare_map`` — index builds are
amortized per corpus version in production and are excluded from per-query
latency, exactly as the reference excludes TPC-DS data generation from its
query timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.queries.registry import QUERIES, prepare_map
from spark_s3_shuffle_spark.session import get_spark
from spark_s3_shuffle_spark.sources.catalog import load_table

BASELINE_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_BENCH.json")


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


def vanilla_spark() -> SparkSession:
    """BASELINE.md baseline runner: stock builder + Kryo + AQE, Spark-default
    shuffle partitions; no engine conf. (The nanos/UTC runtime confs are
    applied by load_table — required to *read* the fixtures at all, and the
    protocol pins AQE on anyway.)"""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    return (
        SparkSession.builder.appName("vanilla-baseline")
        .master(f"local[{cpus}]")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_suite(spark, sf_dir: str, runs: int) -> dict[str, float]:
    builders = {name: spec.builder for name, spec in QUERIES.items()}
    builders.update(bench_only_queries())

    # warmup: JVM + codegen + parquet footer caches
    builders["q12_tpch_q1_agg"](spark, sf_dir).collect()
    # offline/amortized prep (index builds) — outside the timed path
    for prep in prepare_map().values():
        prep(spark, sf_dir)

    timings: dict[str, float] = {}
    for name, fn in builders.items():
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            samples.append(time.monotonic() - t0)
        # min-of-n, not median: the box's cross-run drift swings sub-second
        # queries by 2x+ (a 0.17s baseline sample vs a 0.35s engine sample
        # for the SAME plan measured back-to-back), and the minimum is the
        # standard noise-rejecting estimator for micro-scale timings — it
        # discards GC pauses, codegen compiles, and co-tenant interference
        # that medians still absorb. Applied to BOTH baseline and engine
        # runs, so the ratio stays a fair plan-vs-plan comparison.
        timings[name] = round(min(samples), 4)
    return timings


def main() -> None:
    baseline_mode = "--baseline" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # multi-sample minima on both sides: a single engine sample vs a
    # baseline aggregate would let one GC pause masquerade as a regression
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5" if baseline_mode else "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    spark = vanilla_spark() if baseline_mode else get_spark("engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    timings = run_suite(spark, sf_dir, runs)
    total = round(sum(timings.values()), 4)

    out = {
        "metric": "baseline_total_wall_clock" if baseline_mode else "bench_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    if baseline_mode:
        with open(BASELINE_JSON, "w") as f:
            json.dump({"queries": timings, "sf": sf, "runs": runs, "total": total}, f, indent=1)
    elif os.path.exists(BASELINE_JSON):
        with open(BASELINE_JSON) as f:
            base = json.load(f)
        if base.get("sf") == sf:
            ratios = {
                q: round(t / base["queries"][q], 2)
                for q, t in timings.items()
                if base["queries"].get(q)
            }
            out["ratios"] = ratios
            out["ratio_max"] = max(ratios.values()) if ratios else None
            out["baseline_total"] = base.get("total")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
