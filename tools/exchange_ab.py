"""A/B harness: in-memory shuffle vs materialized (object-store) exchange —
the engine's mirror of the reference's benchmark loops, which A/B local-disk
shuffle against NFS/S3 shuffle per query (reference:
examples/run_benchmarks.sh:15-53).

Pipeline under test (a TPC-DS-ish two-stage shape):
  stage 1: lineitem ⋈ orders on orderkey        (fact⋈fact shuffle)
  stage 2: group by (year, suppkey), sum revenue (aggregation shuffle)

A) direct: one Catalyst plan, exchanges stay on local shuffle storage.
B) barrier: stage 1 is materialized through ExchangeManager (hash-
   partitioned parquet on the scratch root), stage 2 reads it back — the
   write-once/read-many S3 barrier that lets the cluster re-size between
   stages. The barrier's cost (write + read) is the price of elasticity;
   this harness measures exactly that delta, plus the exchange's own
   MiB/s metering both directions.

Usage: python tools/exchange_ab.py [sf_dir] [scratch_root]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_s3_shuffle_spark.operators.exchange import ExchangeManager
from spark_s3_shuffle_spark.session import get_spark
from spark_s3_shuffle_spark.sources.catalog import load_table


def stage1(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.year("o_orderdate").alias("y"),
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amt"),
    )


def stage2(df):
    return df.groupBy("y", "l_suppkey").agg(F.round(F.sum("amt"), 2).alias("rev"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scratch = sys.argv[2] if len(sys.argv) > 2 else f"file://{tempfile.mkdtemp(prefix='exchange-ab-')}"
    spark = get_spark("exchange-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup
    stage2(stage1(spark, sf_dir)).collect()

    t0 = time.monotonic()
    n_direct = stage2(stage1(spark, sf_dir)).count()
    direct_secs = time.monotonic() - t0

    mgr = ExchangeManager(spark, scratch, prefixes=8)
    t0 = time.monotonic()
    wstats = mgr.stage_write(stage1(spark, sf_dir), "join_out", keys=["y", "l_suppkey"])
    n_barrier = stage2(mgr.stage_read("join_out")).count()
    barrier_secs = time.monotonic() - t0
    st = mgr.stats["join_out"]
    result = {
        "sf_dir": sf_dir,
        "rows": n_direct,
        "rows_match": n_direct == n_barrier,
        "direct_secs": round(direct_secs, 3),
        "barrier_secs": round(barrier_secs, 3),
        "barrier_overhead_x": round(barrier_secs / direct_secs, 2),
        "exchange_bytes": st.bytes_written,
        "exchange_files": st.num_files,
        "write_mib_s": round(wstats.mib_per_sec(), 1),
        "read_mib_s": round(st.read_mib_per_sec(), 1),
    }
    mgr.remove_all()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
