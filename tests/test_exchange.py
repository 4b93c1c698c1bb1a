"""Materialized-exchange tests (SURVEY §4.3): write/read barrier semantics,
prefix-sharded layout, stats, cleanup — the engine-feature analogue of the
reference's S3 shuffle lifecycle (S3ShuffleDispatcher.scala:104-118,142-143)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.operators.exchange import ExchangeManager


@pytest.fixture()
def mgr(spark):
    with tempfile.TemporaryDirectory(prefix="exchange-scratch-") as tmp:
        yield ExchangeManager(spark, f"file://{tmp}", prefixes=4)


def test_write_read_roundtrip(spark, mgr):
    df = spark.range(1000).withColumn("k", F.col("id") % 13)
    stats = mgr.stage_write(df, "stage1", keys=["k"], num_partitions=6)
    assert stats.bytes_written > 0
    assert stats.num_files >= 1
    back = mgr.stage_read("stage1")
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 999 * 1000 // 2
    # barrier property: the read is co-partitioned on k with 6 files max
    assert back.select("k").distinct().count() == 13


def test_prefix_sharding_layout(spark, mgr):
    df = spark.range(10)
    mgr.stage_write(df, "stageA")
    path = mgr.stage_path("stageA")
    # layout: {root}/p{shard}/{appId}/{stage}
    parts = path.split(os.sep)
    assert parts[-1] == "stageA"
    assert parts[-2] == mgr.app_id
    assert parts[-3].startswith("p") and int(parts[-3][1:]) < 4


def test_sorted_within_partitions(spark, mgr):
    df = spark.range(500).withColumn("k", F.col("id") % 5)
    mgr.stage_write(df, "sorted", keys=["k"], num_partitions=3, sort_within=["id"])
    back = mgr.stage_read("sorted")
    assert back.count() == 500


def test_cleanup(spark, mgr):
    df = spark.range(100)
    mgr.stage_write(df, "gone", num_partitions=2)
    assert mgr.remove_stage("gone")
    with pytest.raises(Exception):
        mgr.stage_read("gone").count()
    mgr.stage_write(df, "a", num_partitions=1)
    mgr.stage_write(df, "b", num_partitions=1)
    assert mgr.remove_all() >= 1
    assert mgr.stats == {}


def test_metering(spark, mgr):
    df = spark.range(10_000).withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    st = mgr.stage_write(df, "metered", num_partitions=4)
    assert st.write_secs > 0
    assert st.mib_per_sec() > 0
    assert mgr.stats["metered"] is st
