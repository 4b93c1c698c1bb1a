"""Python DataSource (manifest_parquet) + transformWithState tests: the
Spark-4-native source/stateful seams. Shard pruning is asserted both at
the reader level (partitions() shrinks) and end-to-end (results match the
plain-parquet union under pushed filters)."""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_s3_shuffle_spark.sources import pydatasource as PDS
from spark_s3_shuffle_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def sharded(spark, sf_dir):
    """Three orders shards with DISJOINT o_orderkey ranges + a manifest."""
    tmp = tempfile.mkdtemp(prefix="manifest-src-")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # cut points from the data itself (fixture key ranges vary by sf)
    q1, q2 = orders.approxQuantile("o_orderkey", [0.33, 0.66], 0.01)
    cuts = [0, int(q1), int(q2), 10**18]
    paths = []
    for i in range(3):
        p = f"{tmp}/shard-{i}.parquet"
        (
            orders.filter(
                (F.col("o_orderkey") >= cuts[i]) & (F.col("o_orderkey") < cuts[i + 1])
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(p)
        )
        # single data file per shard dir
        part = [f for f in os.listdir(p) if f.startswith("part-")][0]
        paths.append(f"{p}/{part}")
    manifest = f"{tmp}/manifest.jsonl"
    PDS.write_manifest(paths, ["o_orderkey"], manifest)
    PDS.register(spark)
    return {"manifest": manifest, "orders": orders, "tmp": tmp, "cut": cuts[2]}


def test_full_read_matches_union(spark, sharded):
    got = (
        spark.read.format(PDS.FORMAT_NAME)
        .option("manifest", sharded["manifest"])
        .load()
    )
    assert got.count() == sharded["orders"].count()
    assert set(got.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}


def test_filtered_read_matches_and_prunes(spark, sharded):
    got = (
        spark.read.format(PDS.FORMAT_NAME)
        .option("manifest", sharded["manifest"])
        .load()
        .filter(F.col("o_orderkey") > sharded["cut"])
    )
    expected = sharded["orders"].filter(F.col("o_orderkey") > sharded["cut"])
    assert got.count() == expected.count()
    assert (
        got.agg(F.sum("o_orderkey")).first()[0]
        == expected.agg(F.sum("o_orderkey")).first()[0]
    )


def test_reader_prunes_shards_from_manifest_stats(sharded):
    reader = PDS.ManifestParquetReader(None, {"manifest": sharded["manifest"]})
    assert len(reader.partitions()) == 3
    reader.pushFilters([GreaterThan(("o_orderkey",), sharded["cut"])])
    assert len(reader.partitions()) == 1  # only the top-range shard survives
    reader2 = PDS.ManifestParquetReader(None, {"manifest": sharded["manifest"]})
    returned = list(reader2.pushFilters([EqualTo(("o_orderkey",), 5)]))
    assert len(returned) == 1  # every filter handed back: Spark re-applies
    assert len(reader2.partitions()) == 1


def test_transform_with_state_running_totals(spark, sf_dir):
    pytest.importorskip("pyspark.sql.streaming.stateful_processor")
    # the transformWithState runner speaks protobuf to the JVM; without a
    # working google.protobuf the driver worker crashes at init
    pytest.importorskip("google.protobuf.descriptor")
    from spark_s3_shuffle_spark.streaming import ops as S
    from spark_s3_shuffle_spark.streaming import stateful as ST

    tmp = tempfile.mkdtemp(prefix="tws-")
    ev = load_table(spark, sf_dir, "events").drop("event_ts")
    ev.repartition(4).write.mode("overwrite").parquet(f"{tmp}/in")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = S.read_events_stream(spark, f"{tmp}/in")
        totals = ST.running_totals_tws(stream)
        q = (
            totals.writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        if q.isActive:
            q.stop()
        got = (
            spark.table("tws_totals")
            .groupBy("user_id")
            .agg(F.max("events").alias("events"))
        )
        batch = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("events"))
        g = {r["user_id"]: r["events"] for r in got.collect()}
        b = {r["user_id"]: r["events"] for r in batch.collect()}
        assert g == b
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_bloom_filter_membership_and_fpp():
    """Pure bloom math: every inserted key hits; absent keys false-positive
    at roughly the configured rate (1% — allow generous slack)."""
    keys = list(range(0, 5000, 5))
    bloom = PDS._bloom_build(keys, fpp=0.01)
    assert all(PDS._bloom_may_contain(bloom, k) for k in keys)
    absent = [k for k in range(1, 50000, 7) if k % 5 != 0]
    fp = sum(PDS._bloom_may_contain(bloom, k) for k in absent) / len(absent)
    assert fp < 0.05, fp
    # integral floats collapse onto ints (Spark may widen pushed literals)
    assert PDS._bloom_may_contain(bloom, 10.0) and PDS._bloom_may_contain(bloom, 10)


def test_bloom_rejects_uncanonical_types_and_never_misprunes():
    """Types with no canonical writer/probe encoding (Decimal, date) are
    REJECTED at build time — a repr-based fallback could silently prune a
    shard containing matches — and an un-encodable probe literal degrades
    to 'may contain' (no pruning) instead of a false negative."""
    import datetime
    from decimal import Decimal

    with pytest.raises(TypeError, match="no canonical"):
        PDS._bloom_build([Decimal("123.450")])
    with pytest.raises(TypeError, match="no canonical"):
        PDS._bloom_build([datetime.date(2024, 1, 1)])
    bloom = PDS._bloom_build(range(100))
    assert PDS._bloom_may_contain(bloom, Decimal("7"))  # degrade, don't prune


@pytest.fixture(scope="module")
def hash_sharded(spark, sf_dir):
    """Eight orders shards HASHED on o_custkey (every shard spans ~the full
    o_orderkey range) + a manifest carrying zone maps AND bloom filters."""
    tmp = tempfile.mkdtemp(prefix="bloom-src-")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    paths = []
    for i in range(8):
        p = f"{tmp}/shard-{i}.parquet"
        orders.filter(F.col("o_custkey") % 8 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        part = [f for f in os.listdir(p) if f.startswith("part-")][0]
        paths.append(f"{p}/{part}")
    manifest = f"{tmp}/manifest.jsonl"
    PDS.write_manifest(paths, ["o_orderkey"], manifest, bloom_cols=["o_orderkey"])
    PDS.register(spark)
    return {"manifest": manifest, "orders": orders}


def test_bloom_prunes_hash_layout_where_zone_maps_cannot(spark, hash_sharded):
    """The skipping claim itself: a point lookup on the hash layout must
    open strictly fewer shards than exist (zone maps alone keep all 8)."""
    from pyspark.sql.datasource import In

    key = 1111  # exists at every fixture SF
    reader = PDS.ManifestParquetReader(None, {"manifest": hash_sharded["manifest"]})
    assert len(reader.partitions()) == 8
    reader.pushFilters([EqualTo(("o_orderkey",), key)])
    surviving = len(reader.partitions())
    assert 1 <= surviving <= 2, surviving  # the owner shard + <=1 false positive

    reader2 = PDS.ManifestParquetReader(None, {"manifest": hash_sharded["manifest"]})
    reader2.pushFilters([In(("o_orderkey",), (11, 222, 1111))])
    assert len(reader2.partitions()) <= 4

    # end-to-end through Spark: result equals the plain table lookup
    got = (
        spark.read.format(PDS.FORMAT_NAME)
        .option("manifest", hash_sharded["manifest"])
        .load()
        .filter(F.col("o_orderkey") == key)
        .collect()
    )
    expected = hash_sharded["orders"].filter(F.col("o_orderkey") == key).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
