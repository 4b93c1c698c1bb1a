"""Z-order layout tests: Morton key correctness, and the property the
layout exists for — a manifest over Z-ordered shards prunes on BOTH
predicate dimensions, where a single-column-sorted layout prunes on one.
"""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import LessThanOrEqual

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_s3_shuffle_spark.operators import layout as L
from spark_s3_shuffle_spark.sources import pydatasource as PDS
from spark_s3_shuffle_spark.sources.catalog import load_table


def test_zorder_key_interleaves_bits(spark):
    # interleave(a, b): bit i of a -> 2i, bit i of b -> 2i+1
    rows = spark.range(1).select(
        L.zorder_key(F.lit(0b101), F.lit(0b011), bits=3).alias("z"),
        L.zorder_key(F.lit(0), F.lit(0), bits=3).alias("zero"),
        L.zorder_key(F.lit(7), F.lit(0), bits=3).alias("a_only"),
        L.zorder_key(F.lit(0), F.lit(7), bits=3).alias("b_only"),
    ).first()
    # a=101, b=011 -> z bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 0b011011
    assert rows["z"] == 0b011011
    assert rows["zero"] == 0
    assert rows["a_only"] == 0b010101
    assert rows["b_only"] == 0b101010


def test_zorder_locality_beats_single_sort_on_second_dim(spark):
    """A 2-D box predicate must prune shards under the Z-layout; under an
    a-sorted layout the b-predicate prunes nothing (every shard spans the
    full b range)."""
    n, shards = 4096, 16
    df = spark.range(n).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    zk = L.zorder_key(F.col("a"), F.col("b"), bits=6)

    with tempfile.TemporaryDirectory(prefix="zorder-") as tmp:
        man_z = L.write_zorder_layout(df, zk, ["a", "b"], f"{tmp}/z", num_shards=shards)
        man_a = L.write_zorder_layout(
            df, F.col("a").cast("long"), ["a", "b"], f"{tmp}/a", num_shards=shards
        )

        def surviving(manifest, filters):
            r = PDS.ManifestParquetReader(schema=None, options={"manifest": manifest})
            r._filters = filters
            return len(r.partitions())

        box = [LessThanOrEqual(("a",), 15), LessThanOrEqual(("b",), 15)]
        z_surv = surviving(man_z, box)
        a_surv = surviving(man_a, box)
        # a-sorted layout: the a<=15 predicate keeps ~1/4 of shards, but b
        # spans [0,64) in every one of them - the b predicate is useless.
        # Z-layout: the box is one corner of the curve; both dims prune.
        assert z_surv < a_surv
        assert z_surv <= shards // 4

        # pruning must never change results
        PDS.register(spark)
        for man in (man_z, man_a):
            got = (
                spark.read.format(PDS.FORMAT_NAME)
                .option("manifest", man)
                .load()
                .filter((F.col("a") <= 15) & (F.col("b") <= 15))
                .count()
            )
            assert got == df.filter((F.col("a") <= 15) & (F.col("b") <= 15)).count()


def test_quantize_clamps_and_grids(spark):
    r = spark.range(1).select(
        L.quantize(F.lit(-5.0), 0, 100, bits=8).alias("lo"),
        L.quantize(F.lit(500.0), 0, 100, bits=8).alias("hi"),
        L.quantize(F.lit(50.0), 0, 100, bits=8).alias("mid"),
    ).first()
    assert r["lo"] == 0 and r["hi"] == 255
    assert 120 <= r["mid"] <= 135


def test_orders_zorder_query_matches_plain_read(spark, sf_dir):
    from spark_s3_shuffle_spark.queries.registry import get_orders_zorder_manifest

    man = get_orders_zorder_manifest(spark, sf_dir)
    via_manifest = (
        spark.read.format(PDS.FORMAT_NAME)
        .option("manifest", man)
        .load()
        .filter(F.col("o_custkey") <= 50)
        .count()
    )
    plain = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50).count()
    assert via_manifest == plain
