"""MERGE upsert/delete semantics on synthetic micro-frames, and the
matview navigate/refresh contracts (registry q114/q115 prove the same
operators under full DuckDB oracles; these pin the edge cases)."""

import pytest
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.operators import matview as MV
from spark_s3_shuffle_spark.operators import merge as MG

SCHEMA = "k long, v string, seq long"


def test_merge_insert_update_delete(spark):
    base = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)], SCHEMA
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 1),          # update
            (4, "d", 1),           # insert
            (3, "__del__", 1),     # delete
            (5, "__del__", 1),     # delete of a key base never had
        ],
        SCHEMA,
    )
    out = MG.merge_upsert(
        base, changes, ["k"], ["seq"], delete_when=F.col("v") == "__del__"
    )
    got = {(r["k"], r["v"]) for r in out.collect()}
    assert got == {(1, "a"), (2, "b2"), (4, "d")}


def test_merge_latest_change_wins(spark):
    base = spark.createDataFrame([(1, "a", 0)], SCHEMA)
    changes = spark.createDataFrame(
        [(1, "x", 1), (1, "__del__", 2), (1, "y", 3)], SCHEMA
    )
    out = MG.merge_upsert(
        base, changes, ["k"], ["seq"], delete_when=F.col("v") == "__del__"
    )
    assert [(r["k"], r["v"]) for r in out.collect()] == [(1, "y")]
    # ... and when the LAST change is the delete, the key is gone
    changes2 = spark.createDataFrame([(1, "x", 1), (1, "__del__", 2)], SCHEMA)
    out2 = MG.merge_upsert(
        base, changes2, ["k"], ["seq"], delete_when=F.col("v") == "__del__"
    )
    assert out2.count() == 0


def test_navigate_rejects_non_grain_keys(spark, sf_dir):
    from spark_s3_shuffle_spark.sources.catalog import load_table

    summary = MV.build_lineitem_summary(load_table(spark, sf_dir, "lineitem").limit(100))
    with pytest.raises(ValueError, match="not in summary grain"):
        MV.navigate(summary, ["l_orderkey"])
