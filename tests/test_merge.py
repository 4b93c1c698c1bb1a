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


def test_guarded_merge_ignores_stale_changes(spark):
    base = spark.createDataFrame([(1, "new", 10), (2, "b", 5)], SCHEMA)
    stale_and_fresh = spark.createDataFrame(
        [(1, "old", 3), (2, "b2", 9)], SCHEMA  # seq 3 < base's 10; 9 > 5
    )
    out = MG.merge_upsert(
        base, stale_and_fresh, ["k"], ["seq"],
        delete_when=F.col("v") == "__del__", guard_out_of_order=True,
    )
    got = {(r["k"], r["v"]) for r in out.collect()}
    assert got == {(1, "new"), (2, "b2")}


def test_guarded_merge_null_version_is_ignored_not_dropped(spark):
    """A NULL order-col makes the guard undecidable: the change (even a
    DELETE) must be conservatively ignored — the base row survives. Without
    the coalesce, the delete filter evaluated NULL and silently dropped it."""
    base = spark.createDataFrame([(1, "keep", 10)], SCHEMA)
    null_delete = spark.createDataFrame([(1, "__del__", None)], SCHEMA)
    out = MG.merge_upsert(
        base, null_delete, ["k"], ["seq"],
        delete_when=F.col("v") == "__del__", guard_out_of_order=True,
    )
    assert [(r["k"], r["v"]) for r in out.collect()] == [(1, "keep")]
    # NULL-versioned UPDATE is likewise ignored
    null_update = spark.createDataFrame([(1, "clobber", None)], SCHEMA)
    out2 = MG.merge_upsert(
        base, null_update, ["k"], ["seq"],
        delete_when=F.col("v") == "__del__", guard_out_of_order=True,
    )
    assert [(r["k"], r["v"]) for r in out2.collect()] == [(1, "keep")]


def test_guarded_merge_validates_order_cols(spark):
    base = spark.createDataFrame([(1, "a", 0)], SCHEMA)
    changes = spark.createDataFrame([(1, "b", 1)], SCHEMA)
    with pytest.raises(ValueError, match="order_cols to be value columns"):
        MG.merge_upsert(
            base, changes, ["k"], ["k"],  # key col as version: invalid
            delete_when=F.lit(False), guard_out_of_order=True,
        )


def test_streaming_foreachbatch_upsert_sink(spark, sf_dir):
    """foreachBatch + guarded merge as a streaming upsert sink: fold each
    micro-batch into a keyed snapshot; the final snapshot must equal the
    batch latest-event-per-user compaction regardless of how events were
    split across micro-batches (the version guard makes batch order
    irrelevant for pure upserts)."""
    import tempfile

    from pyspark.sql import Window
    from spark_s3_shuffle_spark.sources.catalog import load_table
    from spark_s3_shuffle_spark.streaming import ops as S

    tmp = tempfile.mkdtemp(prefix="merge-sink-")
    # events split across 4 files in RANDOM ts order — exactly the
    # out-of-order delivery the guard exists for
    events_drop_dir = tmp
    load_table(spark, sf_dir, "events").drop("event_ts").repartition(4).write.mode(
        "overwrite"
    ).parquet(f"{tmp}/in")
    cols = ["user_id", "event_type", "value", "ts", "event_id"]
    state = {"path": None}

    def sink(batch_df, batch_id):
        batch = batch_df.select(*cols)
        if state["path"] is None:
            nxt = MG.latest_per_key(batch, ["user_id"], ["ts", "event_id"])
        else:
            base = spark.read.parquet(state["path"])
            nxt = MG.merge_upsert(
                base, batch, ["user_id"], ["ts", "event_id"],
                delete_when=F.lit(False), guard_out_of_order=True,
            )
        out = f"{tmp}/v{batch_id}"
        nxt.write.mode("overwrite").parquet(out)
        state["path"] = out

    stream = S.read_events_stream(spark, f"{events_drop_dir}/in", max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    assert state["path"] is not None

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    expected = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type", "value")
    )
    got = spark.read.parquet(state["path"]).select("user_id", "event_type", "value")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
