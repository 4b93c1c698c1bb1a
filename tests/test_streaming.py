"""Streaming smoke tests (SURVEY §5.2 t1): file source over events-schema
parquet, watermark + tumbling counts, stateful dedup, checkpointed parquet
sink — then batch-read the sink and check counts (FIXTURES §5)."""

import tempfile

import pytest
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.sources.catalog import load_table
from spark_s3_shuffle_spark.streaming import ops as S


@pytest.fixture(scope="module")
def events_drop_dir(spark, sf_dir):
    """Copy the events fixture into a drop dir as the stream input."""
    tmp = tempfile.mkdtemp(prefix="events-drops-")
    ev = load_table(spark, sf_dir, "events").drop("event_ts")
    ev.repartition(4).write.mode("overwrite").parquet(f"{tmp}/in")
    return tmp


def test_tumbling_stream_matches_batch(spark, sf_dir, events_drop_dir):
    out = f"{events_drop_dir}/out1"
    ckpt = f"{events_drop_dir}/ckpt1"
    stream = S.read_events_stream(spark, f"{events_drop_dir}/in")
    agg = S.tumbling_counts(S.with_watermark(stream, "10 minutes"), "10 minutes")
    S.run_stream_to_completion(S.parquet_sink(agg, out, ckpt))

    got = spark.read.parquet(out).select(F.col("w.start").alias("ws"), "c")
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("event_ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("ws"), "c")
    )
    # append mode only emits windows the final watermark has passed, so the
    # tail window(s) are withheld: every emitted window must match the batch
    # count exactly, and only a watermark-horizon's worth may be missing.
    emitted = {r["ws"]: r["c"] for r in got.collect()}
    full = {r["ws"]: r["c"] for r in batch.collect()}
    assert emitted, "stream emitted nothing"
    for ws, c in emitted.items():
        assert full[ws] == c, (ws, c, full.get(ws))
    missing = set(full) - set(emitted)
    assert len(missing) <= 3, f"too many withheld windows: {len(missing)}"
    assert all(ws > max(emitted) for ws in missing), "non-tail window withheld"


def test_stream_dedup_within_watermark(spark, events_drop_dir):
    out = f"{events_drop_dir}/out2"
    ckpt = f"{events_drop_dir}/ckpt2"
    stream = S.read_events_stream(spark, f"{events_drop_dir}/in")
    deduped = S.dedup_stream(S.with_watermark(stream, "1 hour"), ["user_id", "event_id"])
    S.run_stream_to_completion(S.parquet_sink(deduped, out, ckpt))
    got = spark.read.parquet(out)
    expected = spark.read.parquet(f"{events_drop_dir}/in").dropDuplicates(["user_id", "event_id"]).count()
    assert got.count() == expected


def test_stateful_running_totals(spark, sf_dir, events_drop_dir):
    """applyInPandasWithState custom operator: the final per-user state must
    equal the batch groupBy totals (update-mode emits per micro-batch, so
    take the max events per key from the memory sink)."""
    stream = S.read_events_stream(spark, f"{events_drop_dir}/in")
    totals = S.stateful_running_totals(stream, "user_id", "value")
    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    got = (
        spark.table("running_totals")
        .groupBy("user_id")
        .agg(F.max("events").alias("events"))
    )
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("events"))
    )
    g = {r["user_id"]: r["events"] for r in got.collect()}
    b = {r["user_id"]: r["events"] for r in batch.collect()}
    assert g == b


def test_foreach_batch_into_materialized_exchange(spark, sf_dir, events_drop_dir):
    """Streaming → exchange integration: each micro-batch lands as a
    hash-partitioned materialized stage via foreachBatch + ExchangeManager,
    and the union of staged batches equals the input — the streaming-write
    analogue of the reference's per-map-task S3 objects (one immutable
    object tree per unit of work, readable by any later consumer)."""
    import tempfile

    from pyspark.sql import functions as F2

    from spark_s3_shuffle_spark.operators.exchange import ExchangeManager

    tmp = tempfile.mkdtemp(prefix="stream-exchange-")
    mgr = ExchangeManager(spark, f"file://{tmp}/scratch", prefixes=4)
    seen = []

    def sink(batch_df, batch_id):
        stage = f"events_batch_{batch_id}"
        mgr.stage_write(batch_df, stage, keys=["user_id"], num_partitions=2)
        seen.append(stage)

    stream = S.read_events_stream(spark, f"{events_drop_dir}/in", max_files_per_trigger=2)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).option(
        "checkpointLocation", f"{tmp}/ckpt"
    ).start()
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    assert seen, "no micro-batches materialized"
    total = 0
    for stage in seen:
        total += mgr.stage_read(stage).count()
    expected = spark.read.parquet(f"{events_drop_dir}/in").count()
    assert total == expected
    assert sum(st.bytes_written for st in mgr.stats.values()) > 0
    mgr.remove_all()


def test_session_and_sliding_windows_run(spark, events_drop_dir):
    # bench-tier ops (B38/B39): smoke that the streaming plans run to completion
    base = S.with_watermark(S.read_events_stream(spark, f"{events_drop_dir}/in"), "30 minutes")
    for i, agg in enumerate([
        S.sliding_counts(base, "10 minutes", "5 minutes"),
        S.session_counts(base, "5 minutes"),
    ]):
        out = f"{events_drop_dir}/out3_{i}"
        ckpt = f"{events_drop_dir}/ckpt3_{i}"
        S.run_stream_to_completion(S.parquet_sink(agg, out, ckpt))
        assert spark.read.parquet(out).count() > 0
