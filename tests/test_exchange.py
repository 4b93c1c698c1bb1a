"""Materialized-exchange tests (SURVEY §4.3): write/read barrier semantics,
prefix-sharded layout, stats, cleanup — the engine-feature analogue of the
reference's S3 shuffle lifecycle (S3ShuffleDispatcher.scala:104-118,142-143)."""

import os
import subprocess
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.operators.exchange import ExchangeManager

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def test_stage_path_deterministic_across_processes(spark, mgr):
    """The shard prefix must not depend on the driver process: a restarted
    (or re-sized) cluster re-reads a materialized stage by recomputing its
    path (reference's stable {root}/{mapId % prefixes}/{appId}/{shuffleId}
    layout, S3ShuffleDispatcher.scala:142-143). Python's builtin hash() is
    salted per process, so this test runs the path computation in fresh
    interpreters with different PYTHONHASHSEEDs and asserts agreement."""
    script = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from spark_s3_shuffle_spark.operators.exchange import ExchangeManager\n"
        "m = ExchangeManager(spark=None, root=sys.argv[2], prefixes=4, app_id=sys.argv[3])\n"
        "print(m.stage_path(sys.argv[4]))\n"
    )
    expected = mgr.stage_path("restart-stage")
    for seed in ("0", "12345"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        got = subprocess.run(
            [sys.executable, "-c", script, REPO_ROOT, mgr.root, mgr.app_id, "restart-stage"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout.strip()
        assert got == expected, f"shard path differs under PYTHONHASHSEED={seed}"


def test_cross_process_write_then_read(spark):
    """Full elasticity round trip: a *separate driver process* materializes a
    stage; this session (knowing only root/app_id/stage name) reads it back.
    This is the plugin's core claim — the producing executors/driver need
    not be alive for the consumer to fetch the exchange."""
    tmp = tempfile.mkdtemp(prefix="exchange-xproc-")
    script = os.path.join(tmp, "writer.py")
    with open(script, "w") as f:
        f.write(
            "import sys\n"
            f"sys.path.insert(0, {REPO_ROOT!r})\n"
            "from pyspark.sql import SparkSession, functions as F\n"
            "from spark_s3_shuffle_spark.operators.exchange import ExchangeManager\n"
            "spark = (SparkSession.builder.master('local[2]').appName('xproc-writer')\n"
            "         .config('spark.ui.enabled', 'false')\n"
            "         .config('spark.sql.shuffle.partitions', '4').getOrCreate())\n"
            f"mgr = ExchangeManager(spark, 'file://{tmp}/scratch', prefixes=4, app_id='sharedapp')\n"
            "df = spark.range(100).withColumn('k', F.col('id') % 7)\n"
            "mgr.stage_write(df, 'xproc', keys=['k'], num_partitions=2)\n"
            "spark.stop()\n"
        )
    env = dict(os.environ, PYTHONHASHSEED="271828")
    # fresh JVM + fresh interpreter; must not inherit this session's gateway
    env.pop("PYSPARK_GATEWAY_PORT", None)
    env.pop("PYSPARK_GATEWAY_SECRET", None)
    res = subprocess.run([sys.executable, script], env=env, capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    reader = ExchangeManager(spark, f"file://{tmp}/scratch", prefixes=4, app_id="sharedapp")
    back = reader.stage_read("xproc")
    assert back.count() == 100
    assert back.agg(F.sum("id")).first()[0] == 99 * 100 // 2
    st = reader.stats["xproc"]
    assert st.num_reads == 1 and st.bytes_read > 0 and st.read_secs > 0


def test_bucketed_stages_join_without_shuffle(spark, mgr):
    """The co-location contract: two stages bucketed on the same key join
    with ZERO exchange in the plan — the materialized analogue of the
    plugin's pre-partitioned map output (reducers read their partition
    directly). A plain parquet re-read of the same files cannot do this."""
    from spark_s3_shuffle_spark.plans import inspect as I

    a = spark.range(2000).withColumn("k", F.col("id") % 50).withColumn("va", F.col("id") * 2)
    b = spark.range(1000).withColumn("k", F.col("id") % 50).withColumn("vb", F.col("id") * 3)
    mgr.stage_write_bucketed(a.select("k", "va"), "bucket_a", keys=["k"], num_buckets=4)
    mgr.stage_write_bucketed(b.select("k", "vb"), "bucket_b", keys=["k"], num_buckets=4)
    ra, rb = mgr.stage_read_bucketed("bucket_a"), mgr.stage_read_bucketed("bucket_b")
    joined = ra.join(rb, "k")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the join to rely on bucketing
    try:
        assert I.count_exchanges(joined) == 0, I.formatted_plan(joined)[:1500]
        assert joined.count() == 2000 * 1000 // 50  # 40 ids per key on a, 20 on b, 50 keys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_metering(spark, mgr):
    df = spark.range(10_000).withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    st = mgr.stage_write(df, "metered", num_partitions=4)
    assert st.write_secs > 0
    assert st.mib_per_sec() > 0
    assert mgr.stats["metered"] is st


def test_metered_read_populates_task_metrics(spark, mgr):
    """A15 read side: a metered read window must record task-level input
    bytes/records and executor time from the status store."""
    df = spark.range(50_000).withColumn("k", F.col("id") % 7).withColumn(
        "payload", F.sha2(F.col("id").cast("string"), 256)
    )
    mgr.stage_write(df, "metered", keys=["k"], num_partitions=4)
    with mgr.metered_read("metered") as back:
        total = back.agg(F.sum("id")).first()[0]
    assert total == 49_999 * 50_000 // 2
    st = mgr.stats["metered"]
    assert st.metered_stages >= 1
    assert st.task_input_records == 50_000
    assert st.task_input_bytes > 0
    assert st.task_read_millis >= 0
    # the coarse _du-based byte meter and the task-level meter agree on
    # magnitude (same files read once)
    assert st.task_input_bytes <= st.bytes_read * 2


def test_content_checksum_write_and_verify(spark, mgr):
    """A4/A5 parity at the engine level: the content checksum validates a
    materialized stage at rest; losing a part file (or any row) fails
    verification, and the digest is independent of read parallelism."""
    import glob

    from spark_s3_shuffle_spark.operators.exchange import (
        verify_stage_checksum,
        write_stage_checksum,
    )

    df = spark.range(2000).withColumn("k", F.col("id") % 7)
    mgr.stage_write(df, "ck", keys=["k"], num_partitions=5)
    doc = write_stage_checksum(mgr, "ck")
    assert doc["rows"] == 2000
    assert verify_stage_checksum(mgr, "ck")

    # tamper: drop one part file -> count and digest both shift
    path = mgr.stage_path("ck").replace("file:", "")
    victim = sorted(glob.glob(f"{path}/part-*.parquet"))[0]
    os.remove(victim)
    assert not verify_stage_checksum(mgr, "ck")

    # missing sidecar reports unverifiable, not crash
    mgr.stage_write(df, "ck2", keys=["k"])
    assert not verify_stage_checksum(mgr, "ck2")

    # total corruption — EVERY parquet file gone, only the sidecar left —
    # must also report False (the caller decides refetch/rebuild), not
    # crash with an unable-to-infer-schema AnalysisException
    for part in glob.glob(f"{path}/part-*.parquet"):
        os.remove(part)
    assert not verify_stage_checksum(mgr, "ck")


def test_content_checksum_invariant_to_read_parallelism(spark, mgr):
    """The content digest is an order-independent exact-integer sum, so
    re-reading the same stage under different shuffle/read parallelism
    (and after a key repartition) must verify identically."""
    from spark_s3_shuffle_spark.operators.exchange import (
        verify_stage_checksum,
        write_stage_checksum,
    )

    df = spark.range(3000).withColumn("k", F.col("id") % 11)
    mgr.stage_write(df, "ckp", keys=["k"], num_partitions=4)
    doc = write_stage_checksum(mgr, "ckp")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("5", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            assert verify_stage_checksum(mgr, "ckp"), parts
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    # a REWRITE with different partitioning carries the same content:
    # recomputed digest equals the sidecar written before the rewrite
    re_read = mgr.stage_read("ckp").repartition(9, "k")
    mgr.stage_write(re_read, "ckp2", keys=["k"], num_partitions=9)
    doc2 = write_stage_checksum(mgr, "ckp2")
    assert (doc["rows"], doc["digest"]) == (doc2["rows"], doc2["digest"])


def test_tune_read_partition_bytes_changes_scan_parallelism(spark, mgr):
    """A10 parity, A/B-measured: the knob consumes REAL metered-read task
    metrics and resizes the scan split; under a deliberately tiny split
    the same stage reads as many tasks, after tuning it reads as few —
    the conf change demonstrably changes read parallelism."""
    df = spark.range(200_000).withColumn("k", F.col("id") % 16).withColumn(
        "pad", F.sha2(F.col("id").cast("string"), 256)
    )
    mgr.stage_write(df, "tune", keys=["k"], num_partitions=16)

    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        # no observations yet -> the knob refuses to guess
        import pytest as _pytest

        with _pytest.raises(ValueError):
            mgr.tune_read_partition_bytes("tune")

        # A: tiny splits -> wide scan
        spark.conf.set(key, str(64 * 1024))
        with mgr.metered_read("tune") as d:
            d.agg(F.count(F.lit(1))).collect()
        wide = mgr.stage_read("tune", meter=False).rdd.getNumPartitions()

        st = mgr.stats["tune"]
        assert st.task_input_bytes > 0 and st.task_read_millis > 0

        # B: tune from the observed throughput -> larger split -> narrow scan
        decision = mgr.tune_read_partition_bytes(
            "tune", target_task_millis=10_000
        )
        assert decision["new_max_partition_bytes"] >= 1 << 20
        assert int(spark.conf.get(key)) == decision["new_max_partition_bytes"]
        narrow = mgr.stage_read("tune", meter=False).rdd.getNumPartitions()
        assert narrow < wide, (narrow, wide, decision)
    finally:
        spark.conf.set(key, old)
