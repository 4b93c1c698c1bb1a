"""Materialized exchange: shuffle-on-object-storage as an engine feature.

The reference's core value proposition is "shuffle data lives on elastic
object storage, so executors are stateless and can scale down mid-query"
(reference: S3ShuffleManager.scala + README.md:3-4 — a JVM ShuffleManager
plugin). That SPI is JVM-only; the idiomatic PySpark equivalent (SURVEY
§4.3) is a *checkpoint exchange*: hash-partition a DataFrame on its keys and
persist it as Parquet under a prefix-sharded scratch layout, then read it
back as a new stage input.

What this buys at scale, mirroring the plugin:

- write-once/read-many stage barrier on S3 — downstream stages (or a
  *re-sized* cluster) re-read the exchange without the producers being
  alive, like the plugin's FALLBACK_BLOCK_MANAGER_ID trick
  (S3ShuffleWriter.scala:10-18);
- prefix sharding ``{root}/p{hash % P}/{app}/{stage}/`` to dodge object-store
  per-prefix rate limits (the plugin's ``spark.shuffle.s3.folderPrefixes``,
  S3ShuffleDispatcher.scala:61,142-143);
- deterministic cleanup of per-stage or whole-app scratch trees, parallel
  per prefix (S3ShuffleDispatcher.scala:104-118,174-183);
- I/O metering per exchange (bytes/rows/files + wall time — the plugin's
  S3MeasureOutputStream.scala:8-65 analogue).

Everything uses the Hadoop FileSystem API through Spark, so ``file://``,
``s3a://`` and ``cos://`` roots all work (README.md:38-40).
"""

from __future__ import annotations

import os
import time
import uuid
import zlib
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class ExchangeStats:
    """Per-exchange I/O metering, both directions (A15 analogue — the
    reference meters writes via S3MeasureOutputStream.scala:8-65 and reads
    via S3BufferedPrefetchIterator.scala:155-186)."""
    stage: str
    path: str
    num_partitions: int
    write_secs: float = 0.0
    bytes_written: int = 0
    num_files: int = 0
    read_secs: float = 0.0
    bytes_read: int = 0
    num_reads: int = 0
    # task-level read metrics (A15 read side): aggregated from per-task
    # input metrics by Spark's AppStatusListener, harvested per metered
    # read window — see ExchangeManager.metered_read
    task_input_bytes: int = 0
    task_input_records: int = 0
    task_read_millis: int = 0
    metered_stages: int = 0

    def mib_per_sec(self) -> float:
        return (self.bytes_written / (1 << 20)) / self.write_secs if self.write_secs else 0.0

    def read_mib_per_sec(self) -> float:
        return (self.bytes_read / (1 << 20)) / self.read_secs if self.read_secs else 0.0


@dataclass
class ExchangeManager:
    """Manages a scratch root for materialized exchanges.

    ``root`` may be any Hadoop-FS URI (file:///tmp/scratch, s3a://bucket/x).
    ``prefixes`` shards stage dirs across numeric prefixes — object stores
    rate-limit per key prefix, so spreading exchanges over P prefixes gives
    P× the aggregate request budget (the plugin defaults to 10).
    """

    spark: SparkSession
    root: str
    prefixes: int = 10
    app_id: str = ""
    stats: dict[str, ExchangeStats] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.app_id:
            self.app_id = self.spark.sparkContext.applicationId or uuid.uuid4().hex[:12]

    # -- path layout (plugin: ``{rootDir}/{mapId % prefixes}/{appId}/{shuffleId}``)
    def stage_path(self, stage: str) -> str:
        # crc32, NOT builtin hash(): Python salts str hashes per process
        # (PYTHONHASHSEED), so hash(stage) would send a restarted driver to a
        # different prefix than the one the stage was written under —
        # breaking exactly the cross-process re-read the exchange exists for.
        shard = zlib.crc32(stage.encode("utf-8")) % self.prefixes
        return os.path.join(self.root, f"p{shard}", self.app_id, stage)

    # -- write leg: repartition on keys + parquet write (A2 analogue)
    def stage_write(
        self,
        df: DataFrame,
        stage: str,
        keys: list[str] | None = None,
        num_partitions: int | None = None,
        sort_within: list[str] | None = None,
    ) -> ExchangeStats:
        """Materialize ``df`` hash-partitioned on ``keys``.

        The files are physically clustered by key, but a plain parquet
        re-read carries no partitioner metadata, so Catalyst will still
        plan an exchange for a downstream join/agg (the data movement is
        cheap — rows for one key sit in one file — but the stage boundary
        remains). For a *shuffle-free* downstream join use
        :meth:`stage_write_bucketed`, which records bucketing in the
        session catalog. ``sort_within`` additionally sorts rows inside
        each partition (the plugin's reduce-side-sort analogue,
        S3ShuffleReader.scala:141-149).
        """
        path = self.stage_path(stage)
        out = df
        if keys:
            out = out.repartition(num_partitions, *keys) if num_partitions else out.repartition(*keys)
        elif num_partitions:
            out = out.repartition(num_partitions)
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        t0 = time.monotonic()
        out.write.mode("overwrite").parquet(path)
        elapsed = time.monotonic() - t0
        if num_partitions is None:
            # written-file count == partition count for a fresh write; avoids
            # a DF→RDD conversion just to ask getNumPartitions.
            _, nfiles = self._du(path)
            num_partitions = nfiles or int(self.spark.conf.get("spark.sql.shuffle.partitions", "200"))
        st = ExchangeStats(stage, path, num_partitions, elapsed)
        st.bytes_written, st.num_files = self._du(path)
        self.stats[stage] = st
        return st

    def stage_read(self, stage: str, meter: bool = True) -> DataFrame:
        """Read an exchange back (B-side of the barrier). Parquet footers
        give per-file stats, so downstream filters still prune.

        ``meter`` records the read on the stage's ExchangeStats (read-side
        A15 parity: bytes at rest + listing latency; per-task stream timing
        belongs to the Spark UI / task metrics, which local mode exposes via
        the status tracker)."""
        path = self.stage_path(stage)
        t0 = time.monotonic()
        df = self.spark.read.parquet(path)
        if meter:
            st = self.stats.get(stage)
            if st is None:
                st = ExchangeStats(stage, path, 0)
                self.stats[stage] = st
            bytes_at_rest, _ = self._du(path)
            st.bytes_read += bytes_at_rest
            st.read_secs += time.monotonic() - t0
            st.num_reads += 1
        return df

    # -- task-level read metering (A15 read side) --------------------------
    def _stage_list(self):
        """All stages from the driver's AppStatusStore — the store Spark's
        own AppStatusListener populates from per-task metric updates."""
        sc = self.spark.sparkContext
        jvm = sc._jvm
        store = sc._jsc.sc().statusStore()
        return store.stageList(
            jvm.java.util.ArrayList(), False, False,
            sc._gateway.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
        )

    def _stage_input_metrics(self, completed_only: bool = False) -> dict[int, tuple[int, int, int]]:
        """stageId -> (inputBytes, inputRecords, executorRunTimeMillis).

        ``completed_only`` keeps only stages with status COMPLETE — a stage
        still RUNNING reports partial task metrics that would be harvested
        once and never reconciled with its final values."""
        stages = self._stage_list()
        out: dict[int, tuple[int, int, int]] = {}
        for i in range(stages.size()):
            s = stages.apply(i)
            if completed_only and str(s.status()) != "COMPLETE":
                continue
            out[int(s.stageId())] = (
                int(s.inputBytes()), int(s.inputRecords()), int(s.executorRunTime()),
            )
        return out

    @contextmanager
    def metered_read(self, stage: str):
        """Read an exchange with task-level read metering (the reference
        meters each read stream's wall time in
        S3BufferedPrefetchIterator.scala:155-186; the Spark-native analogue
        is the per-task input metrics the AppStatusListener already
        aggregates per stage).

        Usage::

            with mgr.metered_read("stage") as df:
                df.agg(...).collect()      # any action(s)

        On exit, input bytes/records and executor run time of every stage
        that completed inside the window are added to the stage's
        ExchangeStats (task_input_bytes / task_input_records /
        task_read_millis). Only stages with status COMPLETE at window exit
        are harvested — a RUNNING stage's partial counts would be added once
        and never reconciled. The window attributes ALL new completed stages
        to this read — meter one exchange read at a time per driver."""
        before = set(self._stage_input_metrics())
        df = self.stage_read(stage)
        yield df
        st = self.stats[stage]
        for sid, (ib, ir, rt) in self._stage_input_metrics(completed_only=True).items():
            if sid in before:
                continue
            st.task_input_bytes += ib
            st.task_input_records += ir
            st.task_read_millis += rt
            st.metered_stages += 1

    def tune_read_partition_bytes(
        self,
        stage: str,
        target_task_millis: int = 2_000,
        min_bytes: int = 1 << 20,
        max_bytes: int = 1 << 30,
    ) -> dict:
        """Metering-driven read-parallelism knob (A10 parity for the
        filesystem exchange — the reference hill-climbs its prefetch
        thread count from observed latencies,
        `S3BufferedPrefetchIterator.scala:32-69`; the Spark-native
        analogue of "how much read work per concurrent unit" is
        ``spark.sql.files.maxPartitionBytes``, the scan-split size).

        Consumes the task metrics a prior :meth:`metered_read` window
        harvested (observed aggregate bytes / executor-run-millis) and
        sizes the split so one scan task carries ``target_task_millis``
        of work at the OBSERVED per-task throughput — small splits on a
        slow store (more concurrent requests hide latency), large splits
        on a fast one (fewer per-task overheads). Clamped to
        [min_bytes, max_bytes], applied to the session conf (takes
        effect on the NEXT read planned), returns the decision record::

            {"observed_bytes_per_ms", "old_max_partition_bytes",
             "new_max_partition_bytes", "target_task_millis"}

        Raises ValueError if the stage has no metered observations — the
        knob never guesses.
        """
        st = self.stats.get(stage)
        if st is None or st.task_read_millis <= 0 or st.task_input_bytes <= 0:
            raise ValueError(
                f"stage {stage!r} has no metered read observations; run a "
                "metered_read window first — the knob adapts, not guesses"
            )
        bytes_per_ms = st.task_input_bytes / st.task_read_millis
        proposed = int(bytes_per_ms * target_task_millis)
        clamped = max(min_bytes, min(max_bytes, proposed))
        key = "spark.sql.files.maxPartitionBytes"
        old = self.spark.conf.get(key)
        self.spark.conf.set(key, str(clamped))
        return {
            "observed_bytes_per_ms": round(bytes_per_ms, 2),
            "old_max_partition_bytes": old,
            "new_max_partition_bytes": clamped,
            "target_task_millis": target_task_millis,
        }

    # -- bucketed variant: co-located, shuffle-free downstream joins -------
    def stage_write_bucketed(
        self,
        df: DataFrame,
        stage: str,
        keys: list[str],
        num_buckets: int = 32,
        sort_within: list[str] | None = None,
    ) -> ExchangeStats:
        """Materialize ``df`` as a BUCKETED table on ``keys``: bucketing
        metadata lands in the session catalog, so two stages bucketed the
        same way join/aggregate with ZERO exchange — Catalyst trusts the
        bucket layout (this is the property a plain parquet re-read cannot
        give, and the true analogue of the plugin's "reducers read
        pre-partitioned map output" layout). Bucket files live under the
        same prefix-sharded scratch path; table name = stage name
        (catalog-sanitized). Lifetime is the session's, matching shuffle
        scratch semantics.
        """
        path = self.stage_path(stage)
        table = f"exchange_{stage}".replace("-", "_").replace("/", "_")
        t0 = time.monotonic()
        writer = df.write.mode("overwrite").format("parquet").option("path", path)
        writer = writer.bucketBy(num_buckets, *keys)
        if sort_within:
            writer = writer.sortBy(*sort_within)
        writer.saveAsTable(table)
        elapsed = time.monotonic() - t0
        st = ExchangeStats(stage, path, num_buckets, elapsed)
        st.bytes_written, st.num_files = self._du(path)
        self.stats[stage] = st
        return st

    def stage_read_bucketed(self, stage: str) -> DataFrame:
        """Read a bucketed exchange via the catalog (keeps the bucket spec —
        a plain ``spark.read.parquet`` of the same files would discard it)."""
        table = f"exchange_{stage}".replace("-", "_").replace("/", "_")
        return self.spark.table(table)

    # -- Hadoop FS plumbing ------------------------------------------------
    def _fs(self, path: str):
        jvm = self.spark._jvm
        jsc = self.spark._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        return hpath.getFileSystem(jsc.hadoopConfiguration()), hpath, jvm

    def _du(self, path: str) -> tuple[int, int]:
        """(bytes, file count) of the stage's DATA files only. Walks the
        tree and filters to ``part-*`` — getContentSummary would also count
        ``_SUCCESS`` and local-FS ``.crc`` sidecars, inflating the recorded
        partition count (e.g. 5 for a 4-partition write)."""
        fs, hpath, _ = self._fs(path)
        if not fs.exists(hpath):
            return 0, 0
        nbytes = nfiles = 0
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            f = it.next()
            if f.getPath().getName().startswith("part-"):
                nbytes += int(f.getLen())
                nfiles += 1
        return nbytes, nfiles

    # -- cleanup (A13 analogue: per-stage and whole-app delete) ------------
    def remove_stage(self, stage: str) -> bool:
        fs, hpath, _ = self._fs(self.stage_path(stage))
        ok = bool(fs.delete(hpath, True)) if fs.exists(hpath) else False
        self.stats.pop(stage, None)
        return ok

    def remove_all(self) -> int:
        """Delete this app's scratch across all prefixes (plugin's
        ``removeRoot``). One delete call per prefix tree — on S3 the FS
        client fans these out; prefix sharding keeps each tree small."""
        removed = 0
        for shard in range(self.prefixes):
            p = os.path.join(self.root, f"p{shard}", self.app_id)
            fs, hpath, _ = self._fs(p)
            if fs.exists(hpath):
                fs.delete(hpath, True)
                removed += 1
        self.stats.clear()
        return removed


# -- content checksums (A4/A5 analogue) ------------------------------------
# The plugin writes per-reduce-partition Adler32/CRC32 objects at shuffle
# write and validates them at partition boundaries on read
# (S3ShuffleHelper.scala:49-51,83-92; S3ChecksumValidationStream.scala:
# 17-92). The engine-level analogue validates CONTENT, not byte streams:
# an order-independent row-hash sum over the materialized stage, written
# as a sidecar at stage_write time and recomputed at read time — catching
# lost/truncated/duplicated files and corrupted values regardless of how
# the object store re-chunked the bytes.

def _content_checksum(df) -> tuple[int, str]:
    """(row_count, order-independent content digest): sum of per-row
    xxhash64 over ALL columns, accumulated exactly in decimal(38,0) so the
    digest is independent of partitioning and read order."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("s"),
    ).first()
    return int(row["n"]), str(row["s"] if row["s"] is not None else 0)


def _checksum_path(stage_path: str) -> str:
    return f"{stage_path}/_content_checksum.json"


def write_stage_checksum(mgr: "ExchangeManager", stage: str) -> dict:
    """Compute + persist the content checksum of a materialized stage
    (reads the files AT REST, so what is validated later is what the
    object store actually holds, not what the writer intended)."""
    import json as _json

    path = mgr.stage_path(stage)
    n, digest = _content_checksum(mgr.spark.read.parquet(path))
    doc = {"stage": stage, "rows": n, "digest": digest}
    fs, _, jvm = mgr._fs(path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(_checksum_path(path)), True)
    out.write(bytearray(_json.dumps(doc).encode("utf-8")))
    out.close()
    return doc


def verify_stage_checksum(mgr: "ExchangeManager", stage: str) -> bool:
    """Recompute the stage's content checksum and compare with the sidecar
    (A5 read-side validation). Returns False on any mismatch or missing
    sidecar — callers decide whether to refetch/rebuild the stage, the
    same recovery the plugin's validation stream triggers."""
    import json as _json

    path = mgr.stage_path(stage)
    fs, _, jvm = mgr._fs(path)
    cpath = jvm.org.apache.hadoop.fs.Path(_checksum_path(path))
    if not fs.exists(cpath):
        return False
    stream = fs.open(cpath)
    try:
        raw = bytes(stream.readAllBytes())
    finally:
        stream.close()
    want = _json.loads(raw.decode("utf-8"))
    # Total corruption — every parquet file missing/deleted — makes the
    # read itself raise (unable to infer schema) rather than produce a
    # mismatching digest; that is still "validation failed", so report
    # False and let the caller refetch/rebuild, mirroring the
    # missing-sidecar path above.
    try:
        df = mgr.spark.read.parquet(path)
        n, digest = _content_checksum(df)
    except Exception:
        return False
    return n == want["rows"] and digest == want["digest"]
