"""Object-store exchange: the engine's storage protocols against a REAL
S3 API (round-6 tier).

`operators/exchange.py` runs shuffle-on-storage through the Hadoop
FileSystem API, which in production speaks ``s3a://`` — but this sandbox
ships no ``hadoop-aws`` connector jar, so the JVM can never dial an S3
endpoint here. Rather than leave the object-store claim untested, this
module re-expresses the exchange's storage protocol the way the
reference itself does it (an engine-managed S3 client on every executor
— `S3ShuffleDispatcher.scala:72-78`, `S3ShuffleWriter.scala`): Spark
tasks move the data, boto3 moves the bytes, and the whole protocol is
exercised in tests against moto_server — a faithful S3 REST
implementation — covering exactly the semantics the local filesystem
cannot fake:

- **No rename.** Object stores publish atomically only at single-object
  PUT granularity. The stage commit is therefore a MANIFEST POINTER:
  data objects are written first (invisible to readers — nobody lists
  the prefix), then one ``_manifest.json`` PUT makes the stage exist.
  A crashed writer leaves garbage objects but never a half-visible
  stage; re-running overwrites the manifest, and orphans are swept by
  ``remove_stage``. (The filesystem tier's rename-aside compaction swap
  — `maintenance.py` — is the rename-world answer; this is the
  S3-world answer, the same one table formats standardized.)
- **Prefix sharding.** Part objects spread across
  ``{stage}/p{shard:02d}/`` prefixes (the reference's
  ``folderPrefixes``, `S3ShuffleDispatcher.scala:61,142-143`) so S3's
  per-prefix request-rate limits see P independent key ranges.
- **Bulk parallel delete.** Cleanup pages the manifest keys through
  ``DeleteObjects`` (1000/batch) from a thread pool
  (`S3ShuffleDispatcher.scala:104-118` removeShuffle parity).
- **Multipart upload.** Parts above the threshold stream through S3
  multipart via boto3's transfer manager — exercised with an
  over-threshold stage in tests.
- **Executor-side data plane.** Writes and reads are ``mapInArrow``
  passes: each task serializes/parses its own partition and talks to S3
  itself. At 1000 executors that is 1000 concurrent S3 clients and ZERO
  driver bytes — only the per-partition manifest rows (one JSON line
  each) ever reach the driver.
- **Integrity.** The manifest pins per-object SHA-256 + row count at
  write time; ``verify_stage`` re-downloads and re-hashes distributedly
  (A4/A5 parity with `exchange.py`'s content checksums).

Read-side concurrency is ADAPTIVE (A10 parity,
`S3BufferedPrefetchIterator.scala:32-69`): see
:class:`AdaptiveFetcher` — each reader task hill-climbs its prefetch
thread count from observed GET latencies instead of pinning a static
readahead, and reports the latency histogram the tuner consumed.
"""

from __future__ import annotations

import hashlib
import io
import json
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MANIFEST = "_manifest.json"


@dataclass(frozen=True)
class S3Config:
    """Connection + layout parameters, closure-shipped to every task
    (plain strings/ints only — no client objects cross the wire; each
    task builds its own boto3 client)."""

    endpoint_url: str
    bucket: str
    access_key: str = "graft-test"
    secret_key: str = "graft-test"
    region: str = "us-east-1"
    prefix_shards: int = 16
    multipart_threshold: int = 8 * 1024 * 1024

    def client(self):
        import boto3
        from botocore.config import Config as _BotoConfig

        return boto3.client(
            "s3",
            endpoint_url=self.endpoint_url,
            aws_access_key_id=self.access_key,
            aws_secret_access_key=self.secret_key,
            region_name=self.region,
            config=_BotoConfig(
                retries={"max_attempts": 5, "mode": "standard"}
            ),
        )


def _part_key(stage: str, shard: int, pid: int, attempt: str) -> str:
    """Data keys carry a per-write ATTEMPT token between the prefix shard
    and the part number. Round-7 hardening: without it, two writers
    racing one stage name overwrite each other's same-named objects, so
    the surviving manifest could point at a TORN mix of both writes.
    With disjoint attempt prefixes each writer's object set is private;
    whichever manifest PUT lands last wins and points at ONE complete,
    self-consistent set (the reference's commit discipline —
    S3ShuffleMapOutputWriter.scala:91-118 publishes per-attempt blocks
    and commits via the index). The loser's orphans stay invisible
    (readers only follow the manifest) until remove_stage's paginated
    sweep deletes everything under the stage prefix."""
    return f"{stage}/p{shard:02d}/a{attempt}/part-{pid:05d}.parquet"


def stage_write(
    df: DataFrame,
    stage: str,
    cfg: S3Config,
    sort_within: list[str] | None = None,
    fault_injection=None,
) -> dict:
    """Materialize ``df`` to the object store and PUBLISH it atomically.

    ``sort_within`` (same contract as ``exchange.ExchangeManager.
    stage_write``) sorts rows inside each task's partition before upload,
    so each stage object is internally ordered — the property sorted
    merge-readers and range probes rely on.

    One ``mapInArrow`` pass: each task streams its partition into an
    in-memory parquet file, uploads it (multipart above the threshold)
    to its prefix shard, and emits ONE manifest row (key, rows, bytes,
    sha256). The driver then PUTs ``_manifest.json`` — schema, object
    list, totals — as the single atomic commit point. Returns the
    manifest dict.

    Scale: data bytes never touch the driver; the driver sees
    |partitions| manifest rows. P prefix shards give the store P
    independent rate-limit buckets.

    ``fault_injection`` (test-only seam, round-10): a picklable
    ``callable(partition_id, task_attempt_number)`` invoked in-task AFTER
    the object upload and BEFORE the manifest row is emitted — the worst
    executor-death point (bytes uploaded, nothing committed). Raising
    there simulates the reference's failure scenario
    (`S3ShuffleWriter.scala:10-18`): Spark retries the task, the retry
    re-uploads the SAME key (the attempt token is per stage_write call,
    driver-side), the full-object PUT is last-writer-wins, and the
    manifest only ever records the surviving attempt — so the crashed
    attempt's bytes can never tear the stage. Proven in
    `tests/test_s3exchange.py::test_task_death_mid_write_replays_idempotently`.
    """
    import pyarrow as pa

    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    schema_json = df.schema.json()
    shards = cfg.prefix_shards
    attempt = uuid.uuid4().hex[:12]

    def write_partition(batches):
        import pyarrow as pa2
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        collected = [b for b in batches if b.num_rows > 0]
        if not collected:
            yield pa2.RecordBatch.from_pydict(
                {"key": pa2.array([], pa2.string()),
                 "rows": pa2.array([], pa2.int64()),
                 "bytes": pa2.array([], pa2.int64()),
                 "sha256": pa2.array([], pa2.string())}
            )
            return
        table = pa2.Table.from_batches(collected)
        sink = pa2.BufferOutputStream()
        pq.write_table(table, sink, compression="snappy")
        data = sink.getvalue().to_pybytes()
        sha = hashlib.sha256(data).hexdigest()
        shard = pid % shards
        key = _part_key(stage, shard, pid, attempt)
        client = cfg.client()
        if len(data) >= cfg.multipart_threshold:
            from boto3.s3.transfer import TransferConfig

            client.upload_fileobj(
                io.BytesIO(data),
                cfg.bucket,
                key,
                Config=TransferConfig(
                    multipart_threshold=cfg.multipart_threshold,
                    multipart_chunksize=max(
                        5 * 1024 * 1024, cfg.multipart_threshold // 2
                    ),
                ),
            )
        else:
            client.put_object(Bucket=cfg.bucket, Key=key, Body=data)
        if fault_injection is not None:
            fault_injection(pid, TaskContext.get().attemptNumber())
        yield pa2.RecordBatch.from_pydict(
            {"key": pa2.array([key]),
             "rows": pa2.array([table.num_rows], pa2.int64()),
             "bytes": pa2.array([len(data)], pa2.int64()),
             "sha256": pa2.array([sha])}
        )

    t0 = time.monotonic()
    rows = df.mapInArrow(
        write_partition, "key string, rows long, bytes long, sha256 string"
    ).collect()
    objects = [
        {"key": r["key"], "rows": r["rows"], "bytes": r["bytes"],
         "sha256": r["sha256"]}
        for r in rows
    ]
    manifest = {
        "stage": stage,
        "schema": schema_json,
        "objects": sorted(objects, key=lambda o: o["key"]),
        "total_rows": sum(o["rows"] for o in objects),
        "total_bytes": sum(o["bytes"] for o in objects),
        "write_secs": round(time.monotonic() - t0, 3),
    }
    cfg.client().put_object(
        Bucket=cfg.bucket,
        Key=f"{stage}/{_MANIFEST}",
        Body=json.dumps(manifest, sort_keys=True).encode("utf-8"),
    )
    return manifest


def read_manifest(stage: str, cfg: S3Config) -> dict | None:
    """The stage exists iff its manifest object exists — listing the data
    prefix is never consulted (uncommitted garbage is invisible)."""
    try:
        body = cfg.client().get_object(
            Bucket=cfg.bucket, Key=f"{stage}/{_MANIFEST}"
        )["Body"].read()
    except Exception:
        return None
    return json.loads(body.decode("utf-8"))


class AdaptiveFetcher:
    """Hill-climbing prefetch controller (A10 —
    `S3BufferedPrefetchIterator.scala:32-69` re-expressed): fetch keys
    with a thread pool whose size adapts to OBSERVED throughput. After
    each probe window it tries the next concurrency step; if the
    window's aggregate throughput improved it keeps climbing, otherwise
    it steps back — converging near the store's sweet spot instead of
    pinning a static readahead. Records per-GET latencies so callers can
    export the histogram the tuner consumed."""

    def __init__(self, fetch_one, min_threads=1, max_threads=16, window=6):
        self.fetch_one = fetch_one
        self.min_threads = min_threads
        self.max_threads = max_threads
        self.window = window
        self.latencies: list[float] = []
        self.thread_trace: list[int] = []

    def fetch_all(self, keys: list[str]):
        """Yield (key, payload) for every key; order not guaranteed
        within a probe window."""
        threads = self.min_threads
        prev_rate = 0.0
        direction = 1
        i = 0
        while i < len(keys):
            chunk = keys[i: i + self.window]
            i += self.window
            self.thread_trace.append(threads)
            t0 = time.monotonic()
            with ThreadPoolExecutor(max_workers=threads) as pool:
                def timed(key):
                    s = time.monotonic()
                    payload = self.fetch_one(key)
                    return key, payload, time.monotonic() - s

                for key, payload, lat in pool.map(timed, chunk):
                    self.latencies.append(lat)
                    yield key, payload
            elapsed = max(time.monotonic() - t0, 1e-9)
            rate = len(chunk) / elapsed
            if rate < prev_rate:
                direction = -direction  # last step hurt: reverse
            prev_rate = rate
            threads = min(
                self.max_threads, max(self.min_threads, threads + direction)
            )

    def latency_histogram(self, buckets=(5, 10, 25, 50, 100, 250, 1000)):
        """Observed GET latency histogram in ms — the signal the
        hill-climber consumed, exported for operators (the reference
        logs the same from its prefetch iterator)."""
        out = {f"<={b}ms": 0 for b in buckets}
        out["inf"] = 0
        for lat in self.latencies:
            ms = lat * 1000
            for b in buckets:
                if ms <= b:
                    out[f"<={b}ms"] += 1
                    break
            else:
                out["inf"] += 1
        return out


def stage_read(
    spark: SparkSession,
    stage: str,
    cfg: S3Config,
    num_tasks: int | None = None,
    adaptive: bool = True,
    simulated_latency_ms: float = 0.0,
    fault_injection=None,
) -> DataFrame:
    """Read a committed stage back as a DataFrame: the manifest's keys
    are sliced round-robin across ``num_tasks`` reader tasks; each task
    GETs its objects through an :class:`AdaptiveFetcher` (or a single
    serial fetcher with ``adaptive=False`` — the A/B baseline) and
    parses them into Arrow batches. Data flows store → executor;
    nothing routes through the driver.

    ``simulated_latency_ms`` adds a fixed per-GET sleep — moto responds
    in microseconds, so tests use it to give the hill-climber a real
    latency floor to climb against (documented test-only knob).

    ``fault_injection`` (test-only seam, round-10): picklable
    ``callable(partition_id, task_attempt_number)`` invoked in-task after
    each object is parsed and yielded — raising there simulates a reader
    dying mid-stream. Reads are pure functions of the committed manifest,
    so Spark's task retry re-fetches the slice and the query result is
    byte-identical (the failed attempt's partial output is discarded by
    the scheduler)."""
    manifest = read_manifest(stage, cfg)
    if manifest is None:
        raise FileNotFoundError(f"stage {stage} has no committed manifest")
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    keys = [o["key"] for o in manifest["objects"]]
    n = num_tasks or min(len(keys), spark.sparkContext.defaultParallelism)
    n = max(n, 1)
    assignments = [(keys[i::n],) for i in range(n)] or [([],)]
    kdf = spark.createDataFrame(assignments, "keys array<string>").repartition(n)

    def read_partition(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        my_keys = []
        for b in batches:
            for klist in b.column("keys").to_pylist():
                my_keys.extend(klist or [])
        if not my_keys:
            return
        client = cfg.client()

        def fetch_one(key):
            if simulated_latency_ms:
                time.sleep(simulated_latency_ms / 1000.0)
            return client.get_object(Bucket=cfg.bucket, Key=key)["Body"].read()

        if adaptive:
            fetcher = AdaptiveFetcher(fetch_one)
            stream = fetcher.fetch_all(my_keys)
        else:
            stream = ((k, fetch_one(k)) for k in my_keys)
        for _key, payload in stream:
            table = pq.read_table(pa.BufferReader(payload))
            yield from table.to_batches()
            if fault_injection is not None:
                from pyspark import TaskContext

                ctx = TaskContext.get()
                fault_injection(ctx.partitionId(), ctx.attemptNumber())

    return kdf.mapInArrow(read_partition, schema)


def verify_stage(spark: SparkSession, stage: str, cfg: S3Config) -> bool:
    """A4/A5 read-side validation against the manifest: every object is
    re-downloaded and re-hashed (distributed, one task slice per reader)
    and compared to the SHA-256 + row count pinned at write time.
    False on any missing/corrupt/short object or a missing manifest —
    callers decide refetch/rebuild."""
    manifest = read_manifest(stage, cfg)
    if manifest is None:
        return False
    want = {o["key"]: (o["sha256"], o["rows"]) for o in manifest["objects"]}
    keys = sorted(want)
    n = max(min(len(keys), spark.sparkContext.defaultParallelism), 1)
    kdf = spark.createDataFrame(
        [(keys[i::n],) for i in range(n)], "keys array<string>"
    ).repartition(n)

    def check(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        client = cfg.client()
        for b in batches:
            for klist in b.column("keys").to_pylist():
                for key in klist or []:
                    try:
                        body = client.get_object(
                            Bucket=cfg.bucket, Key=key
                        )["Body"].read()
                        sha = hashlib.sha256(body).hexdigest()
                        rows = pq.read_table(pa.BufferReader(body)).num_rows
                        ok = True
                    except Exception:
                        sha, rows, ok = "", -1, False
                    yield pa.RecordBatch.from_pydict(
                        {"key": pa.array([key]), "sha256": pa.array([sha]),
                         "rows": pa.array([rows], pa.int64()),
                         "ok": pa.array([ok])}
                    )

    got = kdf.mapInArrow(
        check, "key string, sha256 string, rows long, ok boolean"
    ).collect()
    seen = {}
    for r in got:
        if not r["ok"]:
            return False
        seen[r["key"]] = (r["sha256"], r["rows"])
    return seen == want


class S3ExchangeManager:
    """API-parity facade over the S3 protocol functions, mirroring
    `exchange.ExchangeManager`'s surface (stage_write / stage_read /
    verify / remove_stage / remove_all) so callers switch stores by
    swapping the manager, not their code — the reference's promise that
    ``file://`` and object-store roots run the same pipeline
    (`README.md:38-40`). Stage paths are prefix-sharded per stage name
    (crc32, process-stable) under ``{app_id}/{stage}``."""

    def __init__(self, spark: SparkSession, cfg: S3Config, app_id: str = "app"):
        import zlib

        self.spark = spark
        self.cfg = cfg
        self.app_id = app_id
        self._crc = zlib.crc32

    def stage_key(self, stage: str) -> str:
        shard = self._crc(stage.encode("utf-8")) % self.cfg.prefix_shards
        return f"x{shard:02d}/{self.app_id}/{stage}"

    def stage_write(
        self, df: DataFrame, stage: str, sort_within: list[str] | None = None
    ) -> dict:
        return stage_write(
            df, self.stage_key(stage), self.cfg, sort_within=sort_within
        )

    def stage_read(self, stage: str, **kw) -> DataFrame:
        return stage_read(self.spark, self.stage_key(stage), self.cfg, **kw)

    def verify(self, stage: str) -> bool:
        return verify_stage(self.spark, self.stage_key(stage), self.cfg)

    def remove_stage(self, stage: str) -> int:
        return remove_stage(self.stage_key(stage), self.cfg)

    def remove_all(self) -> int:
        """Tear down every stage of this app across all prefix shards —
        the applicationRemoved sweep. One paginated LIST per shard prefix
        (`x{NN}/{app_id}/`) feeding bulk DeleteObjects. Returns keys
        deleted."""
        client = self.cfg.client()
        deleted = 0
        paginator = client.get_paginator("list_objects_v2")
        for shard in range(self.cfg.prefix_shards):
            keys = []
            prefix = f"x{shard:02d}/{self.app_id}/"
            for page in paginator.paginate(
                Bucket=self.cfg.bucket, Prefix=prefix
            ):
                keys.extend(o["Key"] for o in page.get("Contents", []))
            for i in range(0, len(keys), 1000):
                batch = keys[i: i + 1000]
                client.delete_objects(
                    Bucket=self.cfg.bucket,
                    Delete={
                        "Objects": [{"Key": k} for k in batch],
                        "Quiet": True,
                    },
                )
                deleted += len(batch)
        return deleted


def remove_stage(stage: str, cfg: S3Config, delete_threads: int = 4) -> int:
    """Tear a stage down: the manifest's keys (plus the manifest itself)
    go through bulk DeleteObjects, 1000 per request, batches issued from
    a thread pool — removeShuffle parity
    (`S3ShuffleDispatcher.scala:104-118`). Unmanifested orphans under
    the stage prefix (crashed writers) are swept by a paginated LIST.
    Returns the number of keys deleted."""
    client = cfg.client()
    keys = set()
    manifest = read_manifest(stage, cfg)
    if manifest:
        keys.update(o["key"] for o in manifest["objects"])
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=cfg.bucket, Prefix=f"{stage}/"):
        for obj in page.get("Contents", []):
            keys.add(obj["Key"])
    all_keys = sorted(keys)
    batches = [all_keys[i: i + 1000] for i in range(0, len(all_keys), 1000)]

    def delete_batch(batch):
        client_local = cfg.client()
        client_local.delete_objects(
            Bucket=cfg.bucket,
            Delete={"Objects": [{"Key": k} for k in batch], "Quiet": True},
        )
        return len(batch)

    if not batches:
        return 0
    with ThreadPoolExecutor(max_workers=delete_threads) as pool:
        return sum(pool.map(delete_batch, batches))


def sweep_incomplete_uploads(stage: str, cfg: S3Config) -> int:
    """Abort every in-progress multipart upload under the stage prefix —
    the crash-mid-multipart janitor. A writer that died between
    CreateMultipartUpload and Complete leaves invisible billed part
    fragments (no object exists until Complete, so readers are never
    affected); production S3 handles this with an
    AbortIncompleteMultipartUpload lifecycle rule, and this sweep is the
    explicit equivalent for stores without lifecycle support. Returns the
    number of uploads aborted. Mirrors the reference's cleanup duty on
    failed writes (S3ShuffleMapOutputWriter.scala:156-163 abort path)."""
    client = cfg.client()
    aborted = 0
    kwargs = {"Bucket": cfg.bucket, "Prefix": f"{stage}/"}
    while True:
        resp = client.list_multipart_uploads(**kwargs)
        for up in resp.get("Uploads", []):
            client.abort_multipart_upload(
                Bucket=cfg.bucket, Key=up["Key"], UploadId=up["UploadId"]
            )
            aborted += 1
        if not resp.get("IsTruncated"):
            return aborted
        kwargs["KeyMarker"] = resp.get("NextKeyMarker")
        kwargs["UploadIdMarker"] = resp.get("NextUploadIdMarker")
