"""Manifest-driven parquet source via the Spark 4 Python DataSource API —
an object-store table layout with file-level data skipping (SURVEY §2.2
B1/B4 tier; the reference delegates all storage access to the Hadoop
FileSystem abstraction, `helper/S3ShuffleDispatcher.scala:95-134` — this
is the equivalent seam on the *source* side, expressed as a first-class
Spark data source instead of a path convention).

Layout: a JSON-lines manifest, one entry per parquet shard:

    {"path": "/data/part-0.parquet", "stats": {"id": [0, 999]}}

``stats`` maps column name → [min, max] for any columns the writer chose
to track — exactly the footer-stats idea that Iceberg/Delta manifests
scale up: the planner prunes SHARDS from the manifest alone, without
touching a single data file, so a selective query on a 100 TB table opens
only the files that can contain matching rows.

Pushdown contract: ``pushFilters`` keeps every filter it understands for
two uses — manifest-level shard pruning (min/max interval checks) and
row-level pyarrow filtering inside ``read`` — but still returns ALL
filters to Spark, so Spark re-applies them post-scan. Pruning is
therefore best-effort and can never change query results (the same
conservative stance Spark's own parquet row-group pruning takes).

Partitioning: one InputPartition per surviving shard — a 1000-executor
cluster reads 1000 shards concurrently; per-shard reads stream pyarrow
record batches (Arrow zero-copy into Spark), never materializing a shard
in Python memory.

Bloom skipping: [min, max] zone maps cannot prune POINT lookups on a key
the layout is not sorted/ranged by — every shard of a hash-distributed
table spans nearly the full key range, so every interval check passes.
Manifests can therefore also carry a per-shard bloom filter per chosen
column (``write_manifest(bloom_cols=...)``): ~10 bits per distinct value
at 1% false-positive rate, built from one writer-side column pass. An
EqualTo/In filter on a bloomed column prunes any shard whose filter
proves the value absent — a 100 TB hash-layout table answers a point
lookup by opening ~1 shard instead of all of them (the Iceberg/Delta
bloom strategy, Parquet's own bloom_filter pages scaled to the manifest).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "manifest_parquet"


@dataclass
class _Shard(InputPartition):
    path: str


def _interval_may_match(f: Filter, lo, hi) -> bool:
    """Can a column whose values span [lo, hi] contain a row satisfying f?
    Conservative: unknown filter shapes / missing stats answer True."""
    if isinstance(f, EqualTo):
        return lo <= f.value <= hi
    if isinstance(f, GreaterThan):
        return hi > f.value
    if isinstance(f, GreaterThanOrEqual):
        return hi >= f.value
    if isinstance(f, LessThan):
        return lo < f.value
    if isinstance(f, LessThanOrEqual):
        return lo <= f.value
    if isinstance(f, In):
        return any(lo <= v <= hi for v in f.value)
    return True


def _bloom_bytes(v) -> bytes | None:
    """Canonical byte encoding hashed on BOTH the write and probe side.
    Integral floats collapse onto ints because Spark may widen a bigint
    literal to double in the pushed filter.

    Returns ``None`` for types with NO canonical cross-side encoding
    (Decimal, date/datetime, bytes, …): a repr-based fallback would let the
    writer-side repr (``Decimal('123.450')`` from pyarrow) diverge from the
    probe-side pushed literal (``Decimal('123.45')`` or a float) and
    silently prune a shard that DOES contain matches. The writer rejects
    such columns loudly; the probe side degrades to "may contain"."""
    if isinstance(v, bool):
        return b"b1" if v else b"b0"
    if isinstance(v, int):
        return b"i" + str(v).encode()
    if isinstance(v, float) and v.is_integer():
        return b"i" + str(int(v)).encode()
    if isinstance(v, float):
        return b"f" + repr(v).encode()
    if isinstance(v, str):
        return b"s" + v.encode()
    return None


def _bloom_positions(value, m: int, k: int) -> list[int] | None:
    """k bit positions via double hashing over one md5 (Kirsch-Mitzenmacher:
    two independent 64-bit halves compose k hashes with one digest).
    ``None`` when the value has no canonical encoding."""
    import hashlib

    enc = _bloom_bytes(value)
    if enc is None:
        return None
    d = hashlib.md5(enc).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd -> full-period stride
    return [(h1 + i * h2) % m for i in range(k)]


def _bloom_build(values, fpp: float = 0.01) -> dict:
    """Bloom filter over distinct ``values`` as a manifest-embeddable dict
    {m, k, bits(base64)} — sized m = -n ln p / (ln 2)^2, k = (m/n) ln 2.
    In-place bytearray bit sets: O(n·k) with no big-int copying, so a shard
    with millions of distinct keys builds in linear time."""
    import base64
    import math

    distinct = set(values)
    n = max(1, len(distinct))
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    raw = bytearray((m + 7) // 8)
    for v in distinct:
        positions = _bloom_positions(v, m, k)
        if positions is None:
            raise TypeError(
                f"bloom_cols supports bool/int/float/str values; got "
                f"{type(v).__name__} — no canonical writer/probe encoding"
            )
        for pos in positions:
            raw[pos >> 3] |= 1 << (pos & 7)
    return {"m": m, "k": k, "bits": base64.b64encode(bytes(raw)).decode("ascii")}


def _bloom_may_contain(bloom: dict, value) -> bool:
    import base64

    positions = _bloom_positions(value, bloom["m"], bloom["k"])
    if positions is None:  # un-encodable probe literal: cannot prune safely
        return True
    raw = base64.b64decode(bloom["bits"])
    return all((raw[p >> 3] >> (p & 7)) & 1 for p in positions)


class ManifestParquetReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self._manifest_path = options.get("manifest")
        if not self._manifest_path:
            raise ValueError("manifest_parquet requires option 'manifest'")
        self._entries = []
        with open(self._manifest_path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    self._entries.append(json.loads(line))
        self._filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Record every single-column comparison for shard pruning + row
        filtering, then hand ALL filters back so Spark re-applies them —
        best-effort skipping, zero correctness exposure."""
        for f in filters:
            if isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, In)
            ) and len(f.attribute) == 1:
                self._filters.append(f)
        return iter(filters)

    def _survives(self, entry: dict) -> bool:
        stats = entry.get("stats") or {}
        blooms = entry.get("bloom") or {}
        for f in self._filters:
            col = f.attribute[0]
            if col in stats:
                lo, hi = stats[col]
                if not _interval_may_match(f, lo, hi):
                    return False
            if col in blooms:
                b = blooms[col]
                if isinstance(f, EqualTo) and not _bloom_may_contain(b, f.value):
                    return False
                if isinstance(f, In) and not any(
                    _bloom_may_contain(b, v) for v in f.value
                ):
                    return False
        return True

    def partitions(self) -> list[InputPartition]:
        return [_Shard(e["path"]) for e in self._entries if self._survives(e)]

    def read(self, partition: _Shard):
        import pyarrow.dataset as pads

        expr = None
        for f in self._filters:
            field = pads.field(f.attribute[0])
            if isinstance(f, EqualTo):
                e = field == f.value
            elif isinstance(f, GreaterThan):
                e = field > f.value
            elif isinstance(f, GreaterThanOrEqual):
                e = field >= f.value
            elif isinstance(f, LessThan):
                e = field < f.value
            elif isinstance(f, LessThanOrEqual):
                e = field <= f.value
            elif isinstance(f, In):
                e = field.isin(list(f.value))
            else:  # pragma: no cover — pushFilters only keeps the above
                continue
            expr = e if expr is None else expr & e
        ds = pads.dataset(partition.path, format="parquet")
        yield from ds.to_batches(filter=expr)


class ManifestParquetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        manifest = self.options.get("manifest")
        if not manifest:
            raise ValueError("manifest_parquet requires option 'manifest'")
        with open(manifest) as fh:
            first = json.loads(next(iter(fh)))
        return from_arrow_schema(pq.read_schema(first["path"]))

    def reader(self, schema: StructType) -> DataSourceReader:
        return ManifestParquetReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(ManifestParquetDataSource)


def write_manifest(
    shard_paths: list[str],
    stat_cols: list[str],
    out_path: str,
    bloom_cols: list[str] | None = None,
    bloom_fpp: float = 0.01,
) -> None:
    """Author a manifest over existing parquet shards, computing [min, max]
    stats for ``stat_cols`` from each file's parquet FOOTER (no data read)
    — the writer-side half of the skipping contract. ``bloom_cols`` adds a
    per-shard bloom filter per column (one column-read pass per shard —
    the standard write-amortized cost of bloom indexing; ~10 bits per
    distinct value at the default 1% fpp)."""
    import pyarrow.parquet as pq

    with open(out_path, "w") as fh:
        for p in shard_paths:
            md = pq.ParquetFile(p).metadata
            names = md.schema.names
            mins: dict = {}
            maxs: dict = {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    name = names[ci]
                    if name not in stat_cols or col.statistics is None:
                        continue
                    st = col.statistics
                    if not st.has_min_max:
                        continue
                    mins[name] = st.min if name not in mins else min(mins[name], st.min)
                    maxs[name] = st.max if name not in maxs else max(maxs[name], st.max)
            stats = {c: [mins[c], maxs[c]] for c in mins if c in maxs}
            entry: dict = {"path": os.path.abspath(p), "stats": stats}
            if bloom_cols:
                table = pq.read_table(p, columns=list(bloom_cols))
                entry["bloom"] = {
                    c: _bloom_build(
                        (v for v in table.column(c).to_pylist() if v is not None),
                        bloom_fpp,
                    )
                    for c in bloom_cols
                }
            fh.write(json.dumps(entry) + "\n")
