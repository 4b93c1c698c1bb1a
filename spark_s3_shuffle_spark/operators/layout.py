"""Z-order (Morton curve) table layout for multi-dimensional data skipping.

The reference delegates storage layout to its shuffle partition files
(one dimension: the partition id — `S3ShuffleDispatcher.scala:95-134`
maps blocks to a flat prefix-sharded namespace). Analytic tables want
more: a query that filters on TWO columns should be able to skip shards
on both. A single-column sort gives perfect pruning on one dimension and
none on the other; interleaving the bits of both columns (the Morton /
Z-order curve — the same layout `OPTIMIZE ZORDER BY` applies in
Delta/Iceberg compaction) makes every shard a small hyper-rectangle in
(a, b) space, so min/max stats prune meaningfully on BOTH predicates.

Everything here composes with the manifest_parquet source
(`sources/pydatasource.py`): the writer lays shards out along the
Z-curve and authors a manifest with per-shard min/max for each ordering
column; the reader prunes shards from the manifest alone.

Scale shape: the key is pure Column bit-arithmetic (codegen); the layout
write is one repartitionByRange on the key (a single exchange — identical
cost to any sorted write); manifest authoring reads parquet FOOTERS only.
At 100 TB this is a table-maintenance job amortized per corpus version,
exactly like a compaction pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into the integer grid [0, 2^bits): the Z-curve
    wants fixed-width non-negative ints. Values outside [lo, hi] clamp to
    the edge cells (stats stay correct — clamping only coarsens pruning)."""
    cells = (1 << bits) - 1
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo)) * cells
    return F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(cells)).cast("long")


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative ints:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1. Pure
    shift/and/or Column arithmetic — whole-stage codegen, no UDF."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return key


def write_zorder_layout(
    df: DataFrame,
    zkey: Column,
    stat_cols: list[str],
    root: str,
    num_shards: int = 8,
) -> str:
    """Write ``df`` as ``num_shards`` parquet shards laid out along
    ``zkey`` and author a manifest with per-shard [min, max] for
    ``stat_cols``. Returns the manifest path, readable via
    ``spark.read.format('manifest_parquet').option('manifest', …)``.

    Shard boundaries come from approxQuantile on the key (the same
    equi-depth split repartitionByRange computes); each shard is written
    by a key-range filter so shard membership is deterministic and the
    manifest maps 1:1 to files. At production scale the equivalent is one
    ``repartitionByRange(num_shards, zkey).write`` — this explicit loop
    exists so shard→file mapping is stable for the manifest author.
    """
    import os

    from spark_s3_shuffle_spark.sources.pydatasource import write_manifest

    keyed = df.withColumn("_zkey", zkey)
    if num_shards > 1:
        qs = keyed.stat.approxQuantile(
            "_zkey", [i / num_shards for i in range(1, num_shards)], 0.001
        )
        cuts = [float("-inf"), *qs, float("inf")]
    else:
        cuts = [float("-inf"), float("inf")]
    paths = []
    for i in range(num_shards):
        shard_dir = f"{root}/shard-{i}.parquet"
        part = keyed.filter(
            (F.col("_zkey") >= F.lit(cuts[i])) & (F.col("_zkey") < F.lit(cuts[i + 1]))
        ).drop("_zkey")
        part.coalesce(1).write.mode("overwrite").parquet(shard_dir)
        files = [f for f in os.listdir(shard_dir) if f.startswith("part-")]
        paths.append(os.path.join(shard_dir, files[0]))
    manifest = os.path.join(root, "manifest.jsonl")
    write_manifest(paths, stat_cols, manifest)
    return manifest
