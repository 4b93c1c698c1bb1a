"""Similarity search over embedding columns (SURVEY §2.2 B49; north-star).

Two tiers:

- ``cosine_topk``      — brute-force exact top-k: one scan, per-partition
                         k-heaps via TakeOrderedAndProject. The correctness
                         baseline; O(n·d) work, O(k) result movement.
- ``ivf_topk``         — IVF-style approximate top-k: assign every vector to
                         its nearest of C centroids (broadcast), prune to
                         the probe's ``nprobe`` nearest cells, then
                         brute-force only within those cells. The scan is
                         cut by ~nprobe/C; this is the 100 TB path.
- ``lsh_bucket_topk``  — sign-LSH bucketed variant sharing the bucketing
                         used by embedding near-dup.

The probe vector is carried as a broadcast 1-row frame — never collected to
a Python literal — so the same code runs when "probe" is a million-row query
table (it becomes a broadcast or shuffled join on the cell key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.functions.vector import cosine


def _as_double(col: Column) -> Column:
    """float32 → float64 so Spark and oracle accumulate at the same width."""
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    vectors: DataFrame,
    probe: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k of ``vectors`` against a 1-row probe.

    Returns (vec_id, cos) with cos rounded to 4 (FIXTURES §4 rule 2),
    ordered cos DESC then id. The crossJoin broadcasts the single probe row;
    Catalyst fuses the whole score computation into the scan stage and
    TakeOrderedAndProject keeps only k rows per partition.
    """
    p = F.broadcast(probe.select(_as_double(F.col(probe_vec_col)).alias("_probe")))
    return (
        vectors.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
        .crossJoin(p)
        .select(id_col, F.round(cosine(F.col("_v"), F.col("_probe")), 4).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def kmeans_like_centroids(
    vectors: DataFrame,
    num_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iterations: int = 2,
) -> DataFrame:
    """Deterministic centroid table for IVF: seed centroids from hash-sampled
    rows (id hash mod num_cells == 0 pattern), then a couple of Lloyd
    iterations as groupBy-average — all DataFrame ops, no MLlib dependency,
    no driver collect. Returns (cell, centroid array<double>)."""
    v = vectors.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
    # deterministic seed assignment: cell = xxhash64(id) mod num_cells
    assigned = v.withColumn("cell", F.pmod(F.xxhash64(F.col("_id")), F.lit(num_cells)).cast("int"))
    for _ in range(iterations):
        # per-cell mean vector via posexplode → (cell, pos) avg → re-assemble
        centroids = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda s: s.getField("m")).alias("centroid"))
        )
        bc = F.broadcast(centroids)
        scored = v.crossJoin(bc).withColumn("cos", cosine(F.col("_v"), F.col("centroid")))
        w_best = (
            scored.groupBy("_id")
            .agg(F.max(F.struct(F.col("cos"), F.col("cell"))).alias("best"))
            .select("_id", F.col("best.cell").alias("cell"))
        )
        assigned = v.join(w_best, "_id")
    return (
        assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s.getField("m")).alias("centroid"))
    )


def ivf_topk(
    vectors: DataFrame,
    probe: DataFrame,
    k: int = 10,
    num_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only vectors in the ``nprobe`` cells
    nearest the probe. At 100 TB the cell assignment is precomputed once and
    stored as a partition column, making the probe-time scan
    partition-pruned to nprobe/num_cells of the data."""
    centroids = kmeans_like_centroids(vectors, num_cells, id_col, vec_col, iterations=1)
    bc_cent = F.broadcast(centroids)
    v = vectors.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    assigned = (
        v.crossJoin(bc_cent)
        .withColumn("cos_c", cosine(F.col("_v"), F.col("centroid")))
        .groupBy(id_col)
        .agg(F.max(F.struct("cos_c", "cell")).alias("best"))
        .select(id_col, F.col("best.cell").alias("cell"))
    )
    p = probe.select(_as_double(F.col(vec_col)).alias("_probe"))
    probe_cells = F.broadcast(
        p.crossJoin(bc_cent)
        .withColumn("cos_c", cosine(F.col("_probe"), F.col("centroid")))
        .orderBy(F.col("cos_c").desc())
        .limit(nprobe)
        .select("cell")
    )
    candidates = v.join(assigned, id_col).join(probe_cells, "cell", "left_semi")
    return (
        candidates.crossJoin(F.broadcast(p))
        .select(id_col, F.round(cosine(F.col("_v"), F.col("_probe")), 4).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )
