"""Deduplication operators (SURVEY §2.2 B47/B48; north-star dedup tier).

Five strategies, all partition-parallel with no driver-side collection:

- exact:       hash-groupBy on a content digest — one shuffle keyed by
               digest; volume bounded by distinct-content count.
- minhash_lsh: shingle → minhash signature → band buckets → bucket-join.
               The candidate join is an equi-join on (band, band_hash), so
               only same-bucket pairs shuffle — never the O(n²) cross join.
- simhash:     64-bit simhash, near-dup = same value after masking; grouped
               equi-join, same scale shape as exact dedup.
- ngram_jaccard: exact Jaccard verification over candidate pairs produced
               by LSH (or any candidate generator).
- embedding:   cosine near-dup over LSH sign-buckets of an embedding col.

At 100 TB the only dangerous shape is pair verification; every strategy
here bounds candidate pairs by bucketing before any pairwise work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.functions.vector import cosine
from spark_s3_shuffle_spark.operators.text import shingles


# ---------------------------------------------------------------------------
# Exact dedup (B47)
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep the min-id row per distinct content (deterministic keep-first).

    Digest-first grouping: group on sha2 of the content instead of the raw
    (possibly megabyte-sized) content columns, so shuffle rows are ~90 bytes
    regardless of document size.
    """
    digest = F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]), 256)
    return (
        df.select(F.col(id_col), digest.alias("_digest"))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def drop_exact_dups(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Full-row variant: the deduplicated table itself (survivors join)."""
    keep = exact_dedup(df, content_cols, id_col)
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (B48)
# ---------------------------------------------------------------------------

def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as array<bigint>: per hash function i, the min over
    shingles of xxhash64(shingle, seed=i). Pure codegen expressions."""
    return F.array(*[
        F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ])


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    rows(num_hashes/bands per band) → band hash → equi-join on
    (band_id, band_hash). Returns distinct (a, b) id pairs with a < b.

    Scale: the exploded frame is ``bands×`` the corpus in *rows* but each row
    is (id, band_id, hash) ≈ 24 bytes; the self-join shuffles on the band
    hash, so co-bucket skew (a viral duplicate cluster) is the one hazard —
    AQE skew-join handles moderate skew, and pathological buckets can be
    capped with a per-bucket count filter.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(shingles(F.col(text_col), shingle_n), num_hashes)
    banded = df.select(F.col(id_col).alias("_id"), sig.alias("_sig")).select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.concat_ws(",", *[
                        F.element_at("_sig", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ])).alias("bhash"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bhash")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("a"), F.col("r._id").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate (a, b) pairs.

    Joins the shingle sets back onto the (already-bounded) candidate list,
    so pairwise cost is O(|candidates|), not O(n²).
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    out = (
        candidates.join(sh.withColumnRenamed("_id", "a").withColumnRenamed("_sh", "sh_a"), "a")
        .join(sh.withColumnRenamed("_id", "b").withColumnRenamed("_sh", "sh_b"), "b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("uni", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.round(F.col("inter") / F.col("uni"), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup removal: LSH candidates → exact Jaccard verify →
    drop the larger id of each confirmed pair (transitive-lite policy:
    anything confirmed-similar to a smaller id is dropped; full
    connected-components clustering is a later milestone)."""
    cand = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands)
    confirmed = ngram_jaccard_pairs(df, cand, id_col, text_col, 3, jaccard_threshold)
    losers = confirmed.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash (B48 variant)
# ---------------------------------------------------------------------------

def simhash64(text_col: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash over word shingles, as a single codegen expression:
    per bit b, sign(sum over shingles of bit b of xxhash64(shingle)).
    """
    sh = shingles(text_col, shingle_n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    bit_exprs = []
    for b in range(64):
        # +1 when bit set, -1 otherwise; majority vote → bit b of simhash.
        vote = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        bit_exprs.append(F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0)).alias(f"b{b}"))
    sim = F.lit(0).cast("long")
    for b, bit in enumerate(bit_exprs):
        sim = sim.bitwiseOR(F.shiftleft(bit, b))
    return sim


def simhash_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup removal where similarity = identical simhash (Hamming-0
    buckets; Hamming-k would LSH over rotated bit-blocks the same way).
    Keep min id per simhash bucket — identical scale shape to exact dedup."""
    with_sim = df.withColumn("_simhash", simhash64(F.col(text_col)))
    keep = with_sim.groupBy("_simhash").agg(F.min(id_col).alias(id_col)).select(id_col)
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (B48 embedding variant)
# ---------------------------------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-dup candidates via random-hyperplane (sign) LSH.

    Bucket key = sign bits of <v, r_i> for deterministic pseudo-random
    planes r_i (derived from xxhash64 of (dim index, seed) — no Python
    RNG, fully reproducible across executors). Pairs are only compared
    within a bucket; verification = exact cosine ≥ threshold.
    """
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    def plane_dot(plane: int) -> Column:
        # pseudo-random ±1 component per (dimension, plane): parity of xxhash64
        signs = F.transform(
            dim_idx,
            lambda i: F.when(F.pmod(F.xxhash64(i, F.lit(plane), F.lit(seed)), 2) == 0, F.lit(1.0)).otherwise(F.lit(-1.0)),
        )
        return F.aggregate(
            F.zip_with(F.col(vec_col), signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    bucket = F.concat_ws("", *[F.when(plane_dot(p) >= 0, F.lit("1")).otherwise(F.lit("0")) for p in range(num_planes)])
    b = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), bucket.alias("_bucket"))
    left, right = b.alias("l"), b.alias("r")
    return (
        left.join(right, (F.col("l._bucket") == F.col("r._bucket")) & (F.col("l._id") < F.col("r._id")))
        .withColumn("cos", F.round(cosine(F.col("l._v"), F.col("r._v")), 4))
        .filter(F.col("cos") >= threshold)
        .select(F.col("l._id").alias("a"), F.col("r._id").alias("b"), "cos")
    )
