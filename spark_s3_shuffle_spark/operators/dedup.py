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
- embedding:   cosine near-dup over sign-LSH buckets of an embedding col.

Implementation shape matters as much as the algorithm: signatures are
computed via ``explode(shingles) → hash-aggregate`` rather than per-row
array expressions, so each shingle is hashed once (Catalyst does not CSE a
shared subexpression across N aggregate lambdas — the per-row formulation
re-walks the shingle array per hash function and is 100× slower). The
exploded frame never shuffles by shingle — aggregation is keyed by doc id
with map-side partial min/sum, so shuffle volume is rows × signature
width, independent of document length.

At 100 TB the only dangerous shape is pair verification; every strategy
here bounds candidate pairs by bucketing before any pairwise work.
"""

from __future__ import annotations

import hashlib

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
# Shared: exploded shingle frame
# ---------------------------------------------------------------------------

def _shingle_rows(df: DataFrame, id_col: str, text_col: str, shingle_n: int, distinct: bool = True) -> DataFrame:
    """(id, shingle) rows — one explode, shingles built exactly once."""
    sh = shingles(F.col(text_col), shingle_n)
    if distinct:
        sh = F.array_distinct(sh)
    return df.select(F.col(id_col).alias("_id"), F.explode(sh).alias("_s"))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (B48)
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    """Per-doc MinHash signature as columns ``h0..h{n-1}``.

    explode → xxhash64(shingle, seed=i) → groupBy(id).min(hᵢ): each shingle
    is hashed ``num_hashes`` times total (cheap 64-bit mixes of a short
    string), and the partial-min aggregation means the shuffle carries one
    signature row per document.
    """
    rows = _shingle_rows(df, id_col, text_col, shingle_n)
    return rows.groupBy("_id").agg(
        *[F.min(F.xxhash64("_s", F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    bands × (num_hashes/bands rows) → band hash → self-equi-join on
    (band_id, band_hash). Returns distinct (a, b) id pairs with a < b.

    Scale: the banded frame is ``bands×`` the corpus in rows but each row is
    (id, band, hash) ≈ 24 bytes; the self-join shuffles on the band hash, so
    co-bucket skew (a viral duplicate cluster) is the one hazard — AQE
    skew-join handles moderate skew, and pathological buckets can be capped
    with a per-bucket count filter.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("bhash"),
        )
        for b in range(bands)
    ])
    banded = sig.select("_id", F.explode(band_structs).alias("bb")).select("_id", "bb.band", "bb.bhash")
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

def simhash_frame(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    shingle_n: int = 2,
    out: str = "_simhash",
) -> DataFrame:
    """(id, simhash) frame: per bit b, the sign of the sum over shingle
    hashes of (bit b set ? +1 : -1).

    explode → one xxhash per shingle → ``bits`` partial-sum aggregates →
    bit-assemble. All JVM-side; shuffle carries one vote row per doc.
    """
    h = F.xxhash64("_s")
    votes = _shingle_rows(df, id_col, text_col, shingle_n, distinct=False).groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = sim.bitwiseOR(F.shiftleft(bit, b))
    return votes.select(F.col("_id").alias(id_col), sim.alias(out))


def simhash_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Near-dup removal where similarity = identical simhash (Hamming-0
    buckets; Hamming-k would LSH over rotated bit-blocks the same way).
    Keep min id per simhash bucket — identical scale shape to exact dedup."""
    with_sim = simhash_frame(df, id_col, text_col)
    keep = with_sim.groupBy("_simhash").agg(F.min(id_col).alias(id_col)).select(id_col)
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (B48 embedding variant)
# ---------------------------------------------------------------------------

def _plane_signs(dim: int, plane: int, seed: int) -> list[float]:
    """Deterministic ±1 plane components — derived from sha256 of
    (plane, dim-index, seed) so every executor/ session agrees without any
    RNG state; embedded as literals so per-row work is just a dot product."""
    out = []
    for i in range(dim):
        digest = hashlib.sha256(f"{plane}:{i}:{seed}".encode()).digest()
        out.append(1.0 if digest[0] % 2 == 0 else -1.0)
    return out


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Cosine near-dup candidates via random-hyperplane (sign) LSH.

    Bucket key = sign bits of <v, rᵢ> for deterministic pseudo-random planes
    rᵢ. Pairs are only compared within a bucket; verification = exact
    cosine ≥ threshold. ``dim`` is peeked from one row when not given.
    """
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(first["d"]) if first else 0
    def plane_dot(plane: int) -> Column:
        signs = F.array(*[F.lit(s) for s in _plane_signs(dim, plane, seed)])
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
