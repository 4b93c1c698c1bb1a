"""Iterative graph algorithms as DataFrame algebra (round-5 tier).

The reference has no graph surface (it is a batch shuffle plugin whose
workloads are TPC-DS SQL and TeraSort — SURVEY §0/§3), but an iterative
fixed-point computation is the canonical stress test of a shuffle layer:
every PageRank step is exactly the map-side-combined exchange the
reference's S3 writer materializes (`S3ShuffleMapOutputWriter.scala`,
cited per SURVEY A2). This module expresses the iteration Spark-first —
joins + aggregations per step, no RDDs, no driver-side loops over data.

Determinism: ranks are kept in FIXED-POINT integer arithmetic (scaled
bigints, truncating division) so every step is exact — no float
summation order anywhere — which is what lets a DuckDB oracle replay a
fixed-iteration run bit-for-bit (registry q137). The trade-off (rank
mass truncated by <= 1 unit per edge per step) is a deliberate part of
the declared semantics, identical on both engines.

Scale shape per iteration: the rank frame is |nodes| rows — broadcast
into the edge join (no shuffle of the edge table after the initial
edge-weight build) — and the contribution aggregate is a map-side-
combined exchange carrying at most |nodes| rows per upstream partition.
With E edges and N nodes per iteration cost is one scan of the cached
edge frame + one bounded exchange; nothing is quadratic and nothing
round-trips through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale: ranks are stored as r * 2^0 * 10^12 bigints.
SCALE = 10**12


def edge_weights(pairs: DataFrame, src: str, dst: str) -> DataFrame:
    """Collapse raw (src, dst) pair observations into a weighted edge
    list ``(src, dst, w)`` — one row per distinct edge."""
    return (
        pairs.groupBy(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Fixed-iteration weighted PageRank over an ``(src, dst, w)`` edge
    list, entirely in scaled-integer arithmetic.

    Per step, for each node d:
        r'(d) = (1-a)*SCALE  +  a * sum over in-edges (s,d) of
                                  floor(r(s) * w(s,d) / out_w(s))
    with a = damping_num/damping_den applied as exact integer
    ``(num * x) DIV den``. Dangling nodes (no out-edges) simply do not
    contribute (their mass is truncated — the declared variant; both
    engines agree). Returns ``(n, r)`` with ``r`` the scaled bigint rank.

    The node set, out-weights, and the joined edge frame are computed
    once and reused across iterations; the rank frame (|nodes| rows) is
    broadcast into each step's edge join so the edge table never
    reshuffles after its initial build.
    """
    nodes = (
        edges.select(F.col("src").alias("n"))
        .unionByName(edges.select(F.col("dst").alias("n")))
        .distinct()
        .persist()
    )
    # The edge frame is scanned once per iteration: persist it so each
    # step reads the materialized (src, dst, w, ow) partitions instead of
    # re-planning the whole upstream lineage (standard practice for
    # iterative graph jobs; Spark evicts LRU if memory is tight).
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    e = edges.join(outw, "src").select("src", "dst", "w", "ow").persist()
    # |nodes| as a 1-row broadcast frame — no driver-side count action.
    nn = nodes.agg(F.count(F.lit(1)).alias("nn"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "n", F.expr(f"CAST({SCALE} AS BIGINT) DIV nn").alias("r")
    )
    base = SCALE * (damping_den - damping_num) // damping_den
    for _ in range(iterations):
        contrib = (
            e.join(
                F.broadcast(ranks.withColumnRenamed("n", "src")), "src"
            )
            # r is ~SCALE (1e12) and w an unbounded observation count, so
            # the product can exceed 2^63 at full corpus scale; accumulate
            # it in decimal(38,0) (the sketch modules' exact-arithmetic
            # style) so the truncating division stays exact instead of
            # silently wrapping in non-ANSI mode. IntegralDivide on
            # decimals still yields the bigint quotient both engines agree
            # on.
            .select(
                "dst",
                F.expr("(CAST(r AS DECIMAL(38,0)) * w) DIV ow").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(
                F.broadcast(contrib), nodes["n"] == contrib["dst"], "left"
            )
            .select(
                "n",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_num} * coalesce(contrib, CAST(0 AS BIGINT)))"
                        f" DIV {damping_den}"
                    )
                ).alias("r"),
            )
        )
    return ranks
