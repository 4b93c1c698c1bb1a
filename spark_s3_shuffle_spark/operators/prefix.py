"""Distributed prefix aggregates over a global total order (round-6 tier).

An unpartitioned ``Window.orderBy(...)`` is exact but drags the ENTIRE
frame through one task (Spark's own WindowExec warning: "No Partition
Defined ... Moving all data to a single partition") — the straggler that
kills per-entity analytics (RFM quartiles, Pareto frontiers, cumulative
shares) the moment the entity count scales 100×. The reference hits the
same wall in any sort-reduce it cannot range-partition; its TeraSort
path (`examples/terasort/run.sh:157-191`) exists precisely because
total order must be RANGE-SHARDED to scale.

This module is the shared two-phase fix, exact to the row:

1. ``repartitionByRange(order)`` — the same sampled range exchange a
   total sort uses — then pin each row's range-partition id.
2. Per-partition running aggregate: a ``Window.partitionBy(pid)`` whose
   tasks each hold ONE range shard (~n/P rows), never the whole frame.
3. A per-partition summary (ONE row per shard) is folded into exclusive
   prefix offsets by a window over the P-row summary table — thousands
   of rows at 100 TB, not data rows (the ``validate_total_sort``
   boundary trick, `relational.py:161`).
4. Broadcast the offsets back and combine: offset + local running value
   reproduces the single-task window's output bit-for-bit, because the
   range exchange guarantees every row of shard i precedes every row of
   shard i+1 in the total order.

Cost: two data-sized exchanges of the (already aggregated, narrow)
frame instead of one single-task sort — the difference between a
bounded ~n/P task and a 10⁸-row straggler. All arithmetic stays in the
source column's exact type (decimal sums stay decimal), so DuckDB
oracles replay results hash-identically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__range_pid"
_LOCAL = "__local_run"
_PREV = "__prev_off"


def _with_range_pid(df: DataFrame, order: Sequence[Column | str]) -> DataFrame:
    """Range-exchange ``df`` on the total order and pin each row's range
    partition id. ``spark_partition_id()`` is non-deterministic to
    Catalyst, so the projection cannot be pushed through the exchange —
    the pid observed is always the RANGE partition, by construction.

    The pinned frame is local-checkpointed (eager=False): every prefix
    primitive forks it (the running-window branch AND the per-shard
    summary branch), and the same non-determinism that pins the pid also
    blocks Catalyst's ReuseExchange canonicalization, so without
    materialization each fork would replay the range exchange — with
    freshly-sampled (possibly different) range boundaries, corrupting the
    pid↔offset correspondence. ``localCheckpoint`` truncates lineage so
    both forks read the SAME materialized shards, and — unlike
    ``persist()`` — registers nothing in Catalyst's CacheManager: the
    blocks are released by the ContextCleaner as soon as the caller drops
    the result DataFrame, so a bench sweep over dozens of prefix queries
    accumulates nothing for the session lifetime. The frame is the
    narrow per-entity aggregate (not the fact table).

    Fault-tolerance trade: ``localCheckpoint`` stores blocks on executor
    LOCAL storage and truncates lineage, so on a cluster the loss of an
    executor after materialization makes its blocks unrecoverable — the
    query fails and must be retried at job level, where ``persist()``
    would have allowed partition recompute. Acceptable here because the
    pinned frame is the narrow per-entity aggregate (cheap to re-run
    end-to-end) and the alternative leaks CacheManager entries across a
    sweep; callers running long multi-tenant jobs on preemptible
    executors should expect job-level retry semantics for the prefix
    primitives."""
    return (
        df.repartitionByRange(*order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )


def _exclusive_prefix(summary: DataFrame, value: Column) -> DataFrame:
    """Fold per-shard summary rows (one per range partition) into each
    shard's EXCLUSIVE prefix aggregate over pid order. This window is
    deliberately single-task — but over |partitions| rows (thousands at
    100 TB), never data rows. It is keyed on ``pmod(pid, 1)`` (constant 0,
    but non-foldable so Catalyst keeps the partition spec) rather than
    left unpartitioned: the produced plan then carries a real partition
    key, so WindowExec's "Moving all data to a single partition" warning
    — the canary the plan audit greps for — only ever fires for
    windows that genuinely funnel DATA-sized frames."""
    w = (
        Window.partitionBy(F.pmod(F.col(_PID), F.lit(1)))
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return summary.select(_PID, value.over(w).alias(_PREV))


def _row_number_pieces(
    df: DataFrame, order: Sequence[Column | str], out: str
) -> tuple[DataFrame, DataFrame]:
    """Shared internals: (numbered frame, per-shard counts). The counts
    branch is a plain per-pid count over the cached pinned frame — it
    never replays the window sort."""
    d = _with_range_pid(df, order)
    w = Window.partitionBy(_PID).orderBy(*order)
    local = d.withColumn(_LOCAL, F.row_number().over(w))
    counts = d.groupBy(_PID).agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    offs = _exclusive_prefix(counts, F.sum("_cnt"))
    numbered = (
        local.join(F.broadcast(offs), _PID)
        .withColumn(out, F.coalesce(F.col(_PREV), F.lit(0)) + F.col(_LOCAL))
        .drop(_PID, _LOCAL, _PREV)
    )
    return numbered, counts


def global_row_number(
    df: DataFrame, order: Sequence[Column | str], out: str = "rn"
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order)`` without a
    single-partition window: local row_number per range shard + broadcast
    row-count offsets of all preceding shards. ``order`` must be a total
    order (include a tiebreaker column) for a deterministic result."""
    numbered, _ = _row_number_pieces(df, order, out)
    return numbered


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order: Sequence[Column | str],
    out: str = "bucket",
) -> DataFrame:
    """Exact global ``NTILE(k) OVER (ORDER BY order)``, distributed.

    NTILE is a pure function of the global row number and the total row
    count n — with q = n DIV k and r = n MOD k, buckets 1..r hold q+1
    rows and buckets r+1..k hold q (the SQL-standard fill both Spark and
    DuckDB implement) — so computing rn via :func:`global_row_number`
    and applying that closed form in integer arithmetic reproduces the
    single-task NTILE bit-for-bit at any partitioning. The total n rides
    in as a 1-row broadcast, never a ``SUM() OVER ()``.
    """
    rn, counts = _row_number_pieces(df, order, out="__rn")
    total = counts.agg(F.sum("_cnt").alias("__n"))
    d = rn.crossJoin(F.broadcast(total))
    q = F.expr(f"__n DIV {n_buckets}")
    r = F.expr(f"__n % {n_buckets}")
    big = r * (q + 1)  # rows living in the q+1-sized leading buckets
    bucket = (
        F.when(
            F.col("__rn") <= big,
            F.expr(f"(__rn - 1) DIV (__n DIV {n_buckets} + 1) + 1"),
        )
        .otherwise(
            r + F.expr(
                f"(__rn - 1 - (__n % {n_buckets}) * (__n DIV {n_buckets} + 1))"
                f" DIV (__n DIV {n_buckets}) + 1"
            )
        )
        .cast("int")
    )
    return d.withColumn(out, bucket).drop("__rn", "__n")


def running_sum(
    df: DataFrame,
    order: Sequence[Column | str],
    value_col: str,
    out: str = "cum",
) -> DataFrame:
    """Exact global ``SUM(value) OVER (ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` — per-shard running sum + broadcast exclusive prefix of
    the shard totals. Sums stay in the source column's exact type
    (decimal in, decimal out), so cumulative-share cutoffs replay
    hash-identically on the oracle."""
    d = _with_range_pid(df, order)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn(_LOCAL, F.sum(value_col).over(w))
    totals = d.groupBy(_PID).agg(F.sum(value_col).alias("_t"))
    offs = _exclusive_prefix(totals, F.sum("_t"))
    combined = F.when(
        F.col(_PREV).isNull(), F.col(_LOCAL)
    ).otherwise(F.col(_PREV) + F.coalesce(F.col(_LOCAL), F.lit(0)))
    return (
        local.join(F.broadcast(offs), _PID)
        .withColumn(out, combined)
        .drop(_PID, _LOCAL, _PREV)
    )


def running_max_strictly_preceding(
    df: DataFrame,
    order: Sequence[Column | str],
    value_col: str,
    out: str = "prev_max",
) -> DataFrame:
    """Exact global ``MAX(value) OVER (ORDER BY order ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` — the dominance probe of
    skyline/frontier queries. NULL for the global first row (no
    preceding rows), exactly as the single-task window; ``greatest``
    null-skips, so the shard-prefix max and the local strict-preceding
    max combine without special cases."""
    d = _with_range_pid(df, order)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = d.withColumn(_LOCAL, F.max(value_col).over(w))
    totals = d.groupBy(_PID).agg(F.max(value_col).alias("_t"))
    offs = _exclusive_prefix(totals, F.max("_t"))
    return (
        local.join(F.broadcast(offs), _PID)
        .withColumn(out, F.greatest(F.col(_PREV), F.col(_LOCAL)))
        .drop(_PID, _LOCAL, _PREV)
    )
