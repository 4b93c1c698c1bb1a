"""Window functions: ranking, analytic, frame aggregates (B22–B24).

TPC-DS q67's ``rank() over (partition by … order by sumsales)`` is the
reference's window workload; these helpers cover that plus lag/lead and
running frames.

Scale note: a window = one hash exchange on the partition keys + one sort
within partitions. Partition keys must have enough cardinality to spread
(a window partitioned by a constant serializes the whole table through one
task); AQE skew handling does NOT split window partitions, so skewed window
keys need pre-salting at the caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def spec(partition_by: Sequence[str | Column], order_by: Sequence[str | Column]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def ranked(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
    rank_fn: Column | None = None,
    out: str = "rk",
) -> DataFrame:
    """Attach rank()/row_number()/dense_rank() over a partitioned sort
    (q67 shape)."""
    w = spec(partition_by, order_by)
    fn = rank_fn if rank_fn is not None else F.rank()
    return df.withColumn(out, fn.over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
    k: int,
    out: str = "rk",
) -> DataFrame:
    """Per-group top-k via rank filter — one shuffle on the group keys; the
    rank filter runs streaming over the sorted partition, so memory is O(1)
    per group regardless of group size."""
    return ranked(df, partition_by, order_by, F.rank(), out).filter(F.col(out) <= k)


def with_lag(
    df: DataFrame,
    col: str | Column,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
    offset: int = 1,
    default=None,
    out: str = "lag",
) -> DataFrame:
    return df.withColumn(out, F.lag(col, offset, default).over(spec(partition_by, order_by)))


def running_agg(
    df: DataFrame,
    agg_col: Column,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
    out: str = "run",
) -> DataFrame:
    """Running aggregate over ROWS UNBOUNDED PRECEDING..CURRENT ROW."""
    w = spec(partition_by, order_by).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, agg_col.over(w))
