"""Materialized summary tables + aggregate navigation (OLAP rollup cache).

The reference's benchmark surface is TPC-DS reporting SQL over Parquet
(reference: examples/run_benchmarks.sh:29-34, examples/sql/
run_single_query.sh:22-28); production deployments of exactly those
reporting shapes answer dashboards from summary tables, not the raw fact.
This module provides the engine-side primitive: materialize ONE partial
aggregate at the finest grain the downstream rollups share, then answer
every coarser grouping by re-aggregating the summary.

Scale design (the whole point at 100 TB):

- The summary holds ALGEBRAIC aggregate components only — SUM terms and
  COUNT — never finished averages. Any coarser grain recombines them
  (sum of sums, sum of counts; AVG derived as SUM/COUNT at read time),
  which is exact: the rollup of the summary equals direct fact
  aggregation bit-for-bit because the components are exact decimals.
- Build cost is one fact scan + one exchange keyed on the grain. Summary
  size is bounded by grain cardinality (|flags| x |statuses| x |months| —
  thousands of rows at ANY fact scale), so every query answered from it
  afterwards reads kilobytes instead of the 100 TB fact.
- The summary is plain partitioned Parquet: at cluster scale it lives on
  the same object store as the materialized exchange (one immutable
  object tree, any later consumer), and incremental refresh is "rebuild
  the months the new data touched" — month is in the grain precisely so
  refresh prunes to changed partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Finest shared grain of the lineitem reporting rollups: month keeps the
#: summary incrementally refreshable (new data only touches recent months)
#: while flag/status serve the TPC-H Q1-family groupings.
SUMMARY_GRAIN = ["l_returnflag", "l_linestatus", "ship_month"]

#: Algebraic component columns the summary carries (all exact decimals or
#: longs, so re-aggregation is associative and engine-independent).
SUMMARY_COMPONENTS = ["sum_qty", "sum_base_price", "sum_disc_price", "n_rows"]


def build_lineitem_summary(li: DataFrame) -> DataFrame:
    """One fact pass -> partial aggregate at SUMMARY_GRAIN.

    Components are exact: quantities/prices cast to DECIMAL(18,6) before
    summation, so SUM is associative across any regrouping and both Spark
    and a SQL oracle agree without float-order hazards.
    """
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.withColumn("ship_month", F.date_trunc("month", F.col("l_shipdate")))
        .groupBy(*SUMMARY_GRAIN)
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def navigate(summary: DataFrame, keys: list[str]) -> DataFrame:
    """Aggregate navigation: answer a coarser grouping FROM the summary.

    ``keys`` must be a subset of SUMMARY_GRAIN. Components recombine as
    sums; finished measures (averages) are derived by the caller from the
    recombined components — deriving them here would freeze the grain.
    """
    unknown = [k for k in keys if k not in SUMMARY_GRAIN]
    if unknown:
        raise ValueError(f"keys {unknown} not in summary grain {SUMMARY_GRAIN}")
    return summary.groupBy(*keys).agg(
        F.sum("sum_qty").alias("sum_qty"),
        F.sum("sum_base_price").alias("sum_base_price"),
        F.sum("sum_disc_price").alias("sum_disc_price"),
        F.sum("n_rows").alias("n_rows"),
    )


def navigate_derived(summary: DataFrame, keys: dict[str, Column]) -> DataFrame:
    """Aggregate navigation at a grain DERIVED from the summary grain —
    e.g. ``{"ship_year": F.year("ship_month")}``: any deterministic
    function of grain columns induces a coarser partition of the fact
    rows, so the algebraic components recombine exactly as in
    :func:`navigate` (sum of sums / sum of counts). The query still reads
    ONLY the summary (plan-asserted in tests) — a year rollup at 100 TB
    touches |months| summary rows, never the fact.

    ``keys`` maps output column name -> expression over SUMMARY_GRAIN
    columns. Expressions referencing non-grain columns fail resolution on
    the summary projection, so mistakes surface as analysis errors."""
    projected = summary.select(
        *[expr.alias(name) for name, expr in keys.items()], *SUMMARY_COMPONENTS
    )
    return projected.groupBy(*keys.keys()).agg(
        F.sum("sum_qty").alias("sum_qty"),
        F.sum("sum_base_price").alias("sum_base_price"),
        F.sum("sum_disc_price").alias("sum_disc_price"),
        F.sum("n_rows").alias("n_rows"),
    )


def refresh_summary(summary: DataFrame, delta_fact: DataFrame) -> DataFrame:
    """Incremental maintenance: fold a NEW fact slice into an existing
    summary without re-scanning history.

    Because the components are associative (exact-decimal sums + counts),
    ``refresh(build(A), B) == build(A ∪ B)`` exactly — the algebraic
    property registry q115 proves under a raw-fact oracle. Cost is one
    scan of the DELTA only, plus a regroup over |summary| + |delta
    summary| rows (thousands at any fact scale — never the fact). Month
    in the grain is what makes the STORAGE side incremental: a
    month-partitioned summary sink only rewrites the partitions the delta
    touched.

    Components re-cast to their build dtypes so repeated refreshes keep a
    stable schema instead of escalating decimal precision each round.
    """
    delta = build_lineitem_summary(delta_fact)
    merged = summary.unionByName(delta).groupBy(*SUMMARY_GRAIN).agg(
        F.sum("sum_qty").cast("decimal(28,6)").alias("sum_qty"),
        F.sum("sum_base_price").cast("decimal(28,6)").alias("sum_base_price"),
        F.sum("sum_disc_price").cast("decimal(28,6)").alias("sum_disc_price"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )
    return merged
