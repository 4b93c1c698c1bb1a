"""RDD K/V-shuffle parity layer (SURVEY §2.2 Tier-B RDD ops, §7 M6).

Thin wrappers mirroring the exact operator surface the reference's test
suite validates (reference: S3ShuffleManagerTest.scala):

- foldByKey        (:44-54, :176-205)
- groupByKey       (:56-73, asserts no map-side combine)
- combineByKey     (:103-144)
- sortByKey w/ explicit partition count + sortedness (:146-174)
- sortBy           (:75-101 forced sort shuffle)

These exist for API parity and for tests that assert computed-expected
values the way the reference does. The DataFrame API is the primary
surface — each wrapper documents its declarative equivalent, which is what
a 100 TB job should use (partial aggregation, AQE, codegen).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, TypeVar

from pyspark.rdd import RDD

K = TypeVar("K")
V = TypeVar("V")
C = TypeVar("C")


def fold_by_key(rdd: RDD, zero: V, func: Callable[[V, V], V], num_partitions: int | None = None) -> RDD:
    """foldByKey — DataFrame equivalent: ``df.groupBy(k).agg(F.sum(v))``.
    Map-side combine is on (the reference asserts ``dep.mapSideCombine``)."""
    return rdd.foldByKey(zero, func, num_partitions)


def combine_by_key(
    rdd: RDD,
    create_combiner: Callable[[V], C],
    merge_value: Callable[[C, V], C],
    merge_combiners: Callable[[C, C], C],
    num_partitions: int | None = None,
) -> RDD:
    """combineByKey — the general custom-combiner shape (UDAF analogue)."""
    return rdd.combineByKey(create_combiner, merge_value, merge_combiners, num_partitions)


def reduce_by_key(rdd: RDD, func: Callable[[V, V], V], num_partitions: int | None = None) -> RDD:
    """reduceByKey — foldByKey without a zero value; map-side combine on.
    DataFrame equivalent: ``df.groupBy(k).agg(<assoc agg>)``."""
    return rdd.reduceByKey(func, num_partitions)


def aggregate_by_key(
    rdd: RDD,
    zero: C,
    seq_func: Callable[[C, V], C],
    comb_func: Callable[[C, C], C],
    num_partitions: int | None = None,
) -> RDD:
    """aggregateByKey — combineByKey with a zero value instead of a
    create-combiner fn (the shape Spark's own foldByKey/reduceByKey are
    built from)."""
    return rdd.aggregateByKey(zero, seq_func, comb_func, num_partitions)


def group_by_key(rdd: RDD, num_partitions: int | None = None) -> RDD:
    """groupByKey — NO map-side combine: every value crosses the wire.
    At scale prefer aggregation; this exists for parity with the
    reference's no-mapSideCombine test path."""
    return rdd.groupByKey(num_partitions)


def sort_by_key(rdd: RDD, ascending: bool = True, num_partitions: int | None = None) -> RDD:
    """sortByKey w/ explicit partition count — range-partition (sampled
    bounds) + per-partition sort; the TeraSort path."""
    return rdd.sortByKey(ascending, num_partitions)


def sort_by(rdd: RDD, keyfunc: Callable[[Any], Any], ascending: bool = True, num_partitions: int | None = None) -> RDD:
    return rdd.sortBy(keyfunc, ascending, num_partitions)


def is_globally_sorted(rdd: RDD, keyfunc: Callable[[Any], Any] = lambda kv: kv[0]) -> bool:
    """RDD-layer sortedness check (TeraValidate analogue,
    examples/terasort/run.sh:161-191): verify each partition is internally
    sorted and partition boundaries are non-decreasing. Only per-partition
    (first, last, ok) triples reach the driver — but the scan itself is
    per-row Python, so this exists ONLY for RDD API-parity tests. The
    engine/query path uses the Arrow-vectorized DataFrame twin,
    ``operators.relational.validate_total_sort``."""

    def partition_summary(idx: int, it):
        first = last = None
        ok = True
        prev = None
        for item in it:
            k = keyfunc(item)
            if first is None:
                first = k
            if prev is not None and k < prev:
                ok = False
            prev = k
            last = k
        yield (idx, first, last, ok)

    summaries = sorted(rdd.mapPartitionsWithIndex(partition_summary).collect())
    prev_last = None
    for _, first, last, ok in summaries:
        if not ok:
            return False
        if first is None:
            continue
        if prev_last is not None and first < prev_last:
            return False
        prev_last = last
    return True
