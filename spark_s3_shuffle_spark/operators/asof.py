"""As-of join (SURVEY §2.2 B14): for each left row, the most recent right
row at-or-before its timestamp, per key.

Two implementations with identical semantics:

- ``asof_join``         — pure DataFrame composition: union the two sides,
                          sort per key by (ts, side), propagate the last
                          right value forward with ``last(..., ignorenulls)``
                          over an unbounded-preceding window. One shuffle on
                          the key; no Python boundary. Preferred at scale.
- ``asof_join_pandas``  — cogrouped ``applyInPandas`` + ``pandas.merge_asof``.
                          Keys are hash-bucketed so each pandas call merges
                          MANY complete key-groups at once (merge_asof's
                          ``by=`` does the per-key split vectorized) — per-key
                          cogroups would cost O(distinct keys) Python calls.
                          Use when tolerance windows / nearest-direction
                          options are needed (merge_asof exposes them).

Tie handling: right rows sharing a timestamp are ordered by ``right_order``
(default the natural extra sort keys) and the *last* one wins — both paths
agree on this.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__asof_bucket"
_RPREFIX = "__asof_r_"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    value_cols: Sequence[str],
    right_order: Sequence[str] = (),
) -> DataFrame:
    """For each left row: latest right values with right.on <= left.on,
    matching on ``by`` keys. Appends ``value_cols`` (null when no prior
    right row exists).

    Scale: one hash exchange on ``by`` + one sort — the same cost as a
    window function; no range-join explosion. Skewed keys behave like any
    skewed window partition (pre-salt if a single key dominates).
    """
    by = [by] if isinstance(by, str) else list(by)
    out_cols = [*left.columns, *value_cols]
    lmark = left.withColumn("_side", F.lit(1))
    rmark = right.select(
        *by, F.col(on), *[F.col(c) for c in value_cols], *[F.col(c) for c in right_order if c not in value_cols]
    ).withColumn("_side", F.lit(0))
    merged = lmark.unionByName(rmark, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (side 0 < 1) so an exact-ts
    # right row is visible to the left row at the same instant.
    order = [F.col(on).asc(), F.col("_side").asc(), *[F.col(c).asc() for c in right_order]]
    w = Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = merged
    for c in value_cols:
        filled = filled.withColumn(
            c, F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w)
        )
    return filled.filter(F.col("_side") == 1).select(*out_cols)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: Sequence[str],
    right_order: Sequence[str] = (),
    tolerance=None,
    num_buckets: int | None = None,
) -> DataFrame:
    """merge_asof-backed variant (Arrow-batched, bucketed cogroups).

    Both sides cogroup on ``hash(by) % num_buckets`` — every key's rows land
    in exactly one bucket, and ``merge_asof(by=...)`` matches per key inside
    the bucket, vectorized. Memory per task is bounded by bucket size; raise
    ``num_buckets`` to shrink it (defaults to the session's shuffle
    parallelism, ~one pandas call per task).
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    if num_buckets is None:
        num_buckets = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    left_cols = list(left.columns)
    # copy the field list: StructType.add mutates in place, and df.schema is
    # cached on the DataFrame — appending to it directly corrupts `left`.
    out_schema = StructType(list(left.schema.fields))
    for c in value_cols:
        out_schema = out_schema.add(right.schema[c])

    rcols = [by, on, *dict.fromkeys([*right_order, *value_cols])]

    def merge(lpdf: "pd.DataFrame", rpdf: "pd.DataFrame") -> "pd.DataFrame":
        lpdf = lpdf.drop(columns=[_BUCKET])
        if len(lpdf) == 0:
            return pd.DataFrame(columns=[*left_cols, *value_cols])
        rpdf = rpdf.rename(columns=lambda c: c.removeprefix(_RPREFIX))
        # merge_asof needs a global sort on `on`; within equal (key, on) the
        # LAST right row in (on, *right_order) stable order wins, matching
        # asof_join's window tie-break.
        lpdf = lpdf.sort_values(on, kind="mergesort")
        rsel = rpdf[rcols].sort_values([on, *right_order], kind="mergesort")
        merged = pd.merge_asof(
            lpdf, rsel[[by, on, *value_cols]], on=on, by=by, direction="backward",
            tolerance=tolerance, suffixes=("", "_r"),
        )
        for c in value_cols:
            if f"{c}_r" in merged.columns:
                merged[c] = merged[f"{c}_r"]
                merged = merged.drop(columns=[f"{c}_r"])
        return merged[[*left_cols, *value_cols]]

    # The right side is projected through FRESH aliases: when both sides
    # share lineage (e.g. probe derived from the right table's scan) the two
    # cogroup children share attribute ids, and Catalyst's dedup prunes the
    # shared column out of the right child once a downstream select narrows
    # the output — the pandas UDF would then receive rpdf without `by`.
    lal = left.withColumn(_BUCKET, F.pmod(F.hash(by), F.lit(num_buckets)))
    ral = right.select(*[F.col(c).alias(f"{_RPREFIX}{c}") for c in rcols]).withColumn(
        _BUCKET, F.pmod(F.hash(f"{_RPREFIX}{by}"), F.lit(num_buckets))
    )
    return lal.groupBy(_BUCKET).cogroup(ral.groupBy(_BUCKET)).applyInPandas(merge, schema=out_schema)
