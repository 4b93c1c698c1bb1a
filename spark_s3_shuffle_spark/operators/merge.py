"""MERGE INTO (latest-wins upsert/delete) as a pure DataFrame composition.

The warehouse-core mutation: apply a changelog of inserts/updates/deletes
to a keyed base snapshot, producing the next snapshot. The reference's
workloads are read-only TPC-DS scans, but any production deployment of
those reporting tables maintains them with exactly this operation
(Delta/Iceberg `MERGE INTO`); it composes with the CDC compaction query
(registry q68) which produces the changelog side.

Scale shape (100 TB base, GB-scale changelog):
- The changelog first compacts to ONE row per key (latest-wins window) —
  state after a merge depends only on each key's last change, so the
  expensive side of the join is bounded by |distinct changed keys|.
- Base ⟕⟖ changes is a single full-outer hash join on the key. With a
  GB-scale compacted changelog Spark broadcasts it and the base never
  shuffles; co-partitioned/bucketed layouts (operators/exchange.py
  ``stage_write_bucketed``) make even the fact-sized-changelog case
  exchange-free.
- Only rows whose key appears in the changelog change identity — pair
  with partition pruning on the write side to rewrite only affected
  partitions (the Delta/Iceberg merge-on-read vs copy-on-write trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(changes: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Compact a changelog to its final change per key (latest-wins by
    ``order_cols``, which must be a deterministic total order per key)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    delete_when,
    guard_out_of_order: bool = False,
) -> DataFrame:
    """Next snapshot = MERGE of ``changes`` into ``base``.

    ``delete_when`` is a Column predicate evaluated on the (compacted)
    change row: true -> the key is deleted; false -> the change row's
    values replace/insert the key. Keys absent from the changelog keep
    their base row. Both inputs must share the same schema.

    ``guard_out_of_order=True`` makes the merge SAFE under out-of-order
    delivery: a change only applies when its ``order_cols`` tuple exceeds
    the base row's (the version-guard every streaming CDC sink needs —
    micro-batches do not arrive in event-time order, and an unguarded
    merge would let a late straggler overwrite newer state). With the
    guard, folding a PURE-UPSERT changelog in batch-by-batch in ANY batch
    order yields the same snapshot as one merge of the whole changelog,
    which is what makes the foreachBatch upsert sink composable. Deletes
    under out-of-order delivery additionally need tombstone retention (a
    deleted key leaves no row to guard against, so a late straggler could
    resurrect it) — single-shot merges (registry q114) are unaffected
    because compaction sees the whole changelog at once.

    Equivalent SQL (the oracle form, unguarded)::

        SELECT COALESCE(c.cols, b.cols) ...
        FROM base b FULL OUTER JOIN latest_changes c USING (keys)
        WHERE c.key IS NULL OR NOT delete_when(c)
    """
    val_cols = [c for c in base.columns if c not in key_cols]
    if guard_out_of_order:
        # the guard compares the change row's _cv_ aliases against the base
        # row, so the version columns must be value (non-key) columns; and a
        # NULL version value makes "newer" undecidable — see below.
        missing = [o for o in order_cols if o not in val_cols]
        if missing:
            raise ValueError(
                f"guard_out_of_order requires order_cols to be value columns "
                f"of base (non-key); not satisfied by: {missing}"
            )
    latest = latest_per_key(changes, key_cols, order_cols)
    c = latest.select(
        *[F.col(k).alias(f"_ck_{k}") for k in key_cols],
        *[F.col(v).alias(f"_cv_{v}") for v in val_cols],
        F.coalesce(delete_when, F.lit(False)).alias("_c_delete"),
    )
    cond = None
    for k in key_cols:
        eq = base[k] == c[f"_ck_{k}"]
        cond = eq if cond is None else cond & eq
    joined = base.join(c, cond, "full_outer")
    has_change = F.col(f"_ck_{key_cols[0]}").isNotNull()
    no_base = base[key_cols[0]].isNull()
    if guard_out_of_order:
        # NULL in any order col makes the struct comparison NULL (guard
        # undetermined): coalesce to False so the change is conservatively
        # IGNORED — without this, a NULL guard on a delete change would
        # evaluate the delete filter to NULL and silently DROP the base row.
        # Callers needing NULL-versioned changes to apply must coalesce
        # their order cols to a sentinel first.
        newer = F.coalesce(
            F.struct(*[F.col(f"_cv_{o}") for o in order_cols])
            > F.struct(*[base[o] for o in order_cols]),
            F.lit(False),
        )
        take_change = has_change & (no_base | newer)
    else:
        take_change = has_change
    out_keys = [
        F.coalesce(base[k], F.col(f"_ck_{k}")).alias(k) for k in key_cols
    ]
    out_vals = [
        F.when(take_change, F.col(f"_cv_{v}")).otherwise(base[v]).alias(v)
        for v in val_cols
    ]
    return joined.filter(~(take_change & F.col("_c_delete"))).select(*out_keys, *out_vals)
