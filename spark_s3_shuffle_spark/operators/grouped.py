"""Grouped-map pandas UDFs at scale (SURVEY §2.2 B44).

``df.groupBy(k).applyInPandas(fn)`` invokes ``fn`` once per distinct key.
With millions of small groups (per-customer, per-user, per-document) the
per-call Python/Arrow overhead dominates: at 100 TB a per-key grouped map
is O(distinct keys) Python round-trips and falls over long before the data
does. (The reference hits the same wall at the shuffle layer: one tiny
object per reduce partition; its fix is concatenation —
S3ShuffleMapOutputWriter.scala:67-83 packs all partitions of a map task
into ONE object. This module is the same idea one level up.)

``bucketed_apply_in_pandas`` keeps the applyInPandas API but groups by
``hash(keys) % num_buckets`` instead of the raw key, so each pandas call
receives a few thousand complete key-groups and ``fn`` vectorizes across
them with ``pdf.groupby(keys)``. Guarantees:

- every key's rows land in exactly one bucket (hash partition), so any
  per-key computation inside ``fn`` sees the key's complete group;
- memory per task is bounded by bucket size — raise ``num_buckets`` to
  shrink it (same lever as shuffle partition count);
- one hash exchange, identical to what per-key applyInPandas costs.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_BUCKET = "__gm_bucket"


def bucketed_apply_in_pandas(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable,
    schema: StructType | str,
    num_buckets: int | None = None,
) -> DataFrame:
    """Grouped-map over key *buckets*: ``fn(pdf)`` receives all rows of
    ``hash(keys) % num_buckets`` — many complete key-groups per call — and
    must aggregate/transform per key itself (``pdf.groupby(list(keys))``).

    ``num_buckets`` defaults to the session's shuffle parallelism so each
    task gets ~one pandas call.
    """
    keys = list(keys)
    if num_buckets is None:
        num_buckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))

    def run(pdf):
        return fn(pdf.drop(columns=[_BUCKET]))

    bucketed = df.withColumn(_BUCKET, F.pmod(F.hash(*keys), F.lit(num_buckets)))
    return bucketed.groupBy(_BUCKET).applyInPandas(run, schema=schema)
