"""Table catalog: Parquet sources over the fixture star schema.

Stands in for the reference's input surface — TPC-DS Parquet tables
(reference: examples/sql/run_single_query.sh:27 reads
``s3a://…/sf${SIZE}_parquet/``) — over any Hadoop FileSystem path
(``file://``, ``s3a://``, ``cos://``; reference README.md:38-40).

Scan-side scale notes: loaders return *bare* ``spark.read.parquet`` frames
so Catalyst keeps full pushdown freedom (PushedFilters + ReadSchema reach
the Parquet scan). Derived columns (``events.event_ts``) are projections on
top, which column pruning eliminates when unused.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.session import apply_runtime_confs

#: All fixture tables (TESTDATA.md). Dimension tables are listed with a
#: broadcast-by-default flag the join helpers consult: at any realistic
#: scale factor these stay far under the broadcast threshold, so fact⋈dim
#: joins plan as BroadcastHashJoin with zero fact-side shuffle.
TABLES: dict[str, dict] = {
    "region": {"broadcast": True},
    "nation": {"broadcast": True},
    "customer": {"broadcast": False},
    "supplier": {"broadcast": True},
    "part": {"broadcast": False},
    "orders": {"broadcast": False},
    "lineitem": {"broadcast": False},
    "events": {"broadcast": False},
    "documents": {"broadcast": False},
    "embeddings": {"broadcast": False},
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    ``events`` carries a Parquet TIMESTAMP(NANOS) column; under
    ``spark.sql.legacy.parquet.nanosAsLong`` it loads as bigint nanos and we
    add a derived ``event_ts`` timestamp column (FIXTURES §2 load caveat).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    apply_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("event_ts", F.timestamp_seconds(F.col("ts") / F.lit(1e9)))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or list(TABLES))}


def register_temp_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register all tables as temp views so ``spark.sql`` queries work."""
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Parquet sink (reference's ``-a save,<out>`` action,
    examples/sql/run_single_query.sh:28)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
