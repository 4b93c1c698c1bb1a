"""spark_s3_shuffle_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities validated by
IBM/spark-s3-shuffle (reference surveyed in SURVEY.md): the full relational
operator surface its TPC-DS + RDD-shuffle workloads exercise, an
object-store-friendly materialized-exchange utility (the reference's one
genuinely custom idea, re-expressed as partitioned Parquet staging), RDD
K/V-shuffle parity ops, Structured Streaming windowing, and a
training-data-pipeline tier (dedup, similarity search, text analysis,
multimodal columns).

Everything relational is declared through the DataFrame/SQL API so Catalyst
plans it (predicate pushdown, column pruning, broadcast selection, AQE);
Python-side execution only appears in clearly-marked Pandas-UDF paths.
"""

from spark_s3_shuffle_spark.session import get_spark
from spark_s3_shuffle_spark.sources.catalog import TABLES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLES"]
__version__ = "0.1.0"
