"""t1 smoke: every registry query runs at sf0.001 with a stable schema.
(The value-level oracle check is tools/check_correctness.py / the driver's
t2 gate.) Also covers B2: parquet sink write + re-read unchanged."""

import tempfile

import pytest

from spark_s3_shuffle_spark.queries.registry import QUERIES
from spark_s3_shuffle_spark.sources.catalog import write_parquet


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name].builder(spark, sf_dir)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0


def test_parquet_sink_roundtrip(spark, sf_dir):
    # B2: write the flagship result, re-read, identical rows
    df = QUERIES["q12_tpch_q1_agg"].builder(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="sink-") as tmp:
        write_parquet(df, f"{tmp}/out")
        back = spark.read.parquet(f"{tmp}/out")
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
