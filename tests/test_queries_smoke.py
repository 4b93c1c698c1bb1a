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


def test_q161_grouped_pairs_equivalent_to_self_join(spark, sf_dir):
    """The r12 in-task basket-pair generation must emit exactly the rows
    of the pre-r12 lineitem self-join (same pairs, same multiplicity —
    duplicate partkeys within one order included), in the same order."""
    from spark_s3_shuffle_spark.queries import registry as REG

    old_flag = REG._Q161_GROUPED
    try:
        REG._Q161_GROUPED = True
        grouped = QUERIES["q161_basket_cooccurrence"].builder(spark, sf_dir).collect()
        REG._Q161_GROUPED = False
        joined = QUERIES["q161_basket_cooccurrence"].builder(spark, sf_dir).collect()
    finally:
        REG._Q161_GROUPED = old_flag
    assert list(map(tuple, grouped)) == list(map(tuple, joined)) and grouped


def test_parquet_sink_roundtrip(spark, sf_dir):
    # B2: write the flagship result, re-read, identical rows
    df = QUERIES["q12_tpch_q1_agg"].builder(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="sink-") as tmp:
        write_parquet(df, f"{tmp}/out")
        back = spark.read.parquet(f"{tmp}/out")
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_registry_contract_pins_rows_only_set():
    """Meta-contract: every registry entry is documented, and the set of
    oracle-less (rows-only) queries is EXACTLY the declared hash-family
    seven — a new query accidentally registered without its DuckDB
    oracle fails here instead of silently downgrading the driver's
    correctness gate."""
    from spark_s3_shuffle_spark.queries.registry import QUERIES

    assert all(spec.doc for spec in QUERIES.values()), [
        n for n, s in QUERIES.items() if not s.doc
    ]
    rows_only = {n for n, s in QUERIES.items() if s.oracle is None}
    assert rows_only == {
        "q34b_ivf_topk",
        "q34c_lsh_topk",
        "q42_minhash_dedup",
        "q43_simhash_dedup",
        "q44_ngram_jaccard",
        "q59_minhash_dedup_cc",
        "q120b_batch_ivf_join",
    }, rows_only
    # column-name discipline: oracle text must not alias nothing (crude
    # guard: every oracle SELECT list mentions AS or bare column names —
    # enforced implicitly by the sweeps; here we pin total counts)
    assert len(QUERIES) >= 192
