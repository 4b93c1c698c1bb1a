"""Training-pipeline tier II tests: repetition signals, PII redaction,
deterministic hash sampling, TF-IDF, inverted index, semantic dedup.
Registry oracles (q75-q81) check end-to-end values against DuckDB; these
pin the operator-level edge cases the fixtures can't reach (short docs,
retry-stability, cell-boundary recall)."""

import os
import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_s3_shuffle_spark.operators import dedup as D
from spark_s3_shuffle_spark.operators import pipeline as PL


def test_repetition_signals_known_values(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b"),        # "a b" x3 of 5 bigrams
            Row(doc_id=2, text="x y z w"),            # all distinct
            Row(doc_id=3, text="solo"),               # 1 token, 0 bigrams
            Row(doc_id=4, text="t t t t"),            # fully repeated
        ]
    )
    rows = {r["doc_id"]: r for r in PL.repetition_signals(df).collect()}
    assert rows[1]["top_bigram_frac"] == pytest.approx(0.6)  # 3/5
    assert rows[1]["dup_word_frac"] == pytest.approx(1 - 2 / 6, abs=1e-4)
    assert rows[2]["dup_word_frac"] == 0.0 and rows[2]["rep_ok"]
    assert rows[3]["top_bigram_frac"] == 0.0  # no bigrams, no div-by-zero
    assert rows[4]["top_bigram_frac"] == 1.0 and not rows[4]["rep_ok"]


def test_pii_redact_counts_and_text(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail me at bob.smith@corp.io or alice@web.net ok"),
            Row(doc_id=2, text="digits 555-1234 and 123-4567 stay"),
            Row(doc_id=3, text="nothing to hide"),
        ]
    )
    rows = {r["doc_id"]: r for r in PL.pii_redact(df).collect()}
    assert rows[1]["n_emails"] == 2 and "<EMAIL>" in rows[1]["clean_text"]
    assert "@" not in rows[1]["clean_text"]
    assert rows[2]["n_phones"] == 2 and rows[2]["clean_text"].count("<PHONE>") == 2
    assert rows[3]["n_emails"] == 0 and rows[3]["clean_text"] == "nothing to hide"


def test_hash_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    kept1 = sorted(r["k"] for r in PL.hash_sample(df, "k", 10).collect())
    kept2 = sorted(r["k"] for r in PL.hash_sample(df.repartition(13), "k", 10).collect())
    assert kept1 == kept2  # selection depends on content, not partitioning
    assert 100 < len(kept1) < 320  # ~10% of 2000
    # different salt => different (still deterministic) subset
    kept3 = sorted(r["k"] for r in PL.hash_sample(df, "k", 10, salt="other").collect())
    assert kept3 != kept1
    with pytest.raises(ValueError):
        PL.hash_sample(df, "k", 101)


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="common common rare common"),
            Row(doc_id=2, text="common common common"),
            Row(doc_id=3, text="common other other"),
        ]
    )
    top = {r["doc_id"]: r["term"] for r in PL.tfidf_top_terms(df, k=1).collect()}
    assert top[1] == "rare" and top[3] == "other"  # df=1 beats tf=3 of df=3 term


def test_inverted_index_cap_keeps_df_exact(spark):
    rows = [Row(doc_id=i, text="stop word" if i < 15 else "stop") for i in range(20)]
    out = {
        r["term"]: r
        for r in PL.inverted_index(
            spark.createDataFrame(rows), max_postings=5, min_df=1
        ).collect()
    }
    assert out["stop"]["df"] == 20  # df from the FULL pair set
    assert out["stop"]["postings_csv"] == "0,1,2,3,4"  # capped, ascending
    assert out["word"]["df"] == 15


def test_semantic_dedup_finds_boundary_twins(spark):
    # clustered corpus + twins; probes=2 must recover every planted pair
    # even when a twin straddles a k-means cell boundary.
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16))
    vecs = [
        Row(vec_id=i, embedding=[float(x) for x in centers[i % 4] + 0.05 * rng.normal(size=16)])
        for i in range(200)
    ]
    df = spark.createDataFrame(vecs)
    twins = df.filter(F.col("vec_id") < 6).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x, i: x + 0.0001 * (i % 3)).alias("embedding"),
    )
    corpus = df.unionByName(twins)
    pairs = D.semantic_dedup_pairs(
        corpus, "vec_id", "embedding", threshold=0.999, num_cells=4, probes=2
    ).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert {(i, i + 1000) for i in range(6)} <= found
    # no duplicate (a, b) rows despite overlapping probe cells
    assert len(found) == len(pairs)


def test_semantic_dedup_cell_cap_drops_megacell(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 0.0, 0.0, 0.0]) for i in range(50)]
    )
    out = D.semantic_dedup_pairs(
        df, "vec_id", "embedding", threshold=0.99, num_cells=2, max_cell_size=10
    )
    assert out.count() == 0  # every cell over the cap is dropped, no O(n^2)
