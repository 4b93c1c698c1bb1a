"""Round-8 hot-group bounds for the dedup pair machinery.

Two scale hazards from the round-7 verdict, each with a planted fixture:

1. SemDeDup/LSH pair verification materializes an ENTIRE group (IVF cell
   or LSH bucket) as one pandas DataFrame per task
   (`_verify_pairs_within_groups`). k-means cells are not balanced — a
   boilerplate cluster could put millions of vectors in one cell at
   100 TB. The fix salts oversize groups into hash blocks and verifies
   block-vs-block, bounding per-task peak memory at ~2·max_group_rows
   vectors. These tests plant one group ≫ the limit and assert the
   blocked path returns EXACTLY the unblocked result (same pairs, same
   rounded cosines) — the results-preserving contract the small-scale
   oracle hashes rely on.

2. Star-edge candidate generation in oversize LSH buckets made every
   non-min member's connectivity depend on its single (min, x) edge
   surviving exact-Jaccard verification (ADVICE r7): a bucket mixing two
   distinct dup clusters silently lost the foreign cluster's member
   pairs. The fix adds chain edges between signature-sorted neighbors,
   so connectivity among non-min members no longer routes through the
   bucket min. Asserted structurally: remove the star center from the
   candidate graph and the rest of an oversize bucket must STAY
   connected.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_s3_shuffle_spark.operators import dedup as D


def _planted_vectors(n: int, dim: int = 16, twins: int = 40):
    """Deterministic corpus: ``n`` base vectors + ``twins`` near-copies of
    the first ``twins`` bases (tiny perturbation => cosine ~ 1), all in
    one numpy array. Seeded so the planted pair set is reproducible."""
    rng = np.random.default_rng(7)
    X = rng.normal(size=(n, dim))
    out = [(i, X[i].tolist()) for i in range(n)]
    for t in range(twins):
        v = X[t] + 0.001 * rng.normal(size=dim)
        out.append((10_000 + t, v.tolist()))
    return out


def _pairs_set(df):
    return {(r["a"], r["b"], r["cos"]) for r in df.collect()}


def test_blocked_verify_matches_unblocked_exactly(spark):
    """One 440-member group, verified whole (max_group_rows ≫ size) vs
    salted into ~7 blocks (max_group_rows=64): identical pair sets with
    identical rounded cosines. The cross-block kernel covers every
    (block_i, block_j) pair exactly once, so no pair is lost or doubled."""
    rows = _planted_vectors(400, twins=40)
    withvec = spark.createDataFrame(
        [(0, i, v) for i, v in rows], "cell int, _id long, _v array<double>"
    )
    whole = _pairs_set(
        D._verify_pairs_within_groups(withvec, ["cell"], 0.95, max_group_rows=10**9)
    )
    blocked = _pairs_set(
        D._verify_pairs_within_groups(withvec, ["cell"], 0.95, max_group_rows=64)
    )
    assert len(whole) >= 40  # every planted twin pair found
    assert blocked == whole


def test_blocked_verify_multi_group_and_empty_groups(spark):
    """Mixed sizes: a hot group over the limit next to small groups under
    it (s=1 fast path) — each group's pairs stay within its group, and
    the under-limit groups take the bit-identical single-group path."""
    rows = _planted_vectors(150, twins=20)
    data = [(i % 3, i, v) for i, v in rows]  # 3 groups, one per residue
    withvec = spark.createDataFrame(data, "cell int, _id long, _v array<double>")
    whole = _pairs_set(
        D._verify_pairs_within_groups(withvec, ["cell"], 0.95, max_group_rows=10**9)
    )
    blocked = _pairs_set(
        D._verify_pairs_within_groups(withvec, ["cell"], 0.95, max_group_rows=20)
    )
    assert blocked == whole
    # a planted twin split across groups must NOT appear (group-local only)
    ids_by_group = {}
    for g, i, _ in data:
        ids_by_group.setdefault(g, set()).add(i)
    for a, b, _ in whole:
        assert any(a in s and b in s for s in ids_by_group.values())


def test_semantic_dedup_hot_cell_bounded_path_is_results_preserving(spark):
    """End-to-end q81 shape with ONE planted hot cell: a single centroid
    (every vector lands in cell 0, membership ≫ max_group_rows) — the
    public API's blocked path must equal its own unblocked result."""
    rows = _planted_vectors(300, twins=30)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    cents = [(0, [1.0] + [0.0] * 15)]  # one cell: everything is "hot"
    kw = dict(
        id_col="vec_id", vec_col="embedding", threshold=0.98,
        probes=1, max_cell_size=None, centroids=cents,
    )
    whole = _pairs_set(D.semantic_dedup_pairs(df, max_group_rows=10**9, **kw))
    blocked = _pairs_set(D.semantic_dedup_pairs(df, max_group_rows=32, **kw))
    assert len(whole) >= 30
    assert blocked == whole


def _connected(nodes: set, edges: set) -> bool:
    if not nodes:
        return True
    adj: dict = {n: set() for n in nodes}
    for a, b in edges:
        if a in adj and b in adj:
            adj[a].add(b)
            adj[b].add(a)
    seen = set()
    stack = [next(iter(nodes))]
    while stack:
        n = stack.pop()
        if n in seen:
            continue
        seen.add(n)
        stack.extend(adj[n] - seen)
    return seen == nodes


def test_oversize_bucket_connectivity_survives_without_star_center(spark):
    """ADVICE r7 regression: in a >dense_bucket_limit bucket, non-min
    members must be linked to each other WITHOUT routing through the
    bucket-min (whose star edges can all fail verification when the
    bucket mixes clusters). 30 exact dups force every band bucket
    oversize at limit 8; dropping node 0 (the star center) from the
    candidate graph must leave 1..29 connected via chain edges."""
    text = " ".join(f"tok{i}" for i in range(80))
    docs = [(i, text) for i in range(30)]
    # background docs keep the corpus from being a single degenerate bucket
    docs += [(1000 + i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cand = D.minhash_lsh_candidates(
        df, "doc_id", "text", num_hashes=16, bands=4, dense_bucket_limit=8
    )
    edges = {(r["a"], r["b"]) for r in cand.collect()}
    cluster = set(range(30))
    assert _connected(cluster, edges)
    # the regression: connectivity must NOT depend on the star center
    no_center = {(a, b) for a, b in edges if a != 0 and b != 0}
    assert _connected(cluster - {0}, no_center)


def test_chain_edges_only_within_oversize_buckets(spark):
    """Small buckets keep the exact all-pairs form: with the default
    dense limit (64) a 30-member cluster is all-pairs, so the candidate
    set over the cluster is the full clique — bit-identical to the
    pre-chain implementation at fixture scale."""
    text = " ".join(f"tok{i}" for i in range(80))
    docs = [(i, text) for i in range(30)]
    docs += [(1000 + i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cand = D.minhash_lsh_candidates(df, "doc_id", "text", num_hashes=16, bands=4)
    edges = {(r["a"], r["b"]) for r in cand.collect() if r["a"] < 30 and r["b"] < 30}
    clique = {(a, b) for a in range(30) for b in range(a + 1, 30)}
    assert edges == clique


# ---------------------------------------------------------------------------
# Round-11 (VERDICT r10 item 1): exact-duplicate determinism in the
# oversize-bucket regime — the q42b-at-sf10 failure, reproduced at toy scale.
# ---------------------------------------------------------------------------

def _dup_corpus():
    """40 exact-dup groups over a SHARED boilerplate prefix (so LSH buckets
    mix groups — the interloper condition behind the sf10 loss), sizes
    2..6, plus 30 singleton docs. Returns (rows, expected_survivor_ids)."""
    boiler = " ".join(f"common{i}" for i in range(60))
    rows, expected = [], set()
    nid = 0
    for g in range(40):
        text = f"{boiler} groupmark{g}"
        size = 2 + (g % 5)
        ids = list(range(nid, nid + size))
        nid += size
        rows += [(i, text) for i in ids]
        expected.add(min(ids))
    for s in range(30):
        rows.append((10_000 + s, " ".join(f"solo{s}w{j}" for j in range(50))))
        expected.add(10_000 + s)
    return rows, expected


def test_exact_tier_deterministic_in_oversize_regime(spark):
    """dense_bucket_limit=2 forces EVERY bucket into the star+chain regime
    (the sf10 failure regime: CORRECTNESS_SF10_r10 q42b, 60/1000 dups
    survived). With round-11 digest star candidates + digest verify, the
    threshold-1.0 survivor set must equal keep-min-per-text EXACTLY, by
    construction — no probabilistic slack allowed."""
    rows, expected = _dup_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in D.minhash_dedup(
            df, "doc_id", "text", jaccard_threshold=1.0, dense_bucket_limit=2
        ).collect()
    }
    assert kept == expected


def test_exact_tier_deterministic_cc_variant(spark):
    """Same contract through the connected-components pipeline."""
    rows, expected = _dup_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in D.minhash_dedup_cc(
            df, "doc_id", "text", jaccard_threshold=1.0, dense_bucket_limit=2
        ).collect()
    }
    assert kept == expected


def test_exact_tier_ignores_identical_shingle_sets(spark):
    """ADVICE r10 item 2: distinct texts with IDENTICAL word-3-shingle sets
    ("a b a b a" vs "a b a b a b a" both shingle to {aba, bab}) are
    Jaccard 1.0 but NOT exact duplicates; the 1.0 tier verifies by text
    digest, so both must survive."""
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b a b a b a"), (3, "a b a b a")],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in D.minhash_dedup(df, "doc_id", "text", jaccard_threshold=1.0).collect()
    }
    assert kept == {1, 2}  # 3 is a true byte-dup of 1; 2 survives


def test_digest_star_edges_cover_dropped_buckets(spark):
    """max_bucket_size drops a saturated bucket outright, but digest star
    edges must still connect its exact-dup members: 20 byte-identical docs
    with max_bucket_size=10 lose ALL band buckets, yet keep-min must hold."""
    text = " ".join(f"tok{i}" for i in range(80))
    docs = [(i, text) for i in range(20)]
    docs += [(1000 + i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in D.minhash_dedup(
            df, "doc_id", "text", jaccard_threshold=1.0, max_bucket_size=10
        ).collect()
    }
    assert kept == {0} | {1000 + i for i in range(10)}


def test_subthreshold_filter_no_rounding_slack(spark):
    """ADVICE r10 item 2 (rounding): the threshold filter now compares
    unrounded integer counts. A pair at exactly j = 1/3 against threshold
    1/3 must be KEPT — the old ``round(j, 4) >= t`` filter rounded 1/3
    down to 0.3333 < 0.333333… and dropped an at-threshold pair. And a
    pair strictly under the threshold must be dropped even when its
    4-decimal rounding would meet it."""
    # 3-shingles: a -> {w1w2w3, w2w3w4}, b -> {w1w2w3, w2w3z4}:
    # inter = 1, uni = 3, j = 1/3 exactly.
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4"), (2, "w1 w2 w3 z4")], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(1, 2)], "a long, b long")
    keep = D.ngram_jaccard_pairs(df, cand, "doc_id", "text", 3, 1 / 3).collect()
    assert len(keep) == 1 and abs(keep[0]["jaccard"] - 0.3333) < 1e-9
    drop = D.ngram_jaccard_pairs(df, cand, "doc_id", "text", 3, 0.3334).collect()
    assert drop == []
