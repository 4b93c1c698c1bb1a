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
