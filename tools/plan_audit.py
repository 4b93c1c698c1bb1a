"""Plan-quality audit: sweep every registry query's physical plan for
scale red flags before they show up as 100 TB incidents.

Flags:
- CARTESIAN / BNLJ outside the queries that declare them (cross join q09,
  single-row-probe broadcasts in the similarity tier)
- exchange counts above the per-query expectation (every exchange is a
  full network round trip at scale)
- executed-plan shuffle volumes via AQE statistics (see shuffle_report.py
  for the ranked version)

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_s3_shuffle_spark.plans import inspect as I
from spark_s3_shuffle_spark.queries.registry import QUERIES
from spark_s3_shuffle_spark.session import get_spark

#: Queries that legitimately plan a nested-loop/cartesian shape: the
#: declared theta cross join, and similarity probes that broadcast a
#: single-row probe (a 1×n "cross join" is a map-side scan, not a hazard).
NESTED_LOOP_OK = {
    "q09_cross_join",
    "q34_cosine_topk",
    "q34b_ivf_topk",
    "q34c_lsh_topk",
    "q97_quantized_topk",  # same 1-row probe broadcast as the q34 family
    "q63_quality_percentile_filter",  # 1-row percentile-bounds broadcast
    "q79_tfidf_topterms",  # 1-row corpus-count (N) broadcast into the idf expr
    "q103_tpch_q11",  # 1-row global-total broadcast (HAVING scalar)
    "q105_tpch_q15",  # 1-row max-revenue broadcast (scalar-max join-back)
    "q110_tpch_q22",  # 1-row avg-balance broadcast (scalar-avg filter)
    "q118_resample_locf",  # |buckets|-row broadcast grid x distinct series
    "q120_batch_ann_join",  # probe-TABLE broadcast against the int8 scan
    "q120b_batch_ivf_join",  # probe-table x broadcast centroid cell ranking
    "q130_mixture_sample",  # 1-row corpus-total broadcast into the quota expr
    "q131_corpus_export_pipeline",  # same 1-row survivor-total broadcast
    "q132_ds23_frequent_best",  # 1-row mean-spend broadcast (scalar filter)
    "q137_pagerank_trade_graph",  # 1-row |nodes| broadcast seeding the rank frame
    "q141_resample_interpolate",  # |buckets|-row broadcast grid x distinct series (q118's sibling)
    "q158_hll_set_algebra",  # three 1-row sketch estimates cross-joined into one output row
    "q166_filtered_vector_search",  # 1-row probe broadcast, same as the q34 family
    # round-6 prefix-aggregate tier: every nested-loop here is a 1-row
    # broadcast (the global total n, the leftover count, the median/p90
    # scalar rows) cross-joined into the data frame — a map-side scan,
    # not a pair explosion
    "q160_rfm_segmentation",  # 3x 1-row total-count broadcast (global_ntile)
    "q173_abc_classification",  # 1-row grand-total broadcast
    "q214_spend_percentile_bands",  # 1-row total-count broadcast
    "q215_exact_median_selection",  # 1-row n / median / p90 scalar broadcasts
    "q217_temperature_mixture",  # 1-row isqrt-total + leftover broadcasts
    "q207_sql_text_ds88",  # verbatim DS88 text: scalar subqueries per time
    # bucket plan as 1-row broadcasts (the DataFrame original q128 computes
    # them as conditional aggs in one pass)
}

#: LSH/CC pipelines are inherently multi-stage; everything else should stay
#: within a handful of exchanges.
MAX_EXCHANGES_DEFAULT = 6
MAX_EXCHANGES = {
    "q42_minhash_dedup": 10,
    "q43_simhash_dedup": 10,
    "q44_ngram_jaccard": 10,
    "q59_minhash_dedup_cc": 14,
    "q34b_ivf_topk": 16,  # includes the cached index-build lineage in explain
    "q109_tpch_q21": 8,  # Q21: late-pairs distinct + two per-order aggregates + final rank
    "q118_resample_locf": 8,  # compaction window + grid join + fill window + sort
    "q120_batch_ann_join": 8,  # per-probe candidate + rescore WindowGroupLimit pairs
    "q120b_batch_ivf_join": 16,  # includes the cached index-build lineage in explain
    "q131_corpus_export_pipeline": 10,  # 5-stage composite: dedup agg+semi,
    # survivor counts agg, mixture join, shard agg, final sort
    "q137_pagerank_trade_graph": 14,  # 3-iteration loop over PERSISTED node/edge
    # frames: each InMemoryRelation reference re-prints its build lineage in the
    # plan text, so the textual count multiplies; the executed job materializes
    # the edge build once and pays ONE bounded contrib exchange per iteration
    # (rank + contrib frames broadcast — see operators/graph.py)
    # Round-6 prefix-aggregate tier: each two-phase prefix primitive plans
    # range exchange + pid hash exchange + P-row summary fold + broadcast;
    # the pinned pid frame is an InMemoryRelation whose build lineage
    # re-prints per reference, multiplying the TEXTUAL count (the executed
    # job materializes it once — same caveat as q137). Data-sized
    # exchanges per primitive: exactly two.
    "q160_rfm_segmentation": 24,  # 3 independent global_ntile orderings + 2 joins
    "q167_pareto_frontier": 8,
    "q173_abc_classification": 10,
    "q214_spend_percentile_bands": 12,
    "q215_exact_median_selection": 16,  # median + p90 selection branches re-print the cached rank lineage
    "q216_sequence_packing_plan": 8,
    "q217_temperature_mixture": 10,  # |sources|-frame windows + two scalar broadcasts
    "q207_sql_text_ds88": 8,  # verbatim text: one exchange per scalar subquery
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    problems = []
    for name, spec in QUERIES.items():
        try:
            df = spec.builder(spark, sf_dir)
            plan = I.formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: build error {e}")
            continue
        if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) and name not in NESTED_LOOP_OK:
            problems.append(f"{name}: unexpected nested-loop join")
        nex = I.count_exchanges(df)
        cap = MAX_EXCHANGES.get(name, MAX_EXCHANGES_DEFAULT)
        if nex > cap:
            problems.append(f"{name}: {nex} exchanges (cap {cap})")
    if problems:
        print("PLAN AUDIT FAILURES:")
        for p in problems:
            print(f"  {p}")
        return 1
    print(f"plan audit clean: {len(QUERIES)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
