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

#: Queries that legitimately plan a nested-loop/cartesian shape, each
#: with the MEASURED BOUND its broadcast build side must stay under
#: (round-7: name-keyed -> bound-checked; the audit EXECUTES these and
#: reads every nested-loop BroadcastExchange's numOutputRows, so a
#: declared 1-row scalar that silently grows data-sized fails loudly).
#: Bound rationale per entry; measured values at sf0.01 in parens.
NESTED_LOOP_OK: dict[str, int] = {
    "q09_cross_join": 25,  # declared cross with the fixed-card dim (5)
    "q34_cosine_topk": 1,  # 1-row probe broadcast (1)
    "q34b_ivf_topk": 16,  # probe + cell ranking; BNLJ may fold away under AQE
    "q34c_lsh_topk": 16,  # same family
    "q97_quantized_topk": 1,  # 1-row probe broadcast (1)
    "q63_quality_percentile_filter": 1,  # 1-row percentile bounds (1)
    "q79_tfidf_topterms": 1,  # 1-row corpus count N (1)
    "q103_tpch_q11": 1,  # 1-row global-total scalar (1)
    "q105_tpch_q15": 1,  # 1-row max-revenue scalar (BNLJ folds under AQE)
    "q110_tpch_q22": 1,  # 1-row avg-balance scalar (1)
    "q118_resample_locf": 10_000,  # |buckets| time grid, fixed by range (720)
    "q120_batch_ann_join": 64,  # probe TABLE broadcast (5)
    "q120b_batch_ivf_join": 256,  # probe table x centroid cells (8)
    "q130_mixture_sample": 1,  # 1-row corpus total (1)
    "q131_corpus_export_pipeline": 1,  # 1-row survivor total (1)
    "q132_ds23_frequent_best": 1,  # 1-row mean-spend scalar (1)
    "q137_pagerank_trade_graph": 1,  # 1-row |nodes| seed (1)
    "q141_resample_interpolate": 10_000,  # |buckets| grid (720)
    "q158_hll_set_algebra": 1,  # three 1-row sketch estimates (1)
    "q166_filtered_vector_search": 1,  # 1-row probe (1)
    "q330_label_centroid_profile": 64,  # |labels|^2 centroid inequality
    # self-join for nn_label: build side is the |labels|-row centroid
    # frame (10 at every SF — label cardinality is fixed by the fixture
    # schema, scale-independent); r11 inherited-state fix — the operator
    # landed in the interrupted mid-build session without its audit row
    # round-6 prefix-aggregate tier: 1-row scalars (total n, leftover,
    # median/p90 rows) cross-joined into the data frame
    "q160_rfm_segmentation": 1,  # (1)
    "q173_abc_classification": 1,  # (1)
    "q214_spend_percentile_bands": 1,  # (1)
    "q215_exact_median_selection": 1,  # (1)
    "q217_temperature_mixture": 1,  # (1)
    "q207_sql_text_ds88": 1,  # verbatim DS88 scalar subqueries (1)
    # Round-8 verbatim DS pack: the demographic/promotion/time dims are
    # derived from literal VALUES cross products (sources/tpcds.py
    # _digits) — the planner chains them as BNLJs whose build sides are
    # the CONSTANT enumeration lists (measured max 12 rows at sf0.001;
    # scale-INDEPENDENT by construction, the whole point of deriving the
    # dims from literals instead of base tables). Bound 64 gives slack
    # for AQE re-grouping the chain. ds61 adds two 1-row aggregate CTEs
    # cross-joined for its ratio.
    "q240_sql_text_ds7": 64,
    "q241_sql_text_ds10": 64,
    "q242_sql_text_ds13": 64,
    "q244_sql_text_ds26": 64,
    "q245_sql_text_ds27": 64,
    "q247_sql_text_ds35": 64,
    "q250_sql_text_ds61": 64,
    "q251_sql_text_ds69": 64,
    "q252_sql_text_ds73": 64,
    "q253_sql_text_ds79": 64,
    "q254_sql_text_ds84": 64,
    "q256_sql_text_ds96": 64,
    # ds28: six single-row bucket aggregates cross-joined (measured 1
    # per build side; bound 8 for AQE slack). ds41's correlated count
    # and the ds1/ds30/ds81 correlated averages decorrelate to
    # equi-joins in both engines — no nested loop, no entry needed.
    "q259_sql_text_ds28": 8,
    # Round-9 pack: same constant-VALUES-dim class — cd/hd/promotion/
    # reason/web_page enumerations chain as BNLJs whose build sides are
    # the literal lists (scale-independent); ds77 additionally cross-
    # joins the spec's own single-row catalog-returns total.
    "q299_sql_text_ds18": 64,
    "q300_sql_text_ds48": 64,
    "q301_sql_text_ds72": 64,
    "q306_sql_text_ds77": 64,
    "q307_sql_text_ds80": 64,
    "q312_sql_text_ds91": 64,
    "q314_sql_text_ds85": 64,
    # r11 second pass: triangle census cross-joins its two 1-row
    # aggregate frames (degree profile x triangle count) — the build
    # sides are single rows by construction (measured 1).
    "q327_triangle_census": 2,
    "q281_sql_text_ds88": 64,  # hd VALUES chain inside each scalar count
    "q282_sql_text_ds90": 64,  # hd + web_page VALUES chains
    "q288_sql_text_ds34": 64,  # hd VALUES chain
    "q289_sql_text_ds46": 64,  # hd VALUES chain
    "q290_sql_text_ds68": 64,  # hd VALUES chain
    "q317_sql_text_ds64": 64,  # cd1/cd2 + hd1/hd2 VALUES chains (the
    # demographic dims appear TWICE: purchase-time and current)
}

#: LSH/CC pipelines are inherently multi-stage; everything else should stay
#: within a handful of exchanges.
MAX_EXCHANGES_DEFAULT = 6
MAX_EXCHANGES = {
    "q327_triangle_census": 14,  # persisted deg/oriented frames re-print
    # their build lineage per reference (the q137 caveat); the executed
    # job pays: edge distinct, degree agg, wedge self-join on src,
    # closing join on (v,w), 1-row aggregates — measured 10 at sf0.001
    "q81_semantic_dedup": 8,  # r8 hot-cell bound: +1 map-side-combined
    # group-size aggregate (broadcast back); the shared vector-join
    # lineage re-prints once per branch in the textual plan

    "q42_minhash_dedup": 18,  # r8 chain edges: +1 sort-window exchange over
    # the oversize-bucket SUBSET (never the full banded frame) + its
    # union-distinct re-print; r11 digest star edges: +1 window over
    # (id, xxhash64(text)) rows; r11-opt widen_small_scan: +1 tiny
    # round-robin exchange of (id, text) per shingle subtree re-print
    # (measured 17) — each buys 32x map-side parallelism on a one-split
    # corpus scan and no-ops when the scan is already wide
    "q42b_minhash_dedup_planted": 36,  # the corpus is a UNION (docs +
    # planted twins) whose lineage re-PRINTS per reference: banded frame,
    # digest-edge frame, and both sides of the digest-verify join — the
    # textual count multiplies (measured 25 at sf0.001); every exchange
    # is id+digest-width, none fact-sized
    "q43_simhash_dedup": 14,  # +widen exchanges (r11-opt, measured 13)
    "q44_ngram_jaccard": 16,  # +1 r11 digest-star window; +widen
    # exchanges (r11-opt, measured 15)
    "q59_minhash_dedup_cc": 16,  # +widen exchanges (r11-opt)
    "q34b_ivf_topk": 16,  # includes the cached index-build lineage in explain
    "q109_tpch_q21": 8,  # Q21: late-pairs distinct + two per-order aggregates + final rank
    "q118_resample_locf": 8,  # compaction window + grid join + fill window + sort
    "q120_batch_ann_join": 8,  # per-probe candidate + rescore WindowGroupLimit pairs
    "q120b_batch_ivf_join": 16,  # includes the cached index-build lineage in explain
    "q131_corpus_export_pipeline": 10,  # 5-stage composite: dedup agg+semi,
    # survivor counts agg, mixture join, shard agg, final sort
    "q93_duplicated_spans": 9,  # +widen of the un-exploded (id, text)
    # rows per keyed-subtree re-print (r11-opt, measured 8)
    "q330_label_centroid_profile": 12,  # r11 inherited-state fix: the
    # centroid frame lineage re-prints per branch (per-label join,
    # checksum, nn self-join both sides) — measured 10; every exchange
    # is (label, pos)- or |labels|-bounded, none corpus-sized
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
    # Round-7 verbatim TPC-DS pack: the multi-channel texts union three
    # fact channels, each pre-aggregated (sales grain + returns grain +
    # join + re-aggregate) — 2-4 bounded-key exchanges per channel, and
    # every one runs over a shrinking aggregate, never a second fact scan.
    "q223_sql_text_ds5": 10,  # 3 channels x (union agg) + rollup + sort
    "q227_sql_text_ds25": 10,  # 3-fact chain joins + final agg/sort
    "q228_sql_text_ds29": 10,  # same chain, quantity variant
    "q233_sql_text_ds49": 20,  # 3 channels x (2 grain aggs + per-item agg) + rank
    "q236_sql_text_ds75": 28,  # 3 channels x (2 grain aggs + join) + yoy self-join
    # Round-8 pack: EXISTS/NOT-EXISTS queries plan one semi/anti join
    # per channel probe (each over a date-filtered fact aggregate);
    # ds56 unions three channel aggregates.
    "q241_sql_text_ds10": 14,  # +1: customer addr-permutation window (r9)
    # Round-9 pack (measured at sf0.01 + slack): the multi-channel and
    # grain-disciplined texts pay 2-4 bounded exchanges per channel —
    # every one over a shrinking aggregate or a dimension-bounded
    # window frame, never a second fact scan.
    "q296_sql_text_ds58": 18,  # 3 channels x (week agg) + 3-way item join
    "q298_sql_text_ds8": 9,    # zip INTERSECT (2 distincts) + store agg
    "q299_sql_text_ds18": 11,  # rollup + customer re-join + cd broadcast pair
    "q301_sql_text_ds72": 9,   # inventory week join + returns grain + agg
    "q302_sql_text_ds17": 13,  # 3 grain aggs + 3-way chain + stats agg
    "q304_sql_text_ds54": 13,  # union distinct + month-seq scalars + segments
    "q306_sql_text_ds77": 15,  # 6 per-channel aggs + union rollup
    "q307_sql_text_ds80": 15,  # 3 x (2 grain aggs + join) + union rollup
    "q308_sql_text_ds24": 16,  # ssales grain join + two HAVING scalar scans
    "q309_sql_text_ds57": 14,  # v1 windows + lag/lead self-joins
    "q312_sql_text_ds91": 9,   # returns x customer snowflake + agg
    "q313_sql_text_ds39": 10,  # stats agg + month self-join
    "q314_sql_text_ds85": 11,  # 2 grain aggs + demographic snowflake
    "q277_sql_text_ds95": 17,  # ws_wh self-join CTE + two IN semi-joins
    "q278_sql_text_ds9": 17,   # ten scalar bucket subqueries
    "q281_sql_text_ds88": 18,  # eight scalar half-hour counts
    "q284_sql_text_ds51": 11,  # 2 channel running windows + full outer
    "q287_sql_text_ds74": 18,  # 2-channel year_total + 4 role slices
    "q291_sql_text_ds78": 14,  # 3 channel anti-join grains + 2 joins
    "q292_sql_text_ds83": 26,  # 3 channels x (week nest + item agg) + 3-way join
    "q293_sql_text_ds4": 26,   # 3-channel year_total + 6 role slices
    "q294_sql_text_ds11": 18,  # 2-channel year_total + 4 role slices
    "q295_sql_text_ds31": 26,  # 2 channel aggs + 6 role slices
    "q247_sql_text_ds35": 14,  # +1: customer addr-permutation window (r9)
    "q249_sql_text_ds56": 10,
    "q250_sql_text_ds61": 10,
    "q251_sql_text_ds69": 12,  # +1: customer addr-permutation window (r9)
    # Round-8 additions. Every exchange below the first fact aggregate
    # runs over a shrinking bounded grain (|customers|, |states|,
    # |brand x store x month|, or 1-row buckets) — the caps admit the
    # official texts' multi-CTE shapes, not extra fact scans.
    "q257_sql_text_ds1": 8,  # return agg + decorrelated per-store avg + joins + sort
    "q259_sql_text_ds28": 14,  # 6 bucket aggs x (partial/final + count-distinct expand), all 1-row results
    "q260_sql_text_ds30": 12,  # return agg + decorrelated per-state avg + dim joins + sort
    "q261_sql_text_ds38": 16,  # 3 channel distinct grains + INTERSECT exchanges + count
    "q263_sql_text_ds47": 14,  # monthly agg + partitioned windows + official v1^3 self-join + sort
    "q265_sql_text_ds81": 12,  # catalog twin of ds30
    "q266_sql_text_ds87": 16,  # EXCEPT twin of ds38
    # Round-9 closing pack. Spark INLINES (never materializes) CTEs, so
    # ds14's cross_items (3-channel INTERSECT) and avg_sales (3-channel
    # union average) lineages re-PRINT once per channel leg and once per
    # HAVING scalar — the textual count is ~3x the per-reference shape;
    # every exchange is a dimension-bounded aggregate (<=300 triples /
    # 1-row scalar), never a repeated unaggregated fact shuffle.
    "q315_sql_text_ds14a": 84,  # measured 79 at sf0.001
    "q316_sql_text_ds14b": 60,  # measured 54 (2 store legs, not 3 channels)
    # ds64: cs_g/cr_g (item,order)-grain aggregates + cs_ui item agg +
    # the 15-dim snowflake join (dims broadcast; the two DECIMAL-exact
    # HAVING sums add partial/final pairs) + cross_sales agg + self-join
    # sort — re-printed once per self-join side.
    "q317_sql_text_ds64": 44,  # measured 39 at sf0.001
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    from spark_s3_shuffle_spark.queries.registry import prepare_map

    prep = prepare_map()
    problems = []
    for name, spec in QUERIES.items():
        try:
            df = spec.builder(spark, sf_dir)
            plan = I.formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: build error {e}")
            continue
        has_nlj = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        if has_nlj and name not in NESTED_LOOP_OK:
            problems.append(f"{name}: unexpected nested-loop join")
        elif has_nlj:
            # bound check: EXECUTE and measure every nested-loop build side
            try:
                if name in prep:
                    prep[name](spark, sf_dir)
                df.collect()
                rows = I.nested_loop_build_rows(df)
                bound = NESTED_LOOP_OK[name]
                over = [r for r in rows if r > bound]
                if over:
                    problems.append(
                        f"{name}: nested-loop broadcast grew to {max(over)}"
                        f" rows (declared bound {bound})"
                    )
            except Exception as e:  # noqa: BLE001
                problems.append(f"{name}: bound-check error {e}")
        # count from the PRE-execution plan text: after an action, AQE
        # re-prints materialized stages and inflates the textual count
        import re as _re

        nex = len(_re.findall(r"^\(\d+\) Exchange", plan, _re.MULTILINE))
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
