"""Core-count scaling probe (VERDICT r11 item 8): time a query subset at
the CURRENT $SPARK_GRAFT_CPUS in one JVM, so two invocations (e.g. 32 vs
8 cores) yield per-query low/high-core ratios at a scale factor where
parallelism actually matters (sf0.1's fixtures are too small — the r11
scaling block measured 0.9-1.1x for nearly everything, which says nothing
about plan parallelism).

    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/.sf1 \
        python tools/core_scaling.py --json OUT32.json [query ...]
    SPARK_GRAFT_CPUS=8  SPARK_GRAFT_SF_DIR=/root/repo/.sf1 \
        python tools/core_scaling.py --json OUT8.json  [query ...]

Protocol matches bench.py: warmup query + prepare_map() before timing,
min-of-N (default 2) collect() per query. Caveat inherited from the
measurement notes: the two core counts necessarily run in SEPARATE JVMs
(master is fixed at launch), so single-query ratios carry the box's
cross-session drift; read the FAMILY pattern, not one number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_s3_shuffle_spark.queries.registry import QUERIES, prepare_map
from spark_s3_shuffle_spark.session import get_spark

#: The >= 2 s families from the r11/r12 benches — the queries whose
#: "parallelizes at scale" claims item 8 asks to ground in data.
DEFAULT_QUERIES = [
    "q137_pagerank_trade_graph",
    "q160_rfm_segmentation",
    "q223_sql_text_ds5",
    "q233_sql_text_ds49",
    "q236_sql_text_ds75",
    "q238_sql_text_ds67",
    "q315_sql_text_ds14a",
    "q316_sql_text_ds14b",
    "q317_sql_text_ds64",
    "q42_minhash_dedup",
    "q42b_minhash_dedup_planted",
    "q43_simhash_dedup",
    "q59_minhash_dedup_cc",
    "q93_duplicated_spans",
    "q34b_ivf_topk",
    "q120_batch_ann_join",
    "q120b_batch_ivf_join",
    "q328_kmeans_quantized",
    "q329_bpe_train_encode",
]


def main() -> int:
    args = sys.argv[1:]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args or DEFAULT_QUERIES
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))

    spark = get_spark(f"core-scaling-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q12_tpch_q1_agg"].builder(spark, sf_dir).collect()  # warmup
    for prep in prepare_map().values():
        prep(spark, sf_dir)

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].builder
        samples = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            samples.append(time.monotonic() - t0)
        timings[name] = round(min(samples), 4)
        print(f"{name}: {timings[name]}s", file=sys.stderr)

    out = {"cpus": cpus, "sf_dir": sf_dir, "runs": runs, "queries": timings}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
