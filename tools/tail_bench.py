"""sf1 -> sf10 tail bench: time the documented explode-heavy queries at
both scales IN ONE JVM and report the wall-clock scale ratio per query.

The full-suite oracle sweeps (sf0.01 / sf0.1 / sf1) catch correctness;
this harness catches the NEXT decade of super-linearity in the queries
whose cost is dominated by pair/candidate explosion rather than scan
volume (the reference's analogous concern is shuffle-volume growth,
BASELINE.md). Paired-in-one-JVM for the same reason bench.py pairs
engine/vanilla: separate launches drift 15%+ on this host.

Per query it reports min-of-N seconds at each scale, the output row
counts at each scale, and ``time_ratio`` = t_sf10 / t_sf1. With a 10x
input and 32 local cores, a scan-linear query lands well under 10x
(more parallelism headroom at the larger scale); candidate-explosion
queries are judged against their OUTPUT growth (``rows_ratio``) — a
time_ratio far above both 10x and the rows_ratio is the super-linearity
signal this exists to catch.

    SPARK_GRAFT_DRIVER_MEM=24g python tools/tail_bench.py  # default tails
    python tools/tail_bench.py --all                       # FULL suite (r8)
    python tools/tail_bench.py q93_duplicated_spans        # subset

Full-suite mode (round-8 directive 1) sweeps EVERY registry query at
both scales and flags any with time_ratio above the 10x data growth,
attaching the documented cause where one is known (KNOWN_SUPERLINEAR)
and "UNEXPLAINED" otherwise — an unexplained flag is a finding, not a
formatting artifact.

Heap sizing: this sweep holds BOTH scales' pinned state in ONE JVM (the
IVF index and SemDeDup centroids at sf1 AND sf10, plus checkpoint blocks
from every prior query until the ContextCleaner reaps them) — state a
real cluster spreads over executors. The default 8g heap OOMs partway
through the list (measured: q59's component join, after 4 queries x 2
scales of accumulated blocks); run with SPARK_GRAFT_DRIVER_MEM=24g.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from spark_s3_shuffle_spark.queries.registry import QUERIES, prepare_map
from spark_s3_shuffle_spark.session import get_spark

SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", os.path.join(os.path.dirname(_HERE), ".sf1"))
SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", os.path.join(os.path.dirname(_HERE), ".sf10"))
OUT_JSON = os.environ.get(
    "SPARK_GRAFT_TAIL_OUT", os.path.join(os.path.dirname(_HERE), "BENCH_SF10_TAIL.json")
)

#: The documented explode-heavy tails (VERDICT r6 directive 7) plus the
#: auto-cell-sized ANN family the sf10 check forced a redesign of.
DEFAULT_TAILS = [
    "q93_duplicated_spans",
    "q161_basket_cooccurrence",
    "q42_minhash_dedup",
    "q43_simhash_dedup",
    "q59_minhash_dedup_cc",
    "q81_semantic_dedup",
    "q34b_ivf_topk",
    "q120b_batch_ivf_join",
    "q218_sliding_window_agg",
    # The reference's DS headline queries (run_benchmarks.sh:29-34):
    # shuffle-heaviest of the verbatim pack, scale-checked like any tail.
    "q223_sql_text_ds5",
    "q236_sql_text_ds75",
    "q238_sql_text_ds67",
    # Round-11 (VERDICT r10 item 7): the media decoders and the rebuilt
    # exact-dup tier joined after the r10 tail ran — their cost is pure
    # per-document CPU (Python codecs inside mapInPandas), so the thing
    # to confirm at 10x docs is that the constant stays LINEAR.
    "q318_png_decode",
    "q319_jpeg_decode",
    "q320_video_decode",
    "q321_mjpeg_video_decode",
    "q322_adpcm_audio_decode",
    "q42b_minhash_dedup_planted",
]


#: Queries whose sf10/sf1 wall ratio legitimately exceeds the 10x data
#: growth, each with the measured workload-growth reason. The full-suite
#: sweep attaches these; anything else over 10x is flagged UNEXPLAINED.
KNOWN_SUPERLINEAR: dict[str, str] = {
    "q120b_batch_ivf_join": (
        "probe count grows with N AND per-probe scan grows ~log(cells)*sqrt(N)"
        " (r8 nprobe policy): workload ~N^1.5 by construction; r7's 34.6x"
        " was cut to ~12x by the log-nprobe change"
    ),
    "q18_rank_topk_per_group": (
        "output itself is O(N) ranked rows (4.5M at sf10); collect-bound"
    ),
    "q74_salted_topk_per_group": "same O(N) ranked output as q18",
    # q62_scalar_breadth was listed here through round 9 (data-sized
    # output, driver-collect bound); round 10 bounded its contract with a
    # deterministic LIMIT 1000, so a reappearing flag would be a real
    # regression — intentionally NOT pre-explained anymore.
}


def time_query(spark, name: str, sf_dir: str, runs: int) -> tuple[float, int]:
    fn = QUERIES[name].builder
    rows = len(fn(spark, sf_dir).collect())  # warmup (codegen + page cache)
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        best = min(best, time.monotonic() - t0)
    return best, rows


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--all":
        names = list(QUERIES)
    else:
        names = args or DEFAULT_TAILS
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark("tail-bench")
    report: dict[str, dict] = {}
    preps = prepare_map()
    for sf_dir in (SF1_DIR, SF10_DIR):
        for name in names:  # only the preps the tail set actually uses
            if name in preps:
                preps[name](spark, sf_dir)
    for name in names:
        try:
            t1, r1 = time_query(spark, name, SF1_DIR, runs)
            t10, r10 = time_query(spark, name, SF10_DIR, runs)
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            report[name] = {"err": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps({name: report[name]}), flush=True)
            continue
        rec = {
            "sf1_s": round(t1, 3),
            "sf10_s": round(t10, 3),
            "time_ratio": round(t10 / t1, 2) if t1 > 0 else None,
            "sf1_rows": r1,
            "sf10_rows": r10,
            "rows_ratio": round(r10 / r1, 2) if r1 else None,
        }
        if rec["time_ratio"] is not None and rec["time_ratio"] > 10:
            rec["flag"] = KNOWN_SUPERLINEAR.get(name, "UNEXPLAINED")
        report[name] = rec
        print(json.dumps({name: report[name]}), flush=True)
    ratios = [v["time_ratio"] for v in report.values() if v.get("time_ratio")]
    out = {
        "metric": "sf10_tail_scale_ratio",
        "sf1_dir": SF1_DIR,
        "sf10_dir": SF10_DIR,
        "runs_per_scale": runs,
        "queries": report,
        "n_queries": len(report),
        "n_flagged": sum(1 for v in report.values() if "flag" in v),
        "time_ratio_max": max(ratios) if ratios else None,
    }
    with open(OUT_JSON, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
    print(f"wrote {OUT_JSON}")
    spark.stop()


if __name__ == "__main__":
    main()
