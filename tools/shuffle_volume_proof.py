"""Engine-vs-reference shuffle-volume cross-check (round-10, VERDICT r9
item 1) — the one quantitative claim of the reference nobody had
validated against: its published per-query shuffle volumes for the DS
headline quartet at SF1000 (`examples/run_benchmarks.sh:30-33`):

    q67 66 GB  >>  q75 20 GB  >>  q5 9.6 GB  >>  q49 1.1 GB

Protocol. The reference measures queries over MATERIALIZED TPC-DS tables
(dsdgen parquet), where every scan carries its true file size, so
dimension joins broadcast under Spark's cost model and shuffle volume is
dominated by aggregate/fact-join grain. Running the same texts over this
repo's *derived* DS views instead puts fact-sized estimates under every
dim CTE (a DISTINCT-over-fact subplan keeps its child's size estimate)
and the planner shuffles facts for dim joins — measuring the VIEW
DERIVATION, not the query. So this tool first materializes the DS
snowflake (`sources/tpcds.py materialize`, cached per sf_dir), registers
plain parquet-backed views, runs each headline BODY (not the composed
CTE text) through `executed_shuffle_metrics`, and reports volumes from
the AppStatusStore — executed-plan truth, like SHUFFLE_r09.

What is asserted (tests/test_plans.py::test_shuffle_volume_ordering_*):

- **Within-engine ordering** at each SF mirrors the reference's grain
  logic where the fixture preserves it: the cross-channel fact-fact
  queries (ds75, ds49) out-shuffle the pre-aggregable channel rollup
  (ds5). ds67's position is fixture-dependent BY CONSTRUCTION — its
  volume is the (item x store x month) rollup grain, which at TPC-DS
  SF1000 is the largest number in the suite but in this key-replicated
  fixture is bounded by |part| x |supplier| — so the assertion pins the
  grain RELATIONSHIP (ds67's volume ~ its rollup-grain row count, and
  it grows superlinearly sf1->sf10 because the replicated fixture grows
  BOTH dims 10x) rather than blindly copying the reference's rank.
- **Scaling**: fact-bound volumes (ds5/ds49/ds75) grow ~linearly with SF
  (10x data -> 7x..13x bytes); nothing grows quadratically.

Usage:
    python tools/shuffle_volume_proof.py [--json OUT.json] SF_DIR [SF_DIR2 ...]

Each SF_DIR gets a sibling cache dir `<SF_DIR>-ds/` of materialized DS
parquet (written once, reused).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_s3_shuffle_spark.plans.inspect import executed_shuffle_metrics
from spark_s3_shuffle_spark.session import get_spark
from spark_s3_shuffle_spark.sources import tpcds
from spark_s3_shuffle_spark.queries.tpcds_text import DS_BODIES

#: The reference's headline quartet with its published SF1000 volumes.
HEADLINE = {
    "q238_sql_text_ds67": 66.0,
    "q236_sql_text_ds75": 20.0,
    "q223_sql_text_ds5": 9.6,
    "q233_sql_text_ds49": 1.1,
}


def materialized_dir(spark, sf_dir: str) -> str:
    out = sf_dir.rstrip("/") + "-ds"
    done = os.path.join(out, "_MATERIALIZED")
    if not os.path.exists(done):
        counts = tpcds.materialize(spark, sf_dir, out)
        with open(done, "w") as fh:
            json.dump(counts, fh)
    return out


def register_materialized(spark, ds_dir: str) -> None:
    for name in tpcds.DS_VIEWS:
        spark.read.parquet(os.path.join(ds_dir, f"{name}.parquet")).createOrReplaceTempView(name)


def measure(spark, sf_dir: str) -> dict[str, dict]:
    ds_dir = materialized_dir(spark, sf_dir)
    register_materialized(spark, ds_dir)
    out: dict[str, dict] = {}
    for name in HEADLINE:
        body = DS_BODIES[name][0]

        def run(body=body):
            return spark.sql(body).collect()

        m = executed_shuffle_metrics(spark, run, f"volproof-{name}")
        m.pop("result")
        out[name] = m
        print(
            f"{sf_dir} {name:24s} exchanges={m['exchanges_executed']:2d}"
            f" write_bytes={m['shuffle_write_bytes']:>14,}"
            f" spill={m['disk_bytes_spilled']:,}"
        )
    return out


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dirs = args or ["/root/repo/.sf1", "/root/repo/.sf10"]
    spark = get_spark("shuffle-volume-proof")
    spark.sparkContext.setLogLevel("ERROR")
    payload = {
        "reference_sf1000_gb": HEADLINE,
        "protocol": "materialized DS tables (accurate scan stats), executed-plan"
                    " AppStatusStore metrics, headline bodies via spark.sql",
        "per_sf": {},
    }
    for sf_dir in sf_dirs:
        payload["per_sf"][sf_dir] = measure(spark, sf_dir)
    if len(sf_dirs) == 2:
        a, b = (payload["per_sf"][d] for d in sf_dirs)
        payload["growth"] = {
            q: round(b[q]["shuffle_write_bytes"] / a[q]["shuffle_write_bytes"], 2)
            for q in HEADLINE
            if a[q]["shuffle_write_bytes"]
        }
        print("growth ratios:", payload["growth"])
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
