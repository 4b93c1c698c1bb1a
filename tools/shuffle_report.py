"""Per-query PHYSICAL shuffle report — the engine's analogue of the
reference's published shuffle-data volumes (BASELINE.md: TPC-DS q5 9.6 GB /
q49 1.1 GB / q75 20 GB / q67 66 GB at SF1000).

Round-7: metrics come from the AppStatusStore's per-stage task metrics for
exactly the jobs each query executed (job-group tagged), NOT from the
explain text — a multi-job query (prefix machinery, PageRank iterations)
re-prints its lineage per job, so textual exchange counts overstated
(q160 "53 exchanges"), and AQE-skipped stages never run at all. Reported
per query: exchanges actually executed (stages that wrote shuffle
output), shuffle bytes/records written, and spill.

Use this to spot queries whose shuffle volume grows with the input
(fact-side shuffles) versus ones bounded by cardinality (pre-aggregated /
broadcast plans) — the difference is exactly what decides 100 TB
viability.

Usage: python tools/shuffle_report.py [--json OUT.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_s3_shuffle_spark.plans.inspect import executed_shuffle_metrics
from spark_s3_shuffle_spark.queries.registry import QUERIES, prepare_map
from spark_s3_shuffle_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("shuffle-report")
    spark.sparkContext.setLogLevel("ERROR")
    prep = prepare_map()
    rows = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        if name in prep:
            prep[name](spark, sf_dir)

        def run(spec=spec):
            return spec.builder(spark, sf_dir).collect()

        m = executed_shuffle_metrics(spark, run, f"shuffle-{name}")
        m.pop("result")
        rows.append((name, m))
        print(
            f"{name:32s} exchanges={m['exchanges_executed']:2d}"
            f" write_bytes={m['shuffle_write_bytes']:>12,}"
            f" records={m['shuffle_write_records']:>10,}"
            f" spill={m['disk_bytes_spilled']:,}"
        )
    rows.sort(key=lambda r: -r[1]["shuffle_write_bytes"])
    print("\ntop physical shuffle volumes:")
    for name, m in rows[:10]:
        print(
            f"  {name:32s} {m['shuffle_write_bytes']:>12,} bytes across"
            f" {m['exchanges_executed']} executed exchanges"
        )
    if json_out:
        payload = {
            "sf_dir": sf_dir,
            "source": "AppStatusStore per-stage task metrics (job-group scoped)",
            "queries": {name: m for name, m in rows},
            "total_shuffle_write_bytes": sum(
                m["shuffle_write_bytes"] for _, m in rows
            ),
        }
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"\nwrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
