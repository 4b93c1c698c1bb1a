"""Per-query shuffle-volume report — the engine's analogue of the
reference's published shuffle-data volumes (BASELINE.md: TPC-DS q5 9.6 GB /
q49 1.1 GB / q75 20 GB / q67 66 GB at SF1000).

Runs every registry query at the given sf_dir, executes it, and reports the
materialized exchange sizes AQE observed. Use this to spot queries whose
shuffle volume grows with the input (fact-side shuffles) versus ones
bounded by cardinality (pre-aggregated / broadcast plans) — the difference
is exactly what decides 100 TB viability.

Usage: python tools/shuffle_report.py [--json OUT.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_s3_shuffle_spark.plans.inspect import shuffle_volumes
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
        df = spec.builder(spark, sf_dir)
        df.collect()
        vols = shuffle_volumes(df)
        total = sum(v["bytes"] for v in vols)
        rows.append((name, len(vols), total))
        print(f"{name:32s} exchanges={len(vols):2d} shuffle_bytes={total:>12,}")
    rows.sort(key=lambda r: -r[2])
    print("\ntop shuffle volumes:")
    for name, n, total in rows[:10]:
        print(f"  {name:32s} {total:>12,} bytes across {n} exchanges")
    if json_out:
        payload = {
            "sf_dir": sf_dir,
            "queries": {name: {"exchanges": n, "shuffle_bytes": total} for name, n, total in rows},
            "total_shuffle_bytes": sum(t for _, _, t in rows),
        }
        with open(json_out, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"\nwrote {json_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
