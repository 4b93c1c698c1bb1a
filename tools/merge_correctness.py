"""Merge sharded check_correctness --json artifacts into one, preserving
the registry's query order (the sharded sweep exists because a single
process canonicalizes multi-million-row results single-threaded; four
processes over query subsets cut the sf10 sweep ~3x).

Usage: python tools/merge_correctness.py OUT.json SHARD.json [SHARD.json ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_path, shard_paths = sys.argv[1], sys.argv[2:]
    merged: dict = {}
    for p in shard_paths:
        with open(p) as fh:
            merged.update(json.load(fh))
    from spark_s3_shuffle_spark.queries.registry import QUERIES

    ordered = {name: merged[name] for name in QUERIES if name in merged}
    extra = {k: v for k, v in merged.items() if k not in ordered}
    ordered.update(extra)
    bad = [
        k for k, v in ordered.items()
        if v.get("err") or not (v.get("rows_match") and v.get("schema_match"))
    ]
    with open(out_path, "w") as fh:
        json.dump(ordered, fh, indent=2)
    print(f"wrote {out_path}: {len(ordered)} queries, {len(bad)} failing: {bad[:10]}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
