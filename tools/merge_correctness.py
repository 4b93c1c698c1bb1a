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
    meta = {"completed": 0, "total": 0, "aborted": None}
    for p in shard_paths:
        with open(p) as fh:
            shard = json.load(fh)
        # fold shard _meta headers (round-11 self-describing artifacts):
        # completeness sums across shards; any shard abort taints the merge.
        sm = shard.pop("_meta", None)
        if sm:
            meta["completed"] += sm.get("completed", 0)
            meta["total"] += sm.get("total", 0)
            if sm.get("aborted"):
                ab = f"{p}: {sm['aborted']}"
                meta["aborted"] = f"{meta['aborted']}; {ab}" if meta["aborted"] else ab
        else:  # pre-r11 shard without a header: infer from its entries
            meta["completed"] += len(shard)
            meta["total"] += len(shard)
        merged.update(shard)
    from spark_s3_shuffle_spark.queries.registry import QUERIES

    ordered: dict = {"_meta": meta}
    ordered.update({name: merged[name] for name in QUERIES if name in merged})
    extra = {k: v for k, v in merged.items() if k not in ordered}
    ordered.update(extra)
    bad = [
        k for k, v in ordered.items()
        if k != "_meta"
        and (v.get("err") or not (v.get("rows_match") and v.get("schema_match")))
    ]
    with open(out_path, "w") as fh:
        json.dump(ordered, fh, indent=2)
    n_q = len(ordered) - 1
    print(
        f"wrote {out_path}: {n_q} queries ({meta['completed']}/{meta['total']}"
        f" ran, aborted={meta['aborted']}), {len(bad)} failing: {bad[:10]}"
    )
    return 1 if bad or meta["aborted"] or meta["completed"] < meta["total"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
