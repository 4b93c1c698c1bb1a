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
    argv = sys.argv[1:]
    expect = None
    if "--expect" in argv:
        i = argv.index("--expect")
        expect = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    out_path, shard_paths = argv[0], argv[1:]
    merged: dict = {}
    shard_aborts: list[str] = []
    for p in shard_paths:
        with open(p) as fh:
            shard = json.load(fh)
        # Later shards OVERRIDE earlier entries — the redo protocol: a
        # crashed/contended shard's failures are re-run in a fresh shard
        # whose results supersede. Shard _meta aborts are kept as
        # provenance; the merged header's completeness is recomputed from
        # the UNIQUE entries (summing shard totals would double-count
        # re-requested names).
        sm = shard.pop("_meta", None)
        if sm and sm.get("aborted"):
            shard_aborts.append(f"{p}: {sm['aborted']}")
        merged.update(shard)
    from spark_s3_shuffle_spark.queries.registry import QUERIES

    total = expect if expect is not None else len(QUERIES)
    meta = {
        "completed": len(merged),
        "total": total,
        "aborted": None if len(merged) >= total else
        f"only {len(merged)}/{total} queries present",
        "shard_aborts": shard_aborts,
    }
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
    print(
        f"wrote {out_path}: {meta['completed']}/{meta['total']} queries"
        f" (aborted={meta['aborted']}, shard_aborts={len(shard_aborts)}),"
        f" {len(bad)} failing: {bad[:10]}"
    )
    return 1 if bad or meta["aborted"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
