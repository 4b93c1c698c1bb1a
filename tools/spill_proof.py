"""Spill-under-pressure proof (A12 parity, round-7).

The reference delegates sort/agg overflow to Spark's ExternalSorter
(`S3ShuffleReader.scala:141-149` wraps the fetched stream in the same
spillable aggregator/sorter every shuffle reader uses). The engine should
DEMONSTRATE, not assume, that its heaviest sorts/aggregations degrade
gracefully when the executor heap can't hold them: this tool re-launches
itself in a memory-constrained JVM, runs the three heaviest queries, and
reports per-stage spill metrics from the AppStatusStore — completion with
nonzero spill is the pass condition.

Usage:
    python tools/spill_proof.py [sf_dir]          # parent: spawns child JVM
    python tools/spill_proof.py --child [sf_dir]  # constrained child

The child JVM runs with driver memory 700m and spark.memory.fraction=0.2
(local mode: driver == executor), small enough that q58's terasort of the
sf0.1 lineitem cannot hold its sort buffers in memory.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_UNDER_TEST = ["q58_terasort", "q93_duplicated_spans", "q145_quantiles_by_group"]


def child(sf_dir: str) -> int:
    from pyspark.sql import SparkSession

    from spark_s3_shuffle_spark.plans.inspect import executed_shuffle_metrics
    from spark_s3_shuffle_spark.queries.registry import QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "700m")
        .config("spark.memory.fraction", "0.2")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        # force ExternalSorter/Aggregator to spill every 100k elements:
        # exercises the spill-merge path DETERMINISTICALLY in all three
        # queries even where the constrained heap alone would just fit
        .config("spark.shuffle.spill.numElementsForceSpillThreshold", "100000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in QUERIES_UNDER_TEST:
        m = executed_shuffle_metrics(
            spark,
            lambda name=name: QUERIES[name].builder(spark, sf_dir).count(),
            f"spill-{name}",
        )
        rows = m.pop("result")
        out[name] = {**m, "result_rows": rows}
    print("SPILL_RESULT " + json.dumps(out, sort_keys=True))
    return 0


def main() -> int:
    if sys.argv[1:2] == ["--child"]:
        return child(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    env = dict(os.environ)
    # driver memory must be set BEFORE JVM launch
    env["PYSPARK_SUBMIT_ARGS"] = "--driver-memory 700m pyspark-shell"
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", sf_dir],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("SPILL_RESULT ")),
        None,
    )
    if proc.returncode != 0 or line is None:
        print(proc.stdout[-3000:])
        print(proc.stderr[-3000:])
        print("FAIL: constrained run did not complete")
        return 1
    results = json.loads(line[len("SPILL_RESULT "):])
    ok = True
    spilled_any = False
    for name, m in results.items():
        spill = m["disk_bytes_spilled"] + m["memory_bytes_spilled"]
        spilled_any = spilled_any or spill > 0
        print(
            f"{name:28s} rows={m['result_rows']:>9,}"
            f" spill_disk={m['disk_bytes_spilled']:>12,}"
            f" spill_mem={m['memory_bytes_spilled']:>13,}"
            f" shuffle={m['shuffle_write_bytes']:>12,}"
        )
        if m["result_rows"] <= 0:
            ok = False
    if not spilled_any:
        print("WARN: no spill observed — constraint too loose to prove A12")
        return 1
    print("PASS: all queries completed under memory pressure, spill engaged")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
