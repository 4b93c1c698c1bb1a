"""Partitioning-invariance sweep: every registry query executed under two
DIFFERENT shuffle-parallelism settings must produce identical canonical
results — the generalized form of the engine's determinism claim (exact
integer/decimal accumulation, tie-broken windows, fixed-shape float
expressions, content-addressed sampling/hashing). A query whose result
drifts with `spark.sql.shuffle.partitions` would silently drift between
a 32-core laptop and a 1000-executor cluster; this sweep pins ALL of
them, including the hash-family rows-only queries the DuckDB oracle
cannot value-check (their determinism matters just as much).

Usage: python tools/determinism_sweep.py [--json OUT.json] [sf_dir] [query ...]
(query names restrict the sweep — used to top up an existing artifact
after registry additions; merge the subset into the full artifact's
``queries`` dict.)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_correctness import rows_canon  # noqa: E402

from spark_s3_shuffle_spark.queries.registry import QUERIES, prepare_map  # noqa: E402
from spark_s3_shuffle_spark.session import get_spark  # noqa: E402

PARTS_A = "32"
PARTS_B = "7"


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("determinism-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    prep = prepare_map()
    report: dict[str, dict] = {}
    failures = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        if name in prep:
            prep[name](spark, sf_dir)
        rec = {"invariant": False, "rows": None, "err": None}
        report[name] = rec
        try:
            runs = []
            for parts in (PARTS_A, PARTS_B):
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                df = spec.builder(spark, sf_dir)
                runs.append(
                    rows_canon(df.columns, [tuple(r) for r in df.collect()])
                )
            rec["rows"] = len(runs[0])
            rec["invariant"] = runs[0] == runs[1]
            if not rec["invariant"]:
                failures.append((name, "results differ across partition counts"))
                print(f"FAIL {name}: partition-count drift")
            else:
                print(f"ok   {name}: invariant ({rec['rows']} rows)")
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"
            failures.append((name, rec["err"]))
            print(f"FAIL {name}: {e}")
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", PARTS_A)
    n = len(report)
    print(f"\n{n - len(failures)}/{n} invariant")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "parts": [PARTS_A, PARTS_B], "queries": report},
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
