"""Physical-plan inspection utilities.

The engine's scale guarantees are plan properties — filters pushed to the
scan, dims broadcast, whole-stage codegen fused, no unexpected exchanges.
These helpers capture ``explain`` output so tests can ASSERT those
properties instead of hoping (SURVEY "optimize for scale" checklist).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def plan_has(df: DataFrame, *needles: str) -> bool:
    plan = formatted_plan(df)
    return all(n.lower() in plan.lower() for n in needles)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from the scan nodes (empty list = nothing
    reached the parquet reader — a scale bug for selective queries)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets each scan actually reads (column pruning check: a scan
    reading all columns for a 2-column projection is wrong)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan. Every exchange is a full network/object-
    store round trip at scale — tests pin expected counts for key plans.
    Counts node-detail headers only (each node appears twice in formatted
    output: once in the tree, once as ``(n) Exchange``)."""
    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


_SIZE_UNITS = {
    "B": 1,
    "KiB": 1 << 10,
    "MiB": 1 << 20,
    "GiB": 1 << 30,
    "TiB": 1 << 40,
    "PiB": 1 << 50,
    "EiB": 1 << 60,
}


def shuffle_volumes(df: DataFrame) -> list[dict]:
    """Per-exchange shuffle volume of an EXECUTED DataFrame (run an action
    first): AQE stamps materialized ShuffleQueryStage nodes with
    ``Statistics(sizeInBytes=…, rowCount=…)`` in the explain output. This is
    the engine's analogue of the reference's per-query shuffle-volume
    numbers (BASELINE.md's q5=9.6GB table) and of its write-side metering
    (S3MeasureOutputStream.scala:8-65) — measured, per stage, no listener
    plumbing."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(
        r"ShuffleQueryStage \(\d+\), Statistics\(sizeInBytes=([\d.]+)\s*(\w+)(?:, rowCount=([\d.E+]+))?\)",
        plan,
    ):
        unit = m.group(2)
        if unit not in _SIZE_UNITS:
            # never silently treat an unknown unit as bytes — at the scales
            # this tool targets that underreports by up to 2^50
            raise ValueError(f"unknown size unit {unit!r} in plan statistics: {m.group(0)}")
        size = float(m.group(1)) * _SIZE_UNITS[unit]
        rows = int(float(m.group(3))) if m.group(3) else None
        out.append({"bytes": int(size), "rows": rows})
    return out


def total_shuffle_bytes(df: DataFrame) -> int:
    return sum(s["bytes"] for s in shuffle_volumes(df))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider is better (fewer breaks out
    of generated code). Spark renders them as ``WholeStageCodegen (n)`` in
    tree mode, ``*(n)`` in simple mode, and a bare ``*`` prefix in formatted
    mode; count whichever notation appears. AQE plans hide the markers until
    stages materialize — inspect with AQE off for a static answer."""
    plan = formatted_plan(df)
    spans = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)) | set(re.findall(r"\*\((\d+)\)", plan))
    if spans:
        return len(spans)
    return 1 if re.search(r"^\s*(?:[+:]-\s*)?\* ", plan, re.MULTILINE) else 0
