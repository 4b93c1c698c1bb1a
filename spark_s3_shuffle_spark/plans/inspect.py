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
