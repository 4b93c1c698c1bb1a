"""transformWithState-based stateful operators (Spark 4's successor to
applyInPandasWithState, SPARK-49564 / the `StatefulProcessor` API).

Where `applyInPandasWithState` exposes ONE opaque state tuple per key,
`transformWithStateInPandas` gives named, typed state primitives
(ValueState / ListState / MapState) plus timers, backed by the RocksDB
state store with changelog checkpointing — the shape that survives 100 TB
streams: state lives off-heap per key-partition, micro-batches touch only
the keys present in the batch, and schema'd state can evolve.

`ops.stateful_running_totals` keeps the older API for comparison; the
operator here is the engine's forward path. Requires
``spark.sql.streaming.stateStore.providerClass =
...RocksDBStateStoreProvider`` and a working ``google.protobuf`` (the
transformWithState runner speaks protobuf to the JVM — the test gates on
both and skips where the dependency is absent, e.g. this container)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("events", LongType()), StructField("total_value", DoubleType())]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-key running (event count, value sum), emitted every micro-batch
    — the q30/stateful_running_totals semantics re-expressed on the
    ValueState primitive."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        events, total = 0, 0.0
        if self._state.exists():
            events, total = self._state.get()
        for pdf in rows:
            events += len(pdf)
            total += float(pdf["value"].sum())
        self._state.update((events, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "events": [events], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_tws(df: DataFrame, key: str = "user_id") -> DataFrame:
    """Apply RunningTotalsProcessor over a (possibly streaming) frame keyed
    by ``key``. Output mode Update: one row per touched key per batch."""
    return df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
