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


SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


class TimerSessionProcessor(StatefulProcessor):
    """Event-time sessionization on the timer primitive — the custom
    stateful operator shape `session_window` can't express when you need
    per-session side effects (emit-on-close, state TTL, session-length
    caps): one ValueState row per OPEN session and one event-time timer at
    ``end + gap`` (timers are ms-grain; state is µs-grain) that closes and emits the session when the watermark
    passes it. In-batch gaps are split eagerly (events inside one
    micro-batch never wait on a timer); only the trailing open session per
    key lives in state — O(active keys), not O(events), which is what
    survives a 100 TB stream.

    Semantics match batch ``session_window(gap)`` exactly for every
    session the final watermark has closed (the equality test asserts
    emitted == batch minus watermark-tail sessions).
    """

    def __init__(self, gap_us: int) -> None:
        self._gap_us = gap_us

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", _SESSION_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        start = end = None
        n = 0
        if self._sess.exists():
            start, end, n = self._sess.get()
        ts_all = []
        for pdf in rows:
            # pandas datetime64[ns] -> epoch µs: the SAME integer domain
            # session_window compares in, so gap decisions match exactly
            ts_all.extend((pdf["event_ts"].astype("int64") // 1_000).tolist())
        closed = []
        for ts in sorted(ts_all):
            if start is None:
                start, end, n = ts, ts, 1
            elif ts - end > self._gap_us:
                closed.append((start, end, n))
                start, end, n = ts, ts, 1
            else:
                end, n = max(end, ts), n + 1
        self._sess.update((start, end, n))
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer((end + self._gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "start_us": [c[0] for c in closed],
                    "end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self._sess.exists():
            start, end, n = self._sess.get()
            self._sess.clear()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "start_us": [start],
                    "end_us": [end],
                    "n_events": [n],
                }
            )

    def close(self) -> None:
        pass


def sessionize_tws(
    df: DataFrame, gap_us: int, key: str = "user_id"
) -> DataFrame:
    """Timer-driven sessionization over a watermarked stream keyed by
    ``key`` (event-time timers need the watermark to advance, so callers
    must `withWatermark` first)."""
    return df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=TimerSessionProcessor(gap_us),
        outputStructType=SESSION_OUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )


FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("v_us", LongType()),
        StructField("c_us", LongType()),
        StructField("p_us", LongType()),
    ]
)

_FUNNEL_FINAL_SCHEMA = StructType(
    [
        StructField("v_us", LongType()),
        StructField("c_us", LongType()),
        StructField("p_us", LongType()),
    ]
)

_FUNNEL_PENDING_SCHEMA = StructType(
    [StructField("ts_us", LongType()), StructField("kind", LongType())]
)

_KINDS = {"view": 0, "click": 1, "purchase": 2}


class FunnelProcessor(StatefulProcessor):
    """Exact streaming funnel (first view -> first click strictly after it
    -> first purchase strictly after that; batch twin = registry q144's
    stage windows), correct under ARBITRARY arrival order:

    An early click only qualifies once we know no earlier view will ever
    arrive, so events are buffered in ListState until the WATERMARK
    passes them; the below-watermark prefix is then folded in event-time
    order into three monotone finals (ValueState) and dropped from the
    buffer. That makes state O(events within the watermark horizon) per
    key — bounded by lateness, not stream length — the only exact design
    an out-of-order stream admits (without the buffer, a late view
    re-opens already-rejected clicks). A final event-time timer past the
    last buffered event flushes each user's funnel when the stream
    drains; Update mode emits the finals then.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._final = handle.getValueState("final", _FUNNEL_FINAL_SCHEMA)
        self._pending = handle.getListState("pending", _FUNNEL_PENDING_SCHEMA)

    @staticmethod
    def _fold(state, events):
        v, c, p = state
        for ts, kind in events:  # caller passes event-time order
            if kind == 0:
                if v is None or ts < v:
                    v = ts
            elif kind == 1:
                if v is not None and ts > v and (c is None or ts < c):
                    c = ts
            else:
                if c is not None and ts > c and (p is None or ts < p):
                    p = ts
        return v, c, p

    def _read_pending(self):
        out = []
        for batch in self._pending.get():
            # rows arrive as an iterator of tuples
            out.append((batch[0], batch[1]))
        return out

    def handleInputRows(self, key, rows, timerValues):
        pend = self._read_pending()
        for pdf in rows:
            ts_us = (pdf["event_ts"].astype("int64") // 1_000).tolist()
            kinds = [_KINDS[k] for k in pdf["event_type"].tolist()]
            pend.extend(zip(ts_us, kinds))
        pend.sort()
        wm_us = timerValues.getCurrentWatermarkInMs() * 1000
        ready = [e for e in pend if e[0] < wm_us]
        hold = [e for e in pend if e[0] >= wm_us]
        finals = (
            tuple(self._final.get()) if self._final.exists() else (None, None, None)
        )
        finals = self._fold(finals, ready)
        self._final.update(finals)
        self._pending.clear()
        if hold:
            self._pending.appendList(hold)
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        last = hold[-1][0] if hold else (ready[-1][0] if ready else wm_us)
        self._handle.registerTimer(last // 1000 + 1)
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        pend = sorted(self._read_pending())
        finals = (
            tuple(self._final.get()) if self._final.exists() else (None, None, None)
        )
        finals = self._fold(finals, pend)
        self._final.update(finals)
        self._pending.clear()
        if finals[0] is not None:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "v_us": [finals[0]],
                    "c_us": [finals[1]],
                    "p_us": [finals[2]],
                }
            )

    def close(self) -> None:
        pass


def funnel_tws(df: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming funnel over a watermarked frame carrying ``event_ts`` and
    ``event_type`` (view/click/purchase rows only)."""
    return df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=FunnelProcessor(),
        outputStructType=FUNNEL_OUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )
