"""Custom stateful streaming operator: arbitrary sessionization via
``applyInPandasWithState``.

The native ``session_window`` covers gap-based sessions; this operator
exists for semantics the built-ins can't express (per-session running
custom metrics, early emission rules, value-dependent gaps). It is the
repo's reference implementation of the "custom stateful operator"
pattern: Arrow-batched pandas per key group, explicit GroupState with
event-time timeout, bounded state.

Scale notes: state is partitioned by user_id across the state store
(RocksDB on executors in production); each micro-batch touches only
keys present in the batch plus expiring timers. The pandas hop is
per-key-batch (Arrow), not per-row.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Output schema: one row per closed (or flushed) session.
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        # emitted as exact 1e-6-unit accumulation ÷ 1e6 — see
        # STATE_SCHEMA below
        T.StructField("sum_value", T.DoubleType()),
    ]
)

#: State kept per user: ALL open sessions, parallel arrays sorted by
#: start. Multiple sessions per key are the price of CORRECT
#: out-of-order handling (r10 review): a late-but-within-watermark
#: event can open a session EARLIER than the current one, extend one
#: downward, or bridge two open sessions into one — a single-session
#: state either merged such events into the wrong session (silent
#: session inflation, diverging from the batch islands twin) or lost
#: the downward start extension. List length is bounded by how many
#: gap-separated sessions fit inside the watermark horizon.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts_us", T.ArrayType(T.LongType())),
        T.StructField("ends_us", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        # value accumulates in 1e-6 units as int64 (functions/stable.py
        # discipline): exact, associative, engine-identical — emitted as
        # units/1e6, so the batch islands idiom is a bit-tight oracle
        T.StructField("sum_units", T.ArrayType(T.LongType())),
    ]
)

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        sessions: list[list[int]] = []
        if state.exists:
            starts, ends, counts, sums = state.get
            sessions = sorted(
                [int(a), int(b), int(c), int(d)]
                for a, b, c, d in zip(starts, ends, counts, sums)
            )

        closed: list[tuple] = []
        wm_us = state.getCurrentWatermarkMs() * 1000

        def flush_expired() -> None:
            # a session is CLOSED once the watermark passes end + gap:
            # no admissible event can merge into it anymore. Emission is
            # purely watermark-driven — the pre-r10 inline close (emit
            # the previous session the moment a later event gaps past
            # it) was premature: a late event inside the watermark could
            # still have extended it. STRICTLY past: an on-time event
            # at ts == wm == end + gap is still admissible and would
            # merge (the batch islands rule keeps gap-equal events
            # in-session), so closing at <= would split that session
            # (r10 review, sixth pass).
            still = []
            for s in sessions:
                if s[1] + gap_us < wm_us:
                    closed.append((user_id, s[0], s[1], s[2], s[3]))
                else:
                    still.append(s)
            sessions[:] = still

        if not state.hasTimedOut:
            # CONCATENATE the group's Arrow chunks before the ONE sort:
            # a key whose micro-batch rows exceed arrow.maxRecordsPerBatch
            # arrives as several pdfs in arbitrary relative order, and
            # sorting each chunk independently would walk the gap state
            # machine time-misordered. Memory stays bounded by one key's
            # micro-batch volume.
            pdfs = [p for p in pdf_iter if len(p)]
            if pdfs:
                pdf = pd.concat(pdfs, ignore_index=True).sort_values("ts")
                for ts, value in zip(
                    pdf["ts"].astype("int64"), pdf["value"].fillna(0.0)
                ):
                    # pandas int64 of a timestamp is nanoseconds
                    ts_us = ts // 1000
                    units = int(math.floor(float(value) * 1e6 + 0.5))
                    cur = [ts_us, ts_us, 1, units]
                    keep = []
                    for s in sessions:
                        # merge every session within gap of the event —
                        # an event can BRIDGE two sessions into one
                        if s[0] - gap_us <= ts_us <= s[1] + gap_us:
                            cur = [
                                min(cur[0], s[0]),
                                max(cur[1], s[1]),
                                cur[2] + s[2],
                                cur[3] + s[3],
                            ]
                        else:
                            keep.append(s)
                    keep.append(cur)
                    keep.sort()
                    sessions = keep

        flush_expired()
        if sessions:
            state.update(
                (
                    [s[0] for s in sessions],
                    [s[1] for s in sessions],
                    [s[2] for s in sessions],
                    [s[3] for s in sessions],
                )
            )
            # wake when event time passes the EARLIEST open horizon;
            # the timeout must sit strictly above the current watermark
            horizon_ms = (min(s[1] for s in sessions) + gap_us) // 1000
            state.setTimeoutTimestamp(max(horizon_ms, wm_us // 1000 + 1))
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] * 1000 for c in closed], utc=True
                    ).tz_localize(None),
                    "session_end": pd.to_datetime(
                        [c[2] * 1000 for c in closed], utc=True
                    ).tz_localize(None),
                    "n_events": [c[3] for c in closed],
                    "sum_value": [c[4] / 1e6 for c in closed],
                }
            )

    return fn


def sessionize_with_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessionization as a custom stateful operator.

    Emits one row per CLOSED session (a session closes when the
    event-time watermark passes session_end + gap). Equivalent closed
    sessions match ``windows.session_aggregate``; this variant is the
    template to extend when session logic outgrows the built-in.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


#: TTL-throttle output: the kept (rate-limited) events.
THROTTLE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

#: State kept per user: event-time (µs) of the last EMITTED event.
THROTTLE_STATE_SCHEMA = T.StructType([T.StructField("last_emit_us", T.LongType())])


def _throttle_fn(ttl_seconds: int):
    ttl_us = ttl_seconds * _US

    def fn(
        key: tuple, pdf_iter: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        last = state.get[0] if state.exists else None
        kept_ids: list[int] = []
        kept_ts: list[int] = []
        # deterministic sequential order over the WHOLE micro-batch:
        # concat the group's Arrow chunks first (a key spanning
        # multiple chunks arrives in arbitrary relative order —
        # per-chunk sorting would let an earlier-timestamp chunk walk
        # the gate after a later one and emit events a correctly
        # ordered walk suppresses), then one sort on (ts, event_id)
        pdfs = [p for p in pdf_iter if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for ts_ns, eid in zip(pdf["ts"].astype("int64"), pdf["event_id"]):
                ts_us = int(ts_ns) // 1000
                if last is None or ts_us - last >= ttl_us:
                    kept_ids.append(int(eid))
                    kept_ts.append(ts_us)
                    last = ts_us
        if last is not None:
            state.update((last,))
        if kept_ids:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(kept_ids),
                    "event_id": kept_ids,
                    "ts": pd.to_datetime(
                        [t * 1000 for t in kept_ts], utc=True
                    ).tz_localize(None),
                }
            )

    return fn


def ttl_throttle_with_state(
    events: DataFrame,
    ttl_seconds: int = 86400,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-key event-time rate limiter: emit an event only if at least
    ``ttl_seconds`` of EVENT TIME passed since the last emitted event
    of the same user — the "at most one per key per interval" gate
    (API throttling, per-source crawl politeness, training-corpus
    per-domain caps). Inherently stateful: whether an event passes
    depends on which earlier events PASSED, not merely on the previous
    event — no window/lag expression computes it in one pass, which is
    exactly when ``applyInPandasWithState`` is the right tool (the
    SQL oracle needs a recursive CTE).

    State per key is a single int64 (last emitted event-time) — at
    100 TB the store holds |active keys| × 8 bytes, and each
    micro-batch touches only the keys present in it. NoTimeout: the
    throttle gate never expires by itself; swap in an event-time
    timeout to forget idle keys once the watermark passes their last
    emission + TTL (exactly the state-hygiene pattern the sessionizer
    above demonstrates)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _throttle_fn(ttl_seconds),
            outputStructType=THROTTLE_SCHEMA,
            stateStructType=THROTTLE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------- #
# transformWithState (Spark 4's arbitrary-state API)                #
# ---------------------------------------------------------------- #

#: Output: one row per input purchase with the user's running total.
RUNNING_TOTAL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        # lifetime spend in exact 1e-6 units (stable.py discipline)
        T.StructField("running_units", T.LongType()),
    ]
)


def make_running_total_processor():
    """Per-user lifetime-spend counter on the transformWithState API
    (Spark 4's successor to applyInPandasWithState): a single int64
    ValueState per user accumulates purchase value in exact 1e-6
    units; every input row emits its running total. Rows are sorted
    (ts, event_id) inside each key-batch so the emitted prefix sums
    are a pure function of event order — independent of micro-batch
    boundaries as long as batches respect time order (staged as one
    file → one batch under the test gate)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotal(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._total = handle.getValueState("total", "units BIGINT")

        def handleInputRows(self, key, rows, timer_values):
            pdf = pd.concat(list(rows), ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            units = (
                # fillna BEFORE the floor: a NULL purchase arrives as
                # NaN and math.floor(nan) raises, killing the query —
                # same null contract the sessionizer already defends
                (pdf["value"].fillna(0.0).astype("float64") * 1_000_000.0 + 0.5)
                .map(math.floor)
                .astype("int64")
            )
            prior = self._total.get()[0] if self._total.exists() else 0
            running = units.cumsum() + prior
            self._total.update((int(running.iloc[-1]),))
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"].astype("int64"),
                    "user_id": pdf["user_id"].astype("int64"),
                    "running_units": running.astype("int64"),
                }
            )

        def close(self) -> None:
            pass

    return RunningTotal()


def running_total_with_state(events: DataFrame) -> DataFrame:
    """Wire the processor: purchases only, grouped by user,
    transformWithStateInPandas in append mode, no timers."""
    from pyspark.sql import functions as F

    purchases = events.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    )
    return purchases.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_running_total_processor(),
        outputStructType=RUNNING_TOTAL_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
