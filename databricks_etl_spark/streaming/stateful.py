"""Custom stateful streaming operator (north star: "custom stateful
operators" via ``applyInPandasWithState``).

Running per-user aggregates maintained in GroupState across
micro-batches — the building block for online counters/sessionizers
that tumbling/session windows can't express (state survives between
triggers; output is one updated row per user per batch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n bigint, total_micro bigint"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    # Accumulate value in exact integer MICRO-UNITS: float accumulation
    # would make the total depend on arrival/batch order (last-ulp
    # drift), while int64 addition is associative — so the final total
    # is deterministic and hash-checkable against the oracle's exact
    # decimal SUM (the stateful analog of the decimal_sum rule).
    n, total_micro = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total_micro += int((pdf["value"] * 1_000_000).round().astype("int64").sum())
    state.update((n, total_micro))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total_micro / 1_000_000]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful running (count, sum(value)) per user. ``events`` must be
    a streaming DataFrame (``spark.readStream``).

    Scale: state is per-key and partitioned by the shuffle on user_id;
    ProcessingTimeTimeout + an upstream watermark bound state growth in
    a production deployment."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_running_totals_stream(spark, sf_dir: str) -> DataFrame:
    """Drive :func:`running_user_totals` with availableNow over the
    events table; returns the final per-user totals as a batch frame."""
    import uuid

    from databricks_etl_spark.streaming.windows import (
        stream_events,
        stream_shuffle,
    )

    name = f"stateful_{uuid.uuid4().hex[:8]}"
    with stream_shuffle(spark, sf_dir, tables=("events",)):
        q = (
            running_user_totals(stream_events(spark, sf_dir))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # keep the last emitted row per user (update mode appends per batch)
    df = spark.table(name)
    return df.groupBy("user_id").agg(
        {"n_events": "max", "total_value": "max"}
    ).withColumnRenamed("max(n_events)", "n_events").withColumnRenamed(
        "max(total_value)", "total_value"
    )


SESSION_OUTPUT = (
    "user_id long, session_start_epoch long, session_end_epoch long, n_events long"
)
SESSION_STATE = "starts array<bigint>, ends array<bigint>, counts array<bigint>"
SESSION_GAP_S = 300  # same 5-minute gap as the batch twin (q80)


def _merge(sessions: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """Merge (start, end, n) runs whose gaps are <= SESSION_GAP_S.
    Input in any order; output sorted by start. Pure function on
    plain ints — unit-testable without Spark."""
    out: list[tuple[int, int, int]] = []
    for s, e, n in sorted(sessions):
        if out and s - out[-1][1] <= SESSION_GAP_S:
            ps, pe, pn = out[-1]
            out[-1] = (ps, max(pe, e), pn + n)
        else:
            out.append((s, e, n))
    return out


def _session_update(key, pdfs, state: GroupState):
    """Watermark-disciplined sessionizer: NOTHING is emitted until the
    event-time watermark passes session_end + gap — the point where
    the engine can PROVE no event can extend the session (out-of-order
    events inside the watermark would otherwise merge two eagerly-
    emitted sessions). Open sessions ride in state as parallel arrays;
    the event-time timeout re-fires the flush when the watermark
    crosses the oldest candidate."""
    import pandas as pd

    sessions: list[tuple[int, int, int]] = []
    if state.exists:
        starts, ends, counts = state.get
        sessions.extend(zip(starts, ends, counts))
    for pdf in pdfs:
        # ts may arrive object-dtype in the state UDF — normalize first.
        # Exact integer floor to epoch seconds via timedelta floordiv:
        # total_seconds() would round-trip through float64, whose ULP at
        # epoch-nanosecond magnitude (~256 ns) can mis-floor an
        # exact-second timestamp.
        ts = pd.to_datetime(pdf["ts"])
        secs = (ts - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
        sessions.extend((int(t), int(t), 1) for t in secs)
    sessions = _merge(sessions)

    wm_ms = state.getCurrentWatermarkMs()
    closed = [x for x in sessions if (x[1] + SESSION_GAP_S) * 1000 <= wm_ms]
    kept = [x for x in sessions if (x[1] + SESSION_GAP_S) * 1000 > wm_ms]

    if kept:
        state.update((
            [s for s, _, _ in kept],
            [e for _, e, _ in kept],
            [n for _, _, n in kept],
        ))
        state.setTimeoutTimestamp(min((e + SESSION_GAP_S) * 1000 for _, e, _ in kept))
    elif state.exists:
        state.remove()

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start_epoch": [s for s, _, _ in closed],
                "session_end_epoch": [e for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )


def sessionize_stateful(events: DataFrame, *, delay: str = "5 minutes") -> DataFrame:
    """Gap-based sessionization as a CUSTOM stateful operator
    (``applyInPandasWithState`` + EventTimeTimeout) — the shape for
    session logic ``session_window`` can't express (per-session
    payloads, dynamic gaps, early heartbeats). Contract: a session is
    emitted exactly once, when the watermark passes its end + gap;
    state holds only open sessions per user (bounded by the watermark
    horizon). Event time is discretized to whole epoch seconds (exact
    integer floor) — gap decisions are made in floored-second space,
    which keeps state integer-typed and mergeable; the batch twin in
    tests/test_streaming.py computes gaps in the same space
    (``unix_timestamp`` diffs), while q80/q52 are microsecond-exact
    against their SQL oracles. Batch-equivalence and emission-frontier
    asserted in tests/test_streaming.py."""
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_stream(spark, sf_dir: str) -> DataFrame:
    """Drive :func:`sessionize_stateful` over the events table with
    availableNow; the final no-data microbatch advances the watermark
    to max(ts) - delay and flushes every provably-closed session."""
    import uuid

    from databricks_etl_spark.streaming.windows import (
        stream_events,
        stream_shuffle,
    )

    name = f"sessfl_{uuid.uuid4().hex[:8]}"
    with stream_shuffle(spark, sf_dir, tables=("events",)):
        q = (
            sessionize_stateful(stream_events(spark, sf_dir))
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
