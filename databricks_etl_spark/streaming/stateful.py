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
STATE_SCHEMA = "n bigint, total double"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
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

    from databricks_etl_spark.streaming.windows import stream_events

    name = f"stateful_{uuid.uuid4().hex[:8]}"
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
