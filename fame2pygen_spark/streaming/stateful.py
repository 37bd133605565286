"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in windows (``streaming/core.py``) cover tumbling/sliding and
gap sessions; anything with bespoke per-key state — running profiles,
cross-batch counters, anomaly scores — needs the arbitrary-state
operator.  State here is one small tuple per key, shuffled once by the
grouping key and stored in the state store: the standard
scalable-streaming shape (state size O(keys), not O(events)).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

RUNNING_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def _update_running(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        s += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, s, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "max_value": [None if mx == float("-inf") else mx],
        }
    )


def running_user_totals_batch(
    events: DataFrame,
    *,
    ts_col: str = "ts_us",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Per-event running (count, sum, max) per user — the batch/backfill
    equivalent of :func:`running_user_totals`: row *i* of a user's
    time-ordered stream carries exactly the state the streaming
    operator holds after processing that event.  Used to backfill or
    verify streaming state by batch reprocessing, and it is plain
    window SQL, so an external oracle checks it value-for-value.

    The cumulative sum runs over ``decimal(18,6)`` so partial-order
    differences can't drift the float result between engines; the
    window orders by (*ts_col*, *order_cols*) for a total, deterministic
    order.  Nulls are skipped by sum/max but counted by n_events,
    matching the streaming semantics.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        *order_cols,
        F.count(F.lit(1)).over(w).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).over(w)
            .cast("double"),
            6,
        ).alias("sum_value"),
        F.round(F.max("value").over(w), 6).alias("max_value"),
    )


def running_user_totals(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Per-user running (count, sum, max) maintained across micro-batches
    — the arbitrary-stateful analog of a cumulative window.

    Works on a stream (cross-batch state) and, degenerately, on a batch
    frame (single pass).  Output mode: update.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
