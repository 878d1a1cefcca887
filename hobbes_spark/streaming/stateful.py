"""Custom stateful streaming operator via ``applyInPandasWithState``.

This is the extension hatch the reference lacks entirely (its `.hb`
language has no UDF hook — SURVEY §2.12): arbitrary per-key state kept
by the engine across microbatches, with timeout-based eviction.

``running_user_totals`` keeps a running (count, sum, max ts) per user
and emits the updated row whenever the user appears in a microbatch —
a streaming version of ``expanding sum`` (SURVEY §2.8) keyed by user.
Arrow-batched (one pandas frame per key-group per batch), never
row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["running_user_totals", "USER_TOTALS_SCHEMA"]

USER_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_us", LongType()),  # microseconds since epoch
    ]
)


def _update_user(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        # drop NaT before the int64 view: NaT.astype('int64') is
        # int64-min, and max(0, ...) would then leave the 0 sentinel to
        # be emitted as a fabricated 1970 "last event time"
        ts = pdf["ts"].dropna()
        if len(ts):
            last_us = max(last_us, int(ts.astype("int64").max()) // 1000)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            # 0 == "no non-NULL event time seen yet" -> emit NaT/NULL,
            # not epoch 0
            "last_ts": [pd.Timestamp(last_us, unit="us") if last_us else pd.NaT],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals over a stream of events.

    Works in Update output mode; state has no timeout (totals are
    lifetime running values — bound state instead by keying windows in
    real deployments, or swap ``NoTimeout`` for processing-time
    eviction).
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=USER_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
