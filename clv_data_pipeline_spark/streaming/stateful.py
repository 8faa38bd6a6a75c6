"""Custom stateful streaming operator: incremental per-user RFM state.

The reference recomputes its feature table from scratch every run
(CREATE OR REPLACE, reference dags/clv_data_dag.py:80).  At 100 TB of
transaction history a full recompute per day is the dominant cost; the
streaming-native alternative keeps one small state record per user and
folds each micro-batch into it — O(delta) work per trigger instead of
O(history).

Built on ``applyInPandasWithState``: Spark shuffles each micro-batch by
user, hands every user's new rows to a pandas function together with
that user's persisted state (GroupState, stored in the checkpoint), and
emits an updated snapshot row.  State is bounded (4 numbers per user)
and the operator scales with distinct-users-per-batch, not history.

The per-user state (n, total, first_us, last_us) is exactly the
re-aggregable partial from operators/incremental.py — count/sum/min/max
all fold associatively, so the streaming snapshot provably equals the
batch recompute over the union of all batches (pinned by test).
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from clv_data_pipeline_spark.streaming.ingest import ensure_event_time

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Fold this batch's rows for one user into the persisted partial."""
    n, total, first_us, last_us = (
        state.get if state.exists else (0, 0.0, None, None)
    )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        b_first = int(pdf["ts_us"].min())
        b_last = int(pdf["ts_us"].max())
        first_us = b_first if first_us is None else min(first_us, b_first)
        last_us = b_last if last_us is None else max(last_us, b_last)
    state.update((n, total, first_us, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "first_us": [first_us],
            "last_us": [last_us],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming (or batch) frame of per-user running RFM partials.

    ``events`` needs columns ``user_id``, ``ts`` (timestamp), ``value``
    (double).  Each trigger emits one updated snapshot row per user seen
    in that batch; users absent from a batch keep their checkpointed
    state untouched (no output, no recompute).
    """
    prepared = ensure_event_time(events).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


try:  # Spark 4 arbitrary-state API; batch-only 3.5 deployments lack it
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover
    StatefulProcessor = object


class _RFMProcessor(StatefulProcessor):
    """transformWithStateInPandas processor holding the same
    re-aggregable RFM partial as :func:`running_user_stats` — the
    Spark 4 arbitrary-state API (typed state handles, RocksDB-backed,
    timers available) instead of the single GroupState blob."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("rfm", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._state.exists():
            n, total, first_us, last_us = self._state.get()
        else:
            n, total, first_us, last_us = 0, 0.0, None, None
        for pdf in rows:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            b_first = int(pdf["ts_us"].min())
            b_last = int(pdf["ts_us"].max())
            first_us = b_first if first_us is None else min(first_us, b_first)
            last_us = b_last if last_us is None else max(last_us, b_last)
        self._state.update((n, total, first_us, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "first_us": [first_us],
                "last_us": [last_us],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """:func:`running_user_stats` on the Spark 4
    ``transformWithStateInPandas`` API.  Same contract and the same
    provably-batch-equal partials; requires the RocksDB state store
    provider (``spark.sql.streaming.stateStore.providerClass``) — the
    store TWS is designed for, with changelog checkpointing and bounded
    memory at 100 TB state sizes.
    """
    proc = _RFMProcessor()

    prepared = ensure_event_time(events).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
