"""Sessionization over the event stream (SURVEY.md §2.8 extension).

The reference's generator emits session-shaped bursts (20-100 s gaps,
reference dags/simulate_data.py:180) but never analyzes them; gap-based
sessionization is the natural extension and a core event-analytics
operator.  Batch formulation is the classic gap-and-island: a lag
window marks session starts, a running sum assigns session ids.

Scale shape: one shuffle on the user key, then two window passes over
the same partitioning (Catalyst executes them in a single sort) and a
final hash agg that reuses the partitioning.  Timestamps compare in
integer microseconds (``unix_micros``) so the gap predicate is exact.

The streaming formulation (``F.session_window`` with a watermark) lives
in streaming/sessionize.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_GAP_SECONDS = 1800


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak_col: str = "event_id",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """Assign a per-user ``session_id`` (1-based) to every event.

    A new session starts when the gap to the previous event exceeds
    ``gap_seconds``.  Ordering ties on the timestamp are broken by
    ``order_tiebreak_col`` so the assignment is deterministic.
    """
    order = [F.col(ts_col), F.col(order_tiebreak_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    us = F.unix_micros(F.col(ts_col))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id", F.sum(is_new).over(w_run).cast("long")
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """One row per (user, session): event count, start, end.

    The aggregate shuffles on (user, session) which is a refinement of
    the window's user partitioning — AQE keeps it local.
    """
    s = sessionize(events, user_col, ts_col, gap_seconds=gap_seconds)
    return s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
