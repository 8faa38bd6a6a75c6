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


def merge_session_delta(
    base_sessions: DataFrame,
    delta_events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak_col: str = "event_id",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
) -> DataFrame:
    """O(delta) maintenance of a ``session_stats`` table: fold a batch
    of NEW events (every delta event at-or-after every base event for
    its user — the daily-append contract) into an existing per-session
    stats table without re-sessionizing history.

    Only a user's LAST base session can be affected by later events, so
    the algorithm is: (1) extract each user's tail state (last session
    id + close time) with one agg over the base table; (2) gap-and-
    island the delta alone, seeding the first gap of each user against
    the tail close time — island 0 means "extends the tail session",
    island k starts session last_id + k; (3) merge by (user, session)
    where only tail keys can collide, so counts add and bounds take
    least/greatest.  Invariant (pinned by tests + the driver oracle):
    result == session_stats(history UNION delta) exactly.

    Scale shape: the delta shuffles once on the user key (its window)
    and once on (user, session); the stored base table never
    re-sessionizes — with the base bucketed by ``user_col`` (see
    sources.io.write_bucketed) the tail agg and the final merge read it
    exchange-free, and the production write-back is a MERGE touching
    only delta-user tail rows (operators/merge.py pattern).
    """
    tail = base_sessions.groupBy(user_col).agg(
        F.max("session_id").alias("_last_id"),
        F.max_by("session_end", "session_id").alias("_last_end"),
    )
    order = [F.col(ts_col), F.col(order_tiebreak_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    us = F.unix_micros(F.col(ts_col))
    anchor = F.coalesce(
        F.lag(us).over(w), F.unix_micros(F.col("_last_end"))
    )
    gap_us = us - anchor
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    delta_sess = (
        delta_events.join(tail, user_col, "left")
        .withColumn("_isl", F.sum(is_new).over(w_run))
        .groupBy(
            user_col,
            (F.coalesce(F.col("_last_id"), F.lit(0)) + F.col("_isl"))
            .cast("long")
            .alias("session_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
    b = base_sessions.select(
        user_col,
        "session_id",
        F.col("n_events").alias("_nb"),
        F.col("session_start").alias("_sb"),
        F.col("session_end").alias("_eb"),
    )
    d = delta_sess.select(
        user_col,
        "session_id",
        F.col("n_events").alias("_nd"),
        F.col("session_start").alias("_sd"),
        F.col("session_end").alias("_ed"),
    )
    return b.join(d, [user_col, "session_id"], "full").select(
        user_col,
        "session_id",
        (F.coalesce("_nb", F.lit(0)) + F.coalesce("_nd", F.lit(0)))
        .cast("long")
        .alias("n_events"),
        F.least("_sb", "_sd").alias("session_start"),
        F.greatest("_eb", "_ed").alias("session_end"),
    )
