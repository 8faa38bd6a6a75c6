"""Plan-pinned scale smoke for the incremental-maintenance trio.

The O(delta) claims (q_dedup_incremental / q_minhash_incremental /
q_sessionize_incremental) are hash-verified for CORRECTNESS elsewhere;
these tests pin the COST MODEL: with the index/base stored as a real
parquet table (as a production pipeline stores it), the incremental
path's plan must (a) scan that table the documented number of times,
(b) never exchange/sort-merge the index side, and (c) keep every
window over the delta only — the shapes that make a daily run against
a 100 TB corpus O(delta) instead of O(corpus).

Textual pins read ``explain("formatted")``: a regression that
re-shuffles or re-windows the stored table changes these counts even
when results stay correct.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import time

import pytest
from pyspark.sql import functions as F
pytestmark = pytest.mark.slowsuite  # excluded from the default (driver) run; see pytest.ini


N_DOCS = 3_000_000
N_DELTA = 10_000
N_TEXTS = 200_000  # distinct bodies -> every delta doc collides


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _docs(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body "), (F.col("id") % N_TEXTS).cast("string")
        ).alias("text"),
    )


def test_dedup_incremental_3m_plan_is_delta_sized(spark, tmp_path):
    """3M-doc fingerprint index on parquet + 10k delta: the probe scans
    the index ONCE, map-side, under a broadcast of the delta's
    fingerprints — no sort-merge join, no hash exchange anywhere (the
    only aggregation shuffle lives inside the delta-sized cached
    frame).  A formulation that re-dedups the corpus would shuffle
    index-sized data and break all three pins."""
    from clv_data_pipeline_spark.operators.dedup import (
        dedup_incremental,
        fingerprint_index,
    )

    docs = _docs(spark, N_DOCS)
    idx_path = str(tmp_path / "fp_index")
    fingerprint_index(
        docs.filter(F.col("doc_id") < N_DOCS - N_DELTA)
    ).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    delta = docs.filter(F.col("doc_id") >= N_DOCS - N_DELTA)

    admitted = dedup_incremental(index, delta)
    plan = _plan(admitted)
    assert plan.count("fp_index") == 1, "index must be scanned exactly once"
    assert "SortMergeJoin" not in plan, "index side must never sort-merge"
    assert "Exchange hashpartitioning" not in plan, (
        "no hash exchange outside the delta-sized cached subtree"
    )

    t0 = time.perf_counter()
    n = admitted.count()
    elapsed = time.perf_counter() - t0
    # every delta body already exists in the base (ids wrap at 200k),
    # so nothing is admitted — proving the probe consulted the index
    assert n == 0
    assert elapsed < 60, f"incremental dedup took {elapsed:.1f}s at 3M"


def test_minhash_incremental_plan_never_exchanges_index(spark, tmp_path):
    """Banded-MinHash index stored on parquet, 2k-doc delta: the plan
    must scan the index once and never hash-exchange it — the delta's
    distinct band keys broadcast to probe it map-side.  (Plan shape is
    size-independent; correctness/byte-equality with the full greedy
    pass is pinned in test_incremental.py.)"""
    from clv_data_pipeline_spark.operators.dedup import (
        dedup_minhash_incremental,
        minhash_index,
    )

    docs = spark.range(60_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox pattern "),
            (F.col("id") % 9_000).cast("string"),
            F.lit(" jumps over the repeated body of text"),
        ).alias("text"),
    )
    idx_path = str(tmp_path / "mh_index")
    minhash_index(docs.filter(F.col("doc_id") < 58_000)).write.parquet(
        idx_path
    )
    index = spark.read.parquet(idx_path)
    delta = docs.filter(F.col("doc_id") >= 58_000)

    admitted = dedup_minhash_incremental(index, delta)
    plan = _plan(admitted)
    assert plan.count("mh_index") == 1, "index must be scanned exactly once"
    assert "Exchange hashpartitioning" not in plan, (
        "index band keys must never shuffle — delta keys broadcast to it"
    )
    # the index scan itself must feed a broadcast-probe semi join, so
    # index rows reduce to delta-bounded collisions before any join
    assert "BroadcastHashJoin" in plan
    assert admitted.count() == 0  # all delta bodies repeat earlier docs


def test_session_merge_windows_only_the_delta(spark, tmp_path):
    """1M events split at mid-window: folding the delta into a stored
    session_stats table reads the base exactly twice (tail-state agg +
    final merge — both documented) and every Window in the plan runs
    over DELTA event columns; history is never re-sessionized."""
    from clv_data_pipeline_spark.operators.sessions import (
        merge_session_delta,
        session_stats,
    )

    base_us = 1_700_000_000_000_000
    month_us = 30 * 86_400_000_000
    ev = spark.range(1_000_000).select(
        (F.col("id") % 50_000).alias("user_id"),
        F.timestamp_micros(
            F.lit(base_us) + (F.col("id") * 37_000_003) % month_us
        ).alias("ts"),
        F.col("id").alias("event_id"),
    )
    split = F.timestamp_micros(F.lit(base_us + 15 * 86_400_000_000))
    base_path = str(tmp_path / "sess_base")
    session_stats(ev.filter(F.col("ts") < split)).write.parquet(base_path)
    base = spark.read.parquet(base_path)
    delta = ev.filter(F.col("ts") >= split)

    merged = merge_session_delta(base, delta)
    plan = _plan(merged)
    assert plan.count("sess_base") == 2, (
        "base reads twice (tail agg + merge), never more"
    )
    # every Window node's Input must carry event_id — a column that
    # exists only on the delta events, never on the stored stats table
    window_ids = re.findall(r"\((\d+)\) Window\b", plan)
    assert window_ids, "expected the delta gap-and-island windows"
    for wid in window_ids:
        m = re.search(
            rf"\({wid}\) Window\n(?:Input(?: \[\d+\])?: \[([^\]]*)\])", plan
        )
        assert m and "event_id" in m.group(1), (
            f"Window ({wid}) does not run over delta events:\n{plan}"
        )

    t0 = time.perf_counter()
    n = merged.count()
    elapsed = time.perf_counter() - t0
    assert n > 0
    assert elapsed < 60, f"session merge took {elapsed:.1f}s at 1M events"
