"""Plan-shape pins for the semi-probe replay pattern (round 8).

The streaming replay guards (streaming/ingest._replay_anti_join) and
the item-CF delta maintenance (operators/recsys.item_cf_incremental)
promise the STORED table is scanned map-side and never shuffled: the
batch's keys broadcast into a left-semi probe, the (tiny) hit set
broadcasts into the actual anti-join.  A regression to a plain
``batch.join(stored, key, "left_anti")`` re-shuffles the full stored
corpus every trigger/day — invisible at sf0.01, fatal at 100 TB.
These tests pin the physical plan: broadcast joins only, no
sort-merge / shuffled-hash join, and no exchange of the stored
relation.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_replay_anti_join_never_shuffles_the_stored_table(spark):
    from clv_data_pipeline_spark.streaming.ingest import _replay_anti_join

    stored = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("v")
    )
    batch = spark.range(50).select(F.col("id").alias("doc_id"))
    plan = _plan_of(_replay_anti_join(batch, stored, "doc_id"))
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    # semi probe + anti join, both broadcast
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # correctness of the pattern itself
    got = sorted(
        r[0]
        for r in _replay_anti_join(
            spark.range(10).select(F.col("id").alias("doc_id")),
            spark.range(0, 10, 2).select(F.col("id").alias("doc_id")),
            "doc_id",
        ).collect()
    )
    assert got == [1, 3, 5, 7, 9]


def test_item_cf_incremental_probes_stored_index_by_broadcast(spark):
    from clv_data_pipeline_spark.operators.recsys import item_cf_incremental

    base = spark.range(20_000).select(
        (F.col("id") % 500).alias("u"),
        F.concat(F.lit("b"), (F.col("id") % 25).cast("string")).alias("b"),
    ).distinct()
    delta = spark.createDataFrame(
        [(1, "b1"), (1, "b2"), (2, "b3")], ["u", "b"]
    )
    plan = _plan_of(item_cf_incremental(base, delta))
    # The probes of the STORED interaction index (hits semi-probe,
    # touched-user semi) must be broadcast — a sort-merge semi means
    # the index got shuffled.  Delta-bounded and vocab^2-bounded
    # frames elsewhere in the operator may legitimately sort-merge
    # (full-outer state addition, per-user scoring anti-join), so only
    # the semi shape is pinned.
    assert "SortMergeJoin LeftSemi" not in plan, plan
    assert "ShuffledHashJoin LeftSemi" not in plan, plan
