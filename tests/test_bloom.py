"""Bloom-filter join pruning (operators/bloom.py): exactness vs a
plain semi-join, the no-false-negative contract, bitmap-size bounds,
and the plan shape (pre-filter before the exact join, no Python)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from clv_data_pipeline_spark.operators.bloom import (
    BLOOM_M_BITS,
    bloom_might_contain,
    bloom_semi_join,
    build_bloom_words,
)
from clv_data_pipeline_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def test_bloom_semi_join_equals_exact_semi_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_totalprice") > 300000.0
    )
    exact = sorted(
        r["l_orderkey"]
        for r in li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .select("l_orderkey")
        .collect()
    )
    got = sorted(
        r["l_orderkey"]
        for r in bloom_semi_join(
            li, "l_orderkey", o.select("o_orderkey"), "o_orderkey"
        )
        .select("l_orderkey")
        .collect()
    )
    assert got == exact and len(exact) > 0


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    words = build_bloom_words(keys, "k")
    assert len(words) == BLOOM_M_BITS // 64
    wdf = spark.createDataFrame([(words,)], "bloom_words: array<bigint>")
    probe = (
        spark.range(0, 50_000)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(wdf))
        .select(
            "k",
            bloom_might_contain(F.col("k"), F.col("bloom_words")).alias("hit"),
        )
    )
    hits = {r["k"] for r in probe.filter("hit").collect()}
    # every inserted key passes (Bloom filters never false-negative)
    assert set(range(2000)) <= hits
    # false positives on the 48k non-members stay near the analytic
    # rate ((k*n/m)^k ~ 1e-4 here) — 1% is a 100x safety margin
    assert len(hits - set(range(2000))) < 480


def test_bloom_prune_plan_is_jvm_only(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    o = load_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_totalprice") > 300000.0
    )
    df = bloom_semi_join(li, "l_orderkey", o.select("o_orderkey"),
                         "o_orderkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # membership test is Column arithmetic — no Python eval of any kind
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the bitmap attach is the 1-row broadcast pattern, and the exact
    # semi-join is a real hash join (not a nested loop over pairs)
    assert "LeftSemi" in plan
