"""Numpy-only numerics: lgamma, hyp2f1, Nelder-Mead."""

from __future__ import annotations

import math

import numpy as np

from clv_data_pipeline_spark.functions.optimize import nelder_mead
from clv_data_pipeline_spark.functions.special import hyp2f1, lgamma


def test_lgamma_matches_math():
    xs = np.array([0.1, 0.5, 1.0, 1.5, 2.0, 3.7, 10.0, 100.5, 1e4])
    ours = lgamma(xs)
    ref = np.array([math.lgamma(v) for v in xs])
    assert np.allclose(ours, ref, rtol=1e-11, atol=1e-11)


def test_hyp2f1_log_identity():
    # 2F1(1, 1; 2; z) = -ln(1-z)/z
    z = np.array([0.01, 0.1, 0.5, 0.9, 0.95])
    ours = hyp2f1(1.0, 1.0, 2.0, z)
    ref = -np.log(1 - z) / z
    assert np.allclose(ours, ref, rtol=1e-10)


def test_hyp2f1_binomial_identity():
    # 2F1(a, b; b; z) = (1-z)^(-a) for any b
    z = np.array([0.0, 0.2, 0.7])
    ours = hyp2f1(2.5, 3.0, 3.0, z)
    ref = (1 - z) ** (-2.5)
    assert np.allclose(ours, ref, rtol=1e-10)


def test_nelder_mead_quadratic():
    target = np.array([1.5, -2.0, 0.25])
    f = lambda p: float(np.sum((p - target) ** 2))  # noqa: E731
    x, fx = nelder_mead(f, np.zeros(3))
    assert np.allclose(x, target, atol=1e-4)
    assert fx < 1e-8


def test_nelder_mead_rosenbrock_2d():
    f = lambda p: float((1 - p[0]) ** 2 + 100 * (p[1] - p[0] ** 2) ** 2)  # noqa: E731
    x, fx = nelder_mead(f, np.array([-1.2, 1.0]), max_iter=5000)
    assert np.allclose(x, [1.0, 1.0], atol=1e-3)


def test_float_aggregates_partition_independent(spark):
    """The round-3 float-aggregate queries (BM25, token entropy,
    winsorized mean) must produce bit-identical results under different
    shuffle partitioning — the decimal-accumulation + round-before-rank
    discipline, probed by flipping spark.sql.shuffle.partitions."""
    from clv_data_pipeline_spark import registry
    from tests.conftest import SF_SMOKE

    qs = registry.all_queries()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in ("q_bm25", "q_token_entropy", "q_winsorize"):
            results = []
            for n_part in ("3", "17"):
                spark.conf.set("spark.sql.shuffle.partitions", n_part)
                rows = sorted(map(str, qs[name](spark, SF_SMOKE).collect()))
                results.append(rows)
            assert results[0] == results[1], f"{name} partition-dependent"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_ewma_closed_form_equals_sequential_fold(spark):
    """q_ewma's one-pass closed form must equal the textbook sequential
    recursion s_n = a*v_n + (1-a)*s_(n-1) folded per user in plain
    Python."""
    from collections import defaultdict

    from clv_data_pipeline_spark import registry
    from clv_data_pipeline_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    got = {
        r["user_id"]: (r["n_events"], r["ewma_value"])
        for r in registry.all_queries()["q_ewma"](spark, SF_SMOKE).collect()
    }
    ev = defaultdict(list)
    for r in (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    ):
        ev[r["user_id"]].append((r["ts"], r["event_id"], float(r["value"])))
    for uid, rows in ev.items():
        rows.sort()
        s = rows[0][2]
        for _, _, v in rows[1:]:
            s = 0.3 * v + 0.7 * s
        n, ewma = got[uid]
        assert n == len(rows)
        assert abs(ewma - s) < 1e-5, (uid, ewma, s)
