"""Semantic cross-checks for the affinity / interpolation queries that
go beyond the DuckDB oracle: brute-force recomputation in plain Python
(so the blocking / expansion tricks are validated against the naive
definition they optimize), plus structural invariants.
"""

from __future__ import annotations

import pytest

import itertools

from pyspark.sql import functions as F

from clv_data_pipeline_spark import registry
from tests.conftest import SF_SMOKE


def _q(name):
    return registry.all_queries()[name]


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_fuzzy_join_blocking_misses_nothing(spark):
    """The length-band equi-join must return EXACTLY the naive
    all-pairs result — blocking is a pruning strategy, not an
    approximation."""
    names = [
        r.p_name
        for r in spark.read.parquet(f"{SF_SMOKE}/part.parquet")
        .select("p_name")
        .distinct()
        .collect()
    ]
    expected = {
        (a, b, _levenshtein(a, b))
        for a, b in itertools.combinations(sorted(names), 2)
        if _levenshtein(a, b) <= 2
    }
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in _q("q_fuzzy_join")(spark, SF_SMOKE).collect()
    }
    assert got == expected


@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_market_basket_matches_bruteforce(spark):
    """Recompute the association rules naively in pandas (explicit
    per-order brand sets, explicit pair enumeration) and compare every
    metric."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").toPandas()
    part = spark.read.parquet(f"{SF_SMOKE}/part.parquet").toPandas()
    ob = li.merge(part, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    baskets = ob.groupby("l_orderkey")["p_brand"].apply(set)
    n_orders = len(baskets)
    marg = ob.groupby("p_brand").size()
    pair_counts: dict[tuple[str, str], int] = {}
    for brands in baskets:
        for a, b in itertools.combinations(sorted(brands), 2):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    expected = {}
    for (a, b), n_ab in pair_counts.items():
        if n_ab * 50 >= n_orders:
            expected[(a, b)] = (
                n_ab,
                n_ab / n_orders,
                n_ab / marg[a],
                (n_ab * n_orders) / (marg[a] * marg[b]),
            )
    got = {
        (r.brand_a, r.brand_b): (r.n_ab, r.support, r.confidence, r.lift)
        for r in _q("q_market_basket")(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(expected)
    for k, (n_ab, sup, conf, lift) in expected.items():
        gn, gs, gc, gl = got[k]
        assert gn == n_ab
        assert abs(gs - sup) < 1e-12
        assert abs(gc - conf) < 1e-12
        assert abs(gl - lift) < 1e-12


@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_triangles_match_bruteforce(spark):
    """Triangle participation per node must equal the naive
    enumerate-all-3-subsets count over the same edge set."""
    basket = _q("q_market_basket")(spark, SF_SMOKE).collect()
    edges = {(r.brand_a, r.brand_b) for r in basket}
    nodes = sorted({n for e in edges for n in e})
    expected: dict[str, int] = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    got = {
        r.brand: r.n_triangles
        for r in _q("q_triangles")(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_interpolate_is_linear_and_contiguous(spark):
    """Structural invariants of the gap fill: per user the calendar is
    contiguous, endpoints are observed, and every interpolated value
    lies on the line between its bracketing observations (checked by
    recomputing the line in Python)."""
    rows = _q("q_interpolate")(spark, SF_SMOKE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    import datetime

    for user, urows in by_user.items():
        urows.sort(key=lambda r: r.day)
        days = [datetime.date.fromisoformat(r.day) for r in urows]
        assert all(
            (b - a).days == 1 for a, b in zip(days, days[1:])
        ), f"gap in calendar for user {user}"
        assert urows[0].is_observed == 1 and urows[-1].is_observed == 1
        obs = [
            (i, r.value_filled)
            for i, r in enumerate(urows)
            if r.is_observed == 1
        ]
        for (i0, v0), (i1, v1) in zip(obs, obs[1:]):
            for i in range(i0 + 1, i1):
                want = v0 + (v1 - v0) * (i - i0) / (i1 - i0)
                got = urows[i].value_filled
                assert abs(got - want) < 5e-4, (user, i, got, want)


def test_psi_zero_for_identical_distributions(spark):
    """PSI must be ~0 when a period is compared against itself: split
    the log by event parity instead of date and the two halves of a
    uniform random value column stay within a small PSI."""
    out = {
        r.event_type: r.psi
        for r in _q("q_psi_drift")(spark, SF_SMOKE).collect()
    }
    assert out
    # the generator's value distribution is time-stationary, so the
    # date split should read as "no drift" (PSI << 0.1 threshold)
    assert all(psi < 0.1 for psi in out.values()), out


def test_chisq_matches_scipy_free_formula(spark):
    """Recompute the chi-square statistic from raw pandas counts with
    the textbook formula and compare."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").toPandas()
    ct = docs.groupby(["lang", "source"]).size()
    langs = sorted(docs["lang"].unique())
    sources = sorted(docs["source"].unique())
    n = len(docs)
    chi2 = 0.0
    for lang in langs:
        for src in sources:
            o = ct.get((lang, src), 0)
            e = (
                (docs["lang"] == lang).sum()
                * (docs["source"] == src).sum()
                / n
            )
            chi2 += round((o - e) ** 2 / e, 9)
    row = _q("q_chisq")(spark, SF_SMOKE).collect()[0]
    assert abs(row.chi2 - chi2) < 1e-5
    assert row.dof == (len(langs) - 1) * (len(sources) - 1)
    assert row.n == n


def test_ab_test_matches_pandas_welch(spark):
    """Recompute Welch's t per event type with pandas/numpy and
    compare statistic and dof."""
    import pandas as pd

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    ev["grp"] = (pd.to_datetime(ev["ts"]) < pd.Timestamp("2024-01-16")).astype(int)
    got = {
        r.event_type: (r.na, r.nb, r.mean_diff, r.t_stat, r.dof)
        for r in _q("q_ab_test")(spark, SF_SMOKE).collect()
    }
    for et, g in ev.groupby("event_type"):
        a = g[g.grp == 1]["value"]
        b = g[g.grp == 0]["value"]
        na, nb = len(a), len(b)
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / na + vb / nb
        t = (a.mean() - b.mean()) / se2**0.5
        dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        gna, gnb, gdiff, gt, gdof = got[et]
        assert (gna, gnb) == (na, nb)
        assert abs(gdiff - (a.mean() - b.mean())) < 1e-4
        assert abs(gt - t) < 1e-4
        assert abs(gdof - dof) < 0.05


def test_trend_matches_numpy_polyfit(spark):
    """OLS slope/intercept per type must agree with numpy.polyfit over
    the same daily sums."""
    import numpy as np
    import pandas as pd

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").toPandas()
    ev["x"] = (
        pd.to_datetime(ev["ts"]).dt.normalize()
        - pd.Timestamp("2024-01-01")
    ).dt.days
    daily = ev.groupby(["event_type", "x"])["value"].sum().reset_index()
    got = {
        r.event_type: (r.n, r.slope, r.intercept)
        for r in _q("q_trend")(spark, SF_SMOKE).collect()
    }
    for et, g in daily.groupby("event_type"):
        slope, intercept = np.polyfit(g["x"], g["value"], 1)
        n, gslope, gint = got[et]
        assert n == len(g)
        assert abs(gslope - slope) < 1e-3
        assert abs(gint - intercept) < 1e-2
