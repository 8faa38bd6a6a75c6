"""Every rows-only query (no oracle) must run and return rows with a
stable schema at sf0.001 — the driver's weaker check, replicated."""

from __future__ import annotations

import pytest

from clv_data_pipeline_spark import registry
from tests.conftest import SF_SMOKE


def _rows_only_names() -> list[str]:
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    return sorted(set(qs) - set(oracles))


#: Reviewed constant columns in rows-only results (the rows-only
#: analog of test_degeneracy.CONSTANT_OK — this tier escapes the
#: oracle-side audit, which is exactly how the round-9 semdedup /
#: dedup_embedding threshold vacuities hid).  Everything else that is
#: single-valued across a multi-row result fails below.
ROWS_ONLY_CONSTANT_OK: frozenset[tuple[str, str]] = frozenset(
    {
        # top-1 retrieval contract: rank == 1 on every row
        ("q_ann_ivf", "rank"),
        ("q_ann_ivf_pq", "rank"),
        ("q_ann_lsh", "rank"),
        ("q_ann_pq", "rank"),
        ("q_ann_pq_incremental", "rank"),
    }
)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_runs(spark, name):
    df = registry.all_queries()[name](spark, SF_SMOKE)
    schema1 = df.schema.simpleString()
    rows = df.collect()
    assert len(rows) >= 0
    # schema stable across invocations
    df2 = registry.all_queries()[name](spark, SF_SMOKE)
    assert df2.schema.simpleString() == schema1
    # near-dup removal must never return MORE rows than input
    if name in ("q_minhash_dedup", "q_dedup_embedding"):
        assert 0 < len(rows) <= 500
    # constant-column vacuity scan (multi-row results only; <5 rows
    # is too few to call anything degenerate)
    if len(rows) >= 5:
        cols = rows[0].asDict().keys()
        bad = [
            c
            for c in cols
            if len({str(r[c]) for r in rows}) == 1
            and (name, c) not in ROWS_ONLY_CONSTANT_OK
        ]
        assert not bad, (
            f"{name}: unexplained constant columns {bad} — fix the "
            "query (planted signal / tail threshold) or whitelist "
            "with a reviewed reason"
        )


def test_approx_percentiles_near_exact(spark):
    """The sketch percentiles must land within 0.5% of the exact
    interpolated ones at sf0.001 — the accuracy contract that justifies
    swapping them in at scale.  The query self-audits (p50_ok/p90_ok
    booleans the driver hash-checks against literal TRUE); here we
    assert the verdicts and cross-check the exact values against
    q_percentiles."""
    from clv_data_pipeline_spark import registry
    from tests.conftest import SF_SMOKE

    qs = registry.all_queries()
    audited = {
        r["l_returnflag"]: r
        for r in qs["q_approx_percentiles"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["l_returnflag"]: (r["p50_qty"], r["p90_price"])
        for r in qs["q_percentiles"](spark, SF_SMOKE).collect()
    }
    assert set(audited) == set(exact)
    for flag, (p50e, p90e) in exact.items():
        r = audited[flag]
        assert r["p50_ok"] and r["p90_ok"]
        assert r["p50_qty"] == p50e
        assert r["p90_price"] == p90e


def test_approx_distinct_self_audit(spark):
    """The HLL estimate must land within 5% of the exact count — the
    approx_ok verdict the driver hash-checks against literal TRUE."""
    from clv_data_pipeline_spark import registry
    from tests.conftest import SF_SMOKE

    rows = registry.all_queries()["q_approx_distinct"](
        spark, SF_SMOKE
    ).collect()
    assert len(rows) == 1
    assert rows[0]["approx_ok"]
    assert rows[0]["exact_users"] > 0
