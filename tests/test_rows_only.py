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
