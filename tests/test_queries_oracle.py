"""Every oracle-checked query vs DuckDB at sf0.001 (fast) — the local
replica of the driver's correctness gate.  `RUN_SF001_ONLY=0` also runs
sf0.01 (what the driver actually uses)."""

from __future__ import annotations

import pytest

from clv_data_pipeline_spark import registry
from tests.conftest import SF_SMOKE
from tests.oracle import check_query


def _oracle_names() -> list[str]:
    return sorted(registry.all_oracles())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle_sf0001(spark, name):
    check_query(spark, name, SF_SMOKE)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "customer_id" in df.columns

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)


def test_survey_section8_counts_match_registry():
    """SURVEY.md §8's headline counts must track the registry exactly —
    the drift the round-2 verdict flagged, now pinned."""
    import os
    import re

    from clv_data_pipeline_spark import registry

    survey = open(
        os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    ).read()
    m = re.search(
        r"(\d+) registered queries in `__spark_entry__\.py`.*?"
        r"(\d+) DuckDB-oracle-checked, (\d+) rows-only",
        survey,
        re.S,
    )
    assert m, "SURVEY.md §8 count sentence not found"
    n_q, n_oracle, n_rows_only = map(int, m.groups())
    qs, oracles = registry.all_queries(), registry.all_oracles()
    assert n_q == len(qs), (n_q, len(qs))
    assert n_oracle == len(oracles), (n_oracle, len(oracles))
    assert n_rows_only == len(qs) - len(oracles)
