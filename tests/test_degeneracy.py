"""Degeneracy audit: every oracle-checked query must produce a
NON-VACUOUS result at sf0.01 — at least one row, and no column that is
NULL in every row.

Motivation (round 7): the driver's oracle comparison proves
Spark == DuckDB, but a query that returns 0 rows (or all-NULL values)
on both engines is green while verifying nothing — q_price_index
split ORDERS (whose dates span 1995-2001) at a 2024 literal, so every
row landed in period 0 and all three indices were NULL, hash-green
against the equally-degenerate oracle; q_anti_join matched 0 == 0
because every testdata customer has orders.  This test runs each
oracle through DuckDB alone (fast — no Spark) and fails on any query
whose own oracle is vacuous, which catches the class regardless of
which side the bug is on (the driver hash-check then covers
Spark == oracle).
"""

from __future__ import annotations

import duckdb
import pytest

from clv_data_pipeline_spark import registry

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_every_oracle_is_non_vacuous_at_sf001(con):
    bad = []
    for name, sql in registry.all_oracles().items():
        try:
            rows = con.execute(sql).fetchall()
        except Exception as ex:  # noqa: BLE001 — collect, report below
            bad.append((name, f"oracle error: {str(ex)[:120]}"))
            continue
        if not rows:
            bad.append((name, "0 rows"))
            continue
        cols = list(zip(*rows))
        allnull = [
            i for i, c in enumerate(cols) if all(v is None for v in c)
        ]
        if allnull:
            bad.append((name, f"all-NULL column indexes {allnull}"))
    assert not bad, (
        "vacuous oracle results (green-but-verifying-nothing): "
        + "; ".join(f"{n} [{why}]" for n, why in bad)
    )
