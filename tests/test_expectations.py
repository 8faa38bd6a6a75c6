"""The declarative expectations operator must count violations exactly
(planted-defect fixture) and compile all rules into a single scan."""

from __future__ import annotations

import contextlib
import io

from clv_data_pipeline_spark.operators.validate import expectations


def test_expectations_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "O", "1-URGENT"),
            (2, -5.0, "O", "9-BOGUS"),     # price, regex
            (2, 0.0, "X", "2-HIGH"),       # dup key, price (<=0), domain
            (None, 3.0, "F", "3-MEDIUM"),  # null key
        ],
        "k long, price double, status string, prio string",
    )
    rules = [
        {"rule": "k_not_null", "column": "k", "kind": "not_null"},
        {"rule": "k_unique", "column": "k", "kind": "unique"},
        {"rule": "price_pos", "column": "price", "kind": "min", "param": 0},
        {"rule": "status_dom", "column": "status",
         "kind": "accepted_values", "param": ["O", "F", "P"]},
        {"rule": "prio_fmt", "column": "prio",
         "kind": "regex", "param": "^[1-5]-"},
    ]
    got = {r["rule"]: (r["n_violations"], r["passed"])
           for r in expectations(df, rules).collect()}
    assert got == {
        "k_not_null": (1, False),
        "k_unique": (1, False),     # count(k)=3, distinct=2
        "price_pos": (2, False),    # -5.0 and 0.0
        "status_dom": (1, False),
        "prio_fmt": (1, False),
    }


def test_expectations_single_scan(spark):
    """All five rules must plan as ONE aggregate over ONE scan — adding
    rules never adds passes over the table."""
    from clv_data_pipeline_spark import registry
    from tests.conftest import SF_SMOKE

    df = registry.all_queries()["q_expectations"](spark, SF_SMOKE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # count tree nodes, not the per-node detail section repeats
    assert plan.count("+- Scan parquet") == 1, plan
