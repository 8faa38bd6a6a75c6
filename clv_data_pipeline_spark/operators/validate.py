"""The Data Quality Firewall (SURVEY.md §3.3; reference dags/validate_features.py).

The reference splits this into "the Brain" (pure pass/fail logic,
validate_features.py:3-26) and "Arms & Legs" (warehouse I/O,
:29-69).  We keep the split: Spark computes three tiny aggregate
inputs, then :func:`run_validation_checks` — a pure Python function
with the reference's exact error strings — decides, raising to abort
the pipeline before scoring ("models never process garbage").

Scale shape: the two SQL probes are global aggregates that reduce to a
handful of rows on the driver; the schema probe is metadata-only.
Nothing here grows with data volume except the distributed aggregates
themselves.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clv_data_pipeline_spark.schemas import FIREWALL_REQUIRED_COLUMNS

#: reference dags/validate_features.py:12
MIGRATION_RATIO_THRESHOLD = 0.95


def run_validation_checks(
    raw_count: int,
    feature_count: int,
    invalid_count: int,
    actual_cols: Iterable[str],
    required_cols: Iterable[str] = FIREWALL_REQUIRED_COLUMNS,
) -> bool:
    """The Brain — pure logic, error strings verbatim from the reference
    (dags/validate_features.py:13,19,24).
    """
    ratio = feature_count / raw_count if raw_count > 0 else 0
    if ratio < MIGRATION_RATIO_THRESHOLD:
        raise ValueError(
            f"DATA LOSS: Customer migration ratio is {ratio:.2f}. Expected >= 0.95"
        )
    missing = set(required_cols) - set(actual_cols)
    if missing:
        raise ValueError(f"SCHEMA ERROR: Missing columns {missing}")
    if invalid_count > 0:
        raise ValueError(
            f"SANITY ERROR: Found {invalid_count} rows with negative values"
        )
    return True


def migration_counts(transactions: DataFrame, features: DataFrame,
                     raw_customer_col: str = "CustomerID") -> tuple[int, int]:
    """Arms & Legs 1 — raw vs feature distinct-customer counts
    (reference dags/validate_features.py:38-45, two scalar subqueries).
    """
    raw = transactions.agg(
        F.count_distinct(raw_customer_col).alias("c")
    ).first()["c"]
    feat = features.agg(F.count_distinct("customer_id").alias("c")).first()["c"]
    return int(raw), int(feat)


def invalid_feature_count(features: DataFrame) -> int:
    """Arms & Legs 2 — negative-feature row count
    (reference dags/validate_features.py:47-56).
    """
    bad = (
        (F.col("T") < 0)
        | (F.col("frequency") < 0)
        | (F.col("recency") < 0)
        | (F.col("monetary_value") < 0)
    )
    return features.filter(bad).count()


def validate_features(
    transactions: DataFrame,
    features: DataFrame,
    raw_customer_col: str = "CustomerID",
) -> bool:
    """Full firewall: compute the three inputs, then decide
    (reference dags/validate_features.py:29-69).
    """
    raw_c, feat_c = migration_counts(transactions, features, raw_customer_col)
    invalid = invalid_feature_count(features)
    return run_validation_checks(raw_c, feat_c, invalid, features.columns)


def observed_features(features: DataFrame) -> tuple[DataFrame, "Observation"]:
    """Attach the firewall's feature-side metrics to the frame itself
    via ``df.observe`` — the metrics accumulate DURING whatever action
    consumes the frame (the feature-table write), so the sanity probe
    costs zero extra scans.  At 100 TB the standalone
    :func:`invalid_feature_count` is a second full pass over the
    feature table; this folds it into the write.

    Returns (observed_frame, observation); read
    ``observation.get`` after an action ran on the returned frame —
    keys: feature_count, invalid_count.
    """
    from pyspark.sql import Observation

    bad = (
        (F.col("T") < 0)
        | (F.col("frequency") < 0)
        | (F.col("recency") < 0)
        | (F.col("monetary_value") < 0)
    )
    obs = Observation("firewall")
    observed = features.observe(
        obs,
        F.count(F.lit(1)).alias("feature_count"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("invalid_count"),
    )
    return observed, obs


def expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Declarative data-quality rules -> one violations report row per
    rule (the dbt-test / expectations-suite shape, generalizing the
    reference's fixed firewall checks, dags/validate_features.py:16-56).

    Each rule is ``{"rule": str, "column": str, "kind": ..., ...}``
    with kinds: ``not_null``, ``unique``, ``min`` (param: exclusive
    lower bound), ``max`` (param: inclusive upper bound),
    ``accepted_values`` (param: list), ``regex`` (param: pattern, must
    fully anchor itself).

    Scale shape: EVERY rule compiles to a conditional-count expression
    in ONE aggregate over ONE scan — adding rules never adds passes;
    uniqueness folds in as count(col) - count_distinct(col) (the only
    rule that is not map-side-partial; swap for an HLL estimate when
    approximate uniqueness suffices at extreme scale).  The per-rule
    report rows come from unpivoting the single 1-row aggregate.
    """
    aggs = []
    for i, r in enumerate(rules):
        c = F.col(r["column"])
        kind = r["kind"]
        if kind == "not_null":
            v = F.count(F.when(c.isNull(), 1))
        elif kind == "unique":
            v = F.count(c) - F.count_distinct(c)
        elif kind == "min":
            v = F.count(F.when(c <= r["param"], 1))
        elif kind == "max":
            v = F.count(F.when(c > r["param"], 1))
        elif kind == "accepted_values":
            v = F.count(F.when(~c.isin(*r["param"]), 1))
        elif kind == "regex":
            v = F.count(F.when(~c.rlike(r["param"]), 1))
        else:  # pragma: no cover - caller error
            raise ValueError(f"unknown expectation kind: {kind}")
        aggs.append(v.cast("long").alias(f"_v{i}"))
    one = df.agg(*aggs)
    stack = F.expr(
        "stack({}, {})".format(
            len(rules),
            ", ".join(
                f"'{r['rule']}', '{r['column']}', _v{i}"
                for i, r in enumerate(rules)
            ),
        )
    ).alias("rule", "column", "n_violations")
    return one.select(stack).select(
        "rule", "column", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
