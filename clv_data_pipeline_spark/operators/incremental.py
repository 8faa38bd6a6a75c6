"""Incremental RFM-T maintenance (SURVEY.md §7 "hard parts").

The reference recomputes the feature table from all of history every
run (CREATE OR REPLACE, reference dags/clv_data_dag.py:80) — at 100 TB
that is a full scan per day.  Every RFM-T aggregate decomposes into
re-aggregable partials at the (customer, purchase-date) grain:

    min/max(ts)  -> min/max of partial min/max
    avg(amount)  -> sum of partial sums / sum of partial counts
    count(distinct date) -> count of (customer, date) partial rows

so the daily job reduces to: aggregate TODAY's delta to partials
(tiny), append to the partial store (partitioned by date), and fold
partials per customer — a scan of ~(customers x active days) compact
rows instead of raw transactions.  The fold is exact, not approximate:
no sketches needed because the distinct-count key (the calendar day)
is part of the partial grain.

``rfm_from_partials(merge_partials(p1 union p2)) ==
rfm_features(tx1 union tx2)`` is the algebraic invariant the tests and
the q_rfm_incremental oracle pin down.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PARTIAL_COLUMNS = [
    "customer_id",
    "purchase_date",
    "min_ts",
    "max_ts",
    "sum_amount",
    "cnt_amount",
]


def daily_partials(
    transactions: DataFrame,
    customer_col: str = "CustomerID",
    ts_col: str = "order_timestamp",
    amount_col: str = "TotalPurchase",
) -> DataFrame:
    """Aggregate raw transactions to (customer, date) partials — the
    only pass that ever reads raw data.  Amounts accumulate as exact
    DECIMAL so folding order can never change results (registry.py
    determinism rules).
    """
    return transactions.groupBy(
        F.col(customer_col).alias("customer_id"),
        F.to_date(F.col(ts_col)).alias("purchase_date"),
    ).agg(
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
        F.sum(F.col(amount_col).cast("decimal(18,4)")).alias("sum_amount"),
        F.count(amount_col).alias("cnt_amount"),
    )


def merge_partials(partials: DataFrame) -> DataFrame:
    """Fold possibly-overlapping partials back to (customer, date)
    grain — used when a day is reprocessed or when unioning yesterday's
    store with today's delta."""
    return partials.groupBy("customer_id", "purchase_date").agg(
        F.min("min_ts").alias("min_ts"),
        F.max("max_ts").alias("max_ts"),
        F.sum("sum_amount").alias("sum_amount"),
        F.sum("cnt_amount").alias("cnt_amount"),
    )


def rfm_from_partials(
    partials: DataFrame, asof: dt.date | str | Column | None = None
) -> DataFrame:
    """Fold (customer, date) partials to the exact RFM-T feature table —
    bit-identical semantics to operators/features.rfm_features with
    exact_monetary=True, without touching raw transactions."""
    if asof is None:
        asof_col = F.current_date()
    elif isinstance(asof, Column):
        asof_col = asof
    else:
        asof_col = F.lit(str(asof)).cast("date")
    return partials.groupBy("customer_id").agg(
        F.datediff(F.to_date(F.max("max_ts")), F.to_date(F.min("min_ts")))
        .cast("long")
        .alias("recency"),
        F.datediff(asof_col, F.to_date(F.min("min_ts")))
        .cast("long")
        .alias("T"),
        (F.count("*") - F.lit(1)).alias("frequency"),
        (
            F.sum("sum_amount").cast("double") / F.sum("cnt_amount")
        ).alias("monetary_value"),
        F.min("min_ts").alias("first_purchase"),
        F.max("max_ts").alias("last_purchase"),
    )
