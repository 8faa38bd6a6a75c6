"""Set-oriented transaction generator (SURVEY.md §2.9; reference
dags/simulate_data.py:97-206).

The reference generates per-customer pandas frames in a Python loop and
concatenates them (simulate_data.py:228) — O(customers) driver work.
The Spark rewrite is one declarative plan, fully distributed and
deterministic under a seed (the reference is unseeded — SURVEY.md §7
lists that as a quirk *not* to copy):

- ID allocation ``np.arange(max+1, ...)``        -> ``spark.range``
- returning-customer sampling w/o replacement    -> ``orderBy(rand(seed)).limit(n)``
- 1-15 purchases per customer fan-out            -> ``explode(sequence(1, n))``
- uniform prices / quantities                    -> seeded ``rand`` affine transforms
- cumulative 20-100 s session gaps               -> running ``sum() over`` window

Scale: the only shuffle is the window's partition-by-customer (and the
sample's sort).  At 100 TB-scale generation you'd raise
``spark.range``'s parallelism and swap the exact ``orderBy(rand)``
sample for ``df.sample(fraction)`` (approximate, shuffle-free) — noted
inline.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: reference dags/simulate_data.py:20-21
NEW_USERS_DAILY = 10
RETURNING_USERS_DAILY = 200


def simulate_daily_batch(
    spark: SparkSession,
    max_existing_id: int,
    start_time: dt.datetime | str,
    seed: int = 42,
    new_users: int = NEW_USERS_DAILY,
    returning_users: int = RETURNING_USERS_DAILY,
) -> DataFrame:
    """One 24-hour batch of synthetic transactions.

    Mirrors the reference's distributions exactly (FIXTURES.md F1):
    quantity U{1..4} (simulate_data.py:167), unit price U(5,100) rounded
    to 2dp (:166), 1-14 purchases per customer (:163), session start
    uniform in the window, purchases separated by cumulative 20-100 s
    gaps (:175-191).  ``TotalPurchase = Quantity * UnitPrice`` (:204).

    Determinism: seeded ``rand`` is reproducible for a fixed
    partitioning, so ID frames are built with explicit partition counts.
    """
    # --- customer set: new IDs are dense above the current max
    # (reference simulate_data.py:113-118); returning customers sampled
    # without replacement from the dense pool 1..max (:120-132).
    new_ids = spark.range(
        max_existing_id + 1, max_existing_id + 1 + new_users, 1, 1
    ).select(F.col("id").alias("CustomerID"))

    n_returning = min(returning_users, max_existing_id)
    if n_returning > 0:
        pool = spark.range(1, max_existing_id + 1, 1, 8)
        # exact sample-without-replacement.  At extreme pool sizes,
        # pre-filter with .sample(fraction=~3n/pool) to keep the sort tiny.
        returning = (
            pool.orderBy(F.rand(seed))
            .limit(n_returning)
            .select(F.col("id").alias("CustomerID"))
        )
        customers = new_ids.unionByName(returning)
    else:
        # empty master table -> all-new-customers branch
        # (reference simulate_data.py:113-118, empty->max=0 at :39)
        customers = new_ids

    # --- fan out 1..n purchases per customer: explode(sequence(1, n))
    with_n = customers.withColumn(
        "n_purchases",
        (F.rand(seed + 1) * 14).cast("int") + F.lit(1),  # U{1..14}, :163
    )
    exploded = with_n.select(
        "CustomerID",
        F.explode(F.sequence(F.lit(1), F.col("n_purchases"))).alias(
            "purchase_idx"
        ),
    )

    # --- session timing: per-customer start uniform in the 24 h window,
    # then a running sum of per-purchase gaps (cumsum, :180).
    w = (
        Window.partitionBy("CustomerID")
        .orderBy("purchase_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.lit(str(start_time)).cast("timestamp")
    session_offset = F.rand(seed + 2) * 86400.0  # seconds into the day
    gap = F.rand(seed + 3) * 80.0 + 20.0  # 20-100 s, :180
    timed = exploded.withColumn(
        "_session_start", F.first(session_offset).over(w)
    ).withColumn("_cum_gap", F.sum(gap).over(w))

    # --- prices and quantities (:166-167), total (:204)
    priced = timed.select(
        "CustomerID",
        ((F.rand(seed + 4) * 4).cast("long") + F.lit(1)).alias("Quantity"),
        F.round(F.rand(seed + 5) * 95.0 + 5.0, 2).alias("UnitPrice"),
        (
            start
            + F.make_dt_interval(
                secs=F.col("_session_start") + F.col("_cum_gap")
            )
        ).alias("order_timestamp"),
    )
    return priced.withColumn(
        "TotalPurchase", F.col("Quantity") * F.col("UnitPrice")
    )
