"""Skew mitigation (SURVEY.md §4 / 100 TB design notes).

Two standard tools, both exact:

- **Salted two-stage aggregation**: a hot grouping key (one customer
  with 10^9 transactions) overloads its reducer.  Stage 1 aggregates on
  (key, salt) spreading the hot key over N partitions; stage 2 folds
  the N partials.  Only decomposable aggregates qualify — min/max/sum/
  count here; the RFM distinct-day count rides the (customer, date)
  grain of operators/incremental.py, which is itself salt-friendly.
  Spark's partial aggregation already does this *within* partitions;
  explicit salting matters when a single key exceeds one reducer's
  capacity at the merge, i.e. true power-law keys.
- **Broadcast/AQE skew joins** are configured in session.py
  (spark.sql.adaptive.skewJoin.enabled): AQE splits oversized shuffle
  partitions at runtime, which is preferable to manual join salting
  whenever statistics exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_rfm_partials(
    transactions: DataFrame,
    customer_col: str = "CustomerID",
    ts_col: str = "order_timestamp",
    amount_col: str = "TotalPurchase",
    salt_buckets: int = 16,
) -> DataFrame:
    """RFM sufficient statistics via salted two-stage aggregation.

    Stage 1 groups on (customer, day, salt) — the hot customer's rows
    split across ``salt_buckets`` reducers; stage 2 folds the salted
    partials back to (customer, day).  The output feeds
    operators/incremental.rfm_from_partials unchanged, and equals the
    unsalted build exactly (all aggregates decomposable).
    """
    salted = transactions.withColumn(
        "_salt", (F.rand(7) * salt_buckets).cast("int")
    )
    stage1 = salted.groupBy(
        F.col(customer_col).alias("customer_id"),
        F.to_date(F.col(ts_col)).alias("purchase_date"),
        F.col("_salt"),
    ).agg(
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
        F.sum(F.col(amount_col).cast("decimal(18,4)")).alias("sum_amount"),
        F.count(amount_col).alias("cnt_amount"),
    )
    return stage1.groupBy("customer_id", "purchase_date").agg(
        F.min("min_ts").alias("min_ts"),
        F.max("max_ts").alias("max_ts"),
        F.sum("sum_amount").alias("sum_amount"),
        F.sum("cnt_amount").alias("cnt_amount"),
    )


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Exact equi-join that survives a power-law key: the skewed fact
    side gets a deterministic per-row salt (hash of all its columns),
    the dim side replicates ``salt_buckets`` times, and the join runs on
    (key, salt) — the hot key's rows spread over ``salt_buckets``
    reducers instead of melting one.

    Use when the dim side is too big to broadcast AND AQE's runtime
    skew split doesn't apply (e.g. the skewed side is the output of
    another operator without statistics).  Replication multiplies the
    dim shuffle by ``salt_buckets`` — keep the dim side the smaller one.
    Salt derives from xxhash64, not rand(): deterministic re-execution
    (task retries see the same salt) and no RNG state.
    """
    s = skewed.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)),
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return s.join(d, [key, "_salt"], how).drop("_salt")
