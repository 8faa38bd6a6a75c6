"""2-D skyline (Pareto frontier) — "best tradeoff" queries: customers
no one beats on BOTH recency and spend, suppliers on cost vs balance,
docs on quality vs length.  The naive formulation is an all-pairs
NOT-EXISTS domination check (O(n^2)); the classic distributed shape is
bucket pruning (Borzsony et al., "The Skyline Operator", ICDE 2001 +
the standard grid partitioning refinement):

1. ONE pass computes global (min, max) of the minimized dimension — a
   1-row broadcast — and assigns each row a fixed-width bucket.
2. Per-bucket maxima of the maximized dimension aggregate to a
   B-row frame; its exclusive running max over lower buckets (computed
   on <= 1024 rows) broadcasts back.
3. A row is PRUNED if some lower bucket's max already dominates it —
   at any realistic distribution this eliminates almost everything, in
   one map-side comparison.
4. Exact domination resolves among the SURVIVORS (bounded: at most one
   survivor per distinct minimized value can win per bucket) with a
   running-max window partitioned BY BUCKET — never a global sort, and
   the cross-bucket part of the check is already carried by the
   broadcast running max.

Ties: a point is dominated only STRICTLY (other point <= / >= on both
dims and strictly better on at least one), so exact duplicates both
survive — matching the textbook NOT EXISTS definition the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Rows of ``df`` not strictly dominated (smaller-or-equal
    ``min_col`` AND greater-or-equal ``max_col``, strict on one).
    Returns the input columns unchanged."""
    stats = df.agg(
        F.min(min_col).alias("_lo"), F.max(min_col).alias("_hi")
    )
    b = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "_bkt",
            F.when(
                F.col("_hi") > F.col("_lo"),
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        (F.col(min_col) - F.col("_lo"))
                        * n_buckets
                        / (F.col("_hi") - F.col("_lo"))
                    ).cast("long"),
                ),
            ).otherwise(F.lit(0)),
        )
        .drop("_lo", "_hi")
    )
    # exclusive running max of max_col over strictly-lower buckets:
    # B rows, window over the bucket frame only
    bucket_max = b.groupBy("_bkt").agg(F.max(max_col).alias("_bm"))
    wb = Window.orderBy("_bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = bucket_max.select(
        "_bkt", F.max("_bm").over(wb).alias("_cum_prev")
    )
    pruned = b.join(F.broadcast(cum), "_bkt").filter(
        F.col("_cum_prev").isNull()
        | (F.col(max_col) >= F.col("_cum_prev"))
    )
    # exact within-bucket resolution: running max over STRICTLY smaller
    # min_col inside the bucket (cross-bucket domination is fully
    # covered by _cum_prev because any lower bucket's min_col is
    # strictly smaller).  The running max aggregates per DISTINCT
    # min_col first, then windows with rowsBetween over that distinct
    # frame — a rangeBetween(..., -1) over raw rows frames values
    # <= current-1, which misses dominators in (v-1, v) whenever
    # min_col is non-integer (cost/balance/quality uses).
    w_lt = (
        Window.partitionBy("_bkt")
        .orderBy(min_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_val = (
        pruned.groupBy("_bkt", min_col)
        .agg(F.max(max_col).alias("_m_eq"))
        .withColumn("_m_lt", F.max("_m_eq").over(w_lt))
    )
    out = (
        pruned.join(per_val, ["_bkt", min_col])
        .filter(
            (F.col("_m_lt").isNull() | (F.col(max_col) > F.col("_m_lt")))
            & (F.col(max_col) >= F.col("_m_eq"))
            & (
                F.col("_cum_prev").isNull()
                | (F.col(max_col) > F.col("_cum_prev"))
            )
        )
    )
    return out.drop("_bkt", "_cum_prev", "_m_lt", "_m_eq")
