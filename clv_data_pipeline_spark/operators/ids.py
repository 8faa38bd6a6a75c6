"""Distributed global row numbering.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY moves the
whole input through ONE reducer — the classic scale killer in id
assignment and corpus ordering (reference-scale engines hide this
behind their own range services; Spark makes you compose it).  The
composition here reconstructs the exact global rank from one hash
exchange:

1. the fine order key must be (or start with) a lowercase-hex hash
   column; its first byte is its own range bucket, because lowercase
   hex strings compare lexicographically exactly like the numbers they
   encode ('0' < '9' < 'a' < 'f' in ASCII);
2. rank locally per (coarse..., bucket) — one corpus-sized hash
   exchange, 256 x |coarse| groups;
3. per-group counts collapse map-side into a metadata-sized frame
   whose cumulative sum (ordered by the same (coarse..., bucket)
   tuple) is each group's global offset; the single-partition window
   over it is bounded by the group fanout, never the corpus;
4. offsets broadcast back: global = offset + local rank.

Every stage is deterministic — unlike repartitionByRange (sampled
boundaries) + monotonically_increasing_id (physical row order), task
retries and plan-subtree re-execution cannot shift an id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    hash_col: str,
    tiebreak_col: str,
    out_col: str = "pos",
    coarse_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``out_col`` = 1-based global ROW_NUMBER over
    ``(*coarse_cols, hash_col, tiebreak_col)`` without a global sort.

    ``hash_col`` must hold lowercase hex (e.g. ``F.md5``) so its
    2-char prefix buckets preserve the sort order; ``coarse_cols``
    (e.g. a curriculum stage) order ahead of the hash and must be
    non-null and low-cardinality (the offsets frame is
    |distinct coarse| x 256 rows).
    """
    bucketed = df.withColumn("_b", F.substring(hash_col, 1, 2))
    keys = [*coarse_cols, "_b"]
    order = [F.col(c).asc() for c in keys]
    counts = bucketed.groupBy(*keys).agg(F.count("*").alias("_cnt"))
    wo = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        *keys, F.coalesce(F.sum("_cnt").over(wo), F.lit(0)).alias("_off")
    )
    wr = Window.partitionBy(*keys).orderBy(hash_col, tiebreak_col)
    return (
        bucketed.withColumn("_rn", F.row_number().over(wr))
        .join(F.broadcast(offsets), keys)
        .withColumn(out_col, (F.col("_off") + F.col("_rn")).cast("long"))
        .drop("_b", "_rn", "_off")
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running",
    n_buckets: int = 2048,
) -> DataFrame:
    """Global running SUM over ``order_col`` without the
    single-partition window — the Blelloch scan composed from
    DataFrame ops: (1) a 1-row (min, max) broadcast derives a
    deterministic integer bucket (fixed width, never sampled range
    boundaries), (2) each bucket computes its local running sum after
    ONE hash exchange, (3) bucket totals collapse to an
    ``n_buckets``-row frame whose exclusive cumulative sum is each
    bucket's global offset, broadcast back.  ``value_col`` must be
    exactly summable (bigint/decimal) so the recomposition is
    bit-identical to the sequential scan; ``order_col`` must be a
    non-null orderable integer (ids, epoch days).  Corpora whose
    bucket count would outgrow one offsets frame recurse the same
    three steps per level (log_B n levels)."""
    stats = df.agg(
        F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi")
    )
    width = (
        F.floor(
            (F.col("_hi") - F.col("_lo")) / F.lit(float(n_buckets))
        ).cast("long")
        + 1
    )
    b = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "_bk", F.floor((F.col(order_col) - F.col("_lo")) / width)
        )
        .drop("_lo", "_hi")
    )
    wr = (
        Window.partitionBy("_bk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("_run", F.sum(value_col).over(wr))
    totals = b.groupBy("_bk").agg(F.sum(value_col).alias("_tot"))
    wo = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bk", F.coalesce(F.sum("_tot").over(wo), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bk")
        .withColumn(out_col, F.col("_off") + F.col("_run"))
        .drop("_bk", "_run", "_off")
    )


def distributed_prefix_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "running_max",
    n_buckets: int = 2048,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Global running MAX over ``order_col`` — same Blelloch
    decomposition as :func:`distributed_prefix_sum` with (max,
    greatest) as the monoid: per-bucket running max after one
    exchange, exclusive prefix-max of the bucket maxima broadcast
    back.  Max is idempotent and exact on any orderable type, so the
    recomposition equals the sequential scan with no numeric caveats —
    this is the streaming-watermark computation (running max event
    time) in batch form.

    When ``order_col`` has duplicates the intra-tie scan order is
    nondeterministic, so the running max AT a tied row can differ
    between runs whenever tied rows carry different values; pass a
    unique ``tiebreak_col`` to pin it (equal ``order_col`` values land
    in the same bucket, so the tiebreak composes exactly with the
    bucket decomposition)."""
    stats = df.agg(
        F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi")
    )
    width = (
        F.floor(
            (F.col("_hi") - F.col("_lo")) / F.lit(float(n_buckets))
        ).cast("long")
        + 1
    )
    b = (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            "_bk", F.floor((F.col(order_col) - F.col("_lo")) / width)
        )
        .drop("_lo", "_hi")
    )
    order_keys = (
        [order_col] if tiebreak_col is None else [order_col, tiebreak_col]
    )
    wr = (
        Window.partitionBy("_bk")
        .orderBy(*order_keys)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = b.withColumn("_run", F.max(value_col).over(wr))
    totals = b.groupBy("_bk").agg(F.max(value_col).alias("_tot"))
    wo = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bk", F.max("_tot").over(wo).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bk")
        .withColumn(
            out_col,
            F.when(F.col("_off").isNull(), F.col("_run")).otherwise(
                F.greatest(F.col("_run"), F.col("_off"))
            ),
        )
        .drop("_bk", "_run", "_off")
    )
