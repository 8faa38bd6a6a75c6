"""MERGE/upsert: key-matched update + insert as one relational op.

The reference's write path is truncate-and-replace only
(/root/reference/dags/clv_models.py:95-97 WRITE_TRUNCATE); at 100 TB a
full rewrite per day is the bottleneck, so the engine offers the upsert
the warehouse tier would: MERGE target USING source ON keys
WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT.

Spark-first shape: one full-outer join on the key columns with a
source-presence marker deciding each column (matched rows take the
source value even when it is NULL, matching SQL MERGE's UPDATE SET
semantics — a COALESCE would silently keep the stale target value on
NULL updates).  The join shuffles both sides on
the key; pair it with ``sources.io.write_bucketed`` on the target so the
target side's shuffle is pre-paid (shuffle-free contract pinned in
tests/test_plans.py), leaving the daily delta as the only moved data.
Delete semantics compose as a ``left_anti`` before the merge.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Return ``target`` with ``source`` rows upserted on ``keys``.

    Matched keys take every source column; unmatched target rows pass
    through; source-only keys insert.  Both frames must share a schema
    (the reference's exact-schema contract, clv_models.py:47-49).
    """
    missing = set(target.columns) ^ set(source.columns)
    if missing:
        raise ValueError(f"schema mismatch on columns: {sorted(missing)}")
    # Rename the source side up front: target and source often share
    # lineage (a delta carved from the table it updates), which makes
    # alias-qualified column refs ambiguous after a self-join.
    # The marker distinguishes "row matched" from "column is NULL": a
    # matched row must take the source value even when that value is
    # NULL (SQL MERGE UPDATE), which COALESCE cannot express.
    s = source.select(
        *[F.col(c).alias(f"__src_{c}") for c in source.columns],
        F.lit(True).alias("__src_present"),
    )
    # Plain equality, as in SQL MERGE ... ON t.k = s.k: NULL keys never
    # match (they insert as distinct rows).  eqNullSafe would wrap the
    # keys and break partitioning reuse — a bucketed target would
    # re-shuffle even though it is already hash-partitioned on the key.
    cond = None
    for k in keys:
        eq = F.col(k) == F.col(f"__src_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = target.join(s, cond, "full_outer")
    # when() treats the NULL marker (target-only row) as false -> keep
    # the target column; True (matched or source-only) -> source column.
    return joined.select(
        *[
            F.when(F.col("__src_present"), F.col(f"__src_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in target.columns
        ]
    )
