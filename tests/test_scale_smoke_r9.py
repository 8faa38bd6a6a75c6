"""Scale-shape smoke for the round-9 join-shaped ALS item step
(VERDICT r8 item 4): a 10⁶-distinct-item ratings table must train
without any factor matrix visiting the driver — the broadcast path's
former hard ValueError is now a path selector into als_fit_joined,
whose half-steps are one hash shuffle + one segment-reduced batched
solve each (np.add.reduceat + batched np.linalg.solve, no per-group
pandas apply — a million single-observation item groups are one
vectorized pass per partition).
"""

from __future__ import annotations

import pytest
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
pytestmark = pytest.mark.slowsuite  # excluded from the default (driver) run; see pytest.ini


N_ITEMS = 1_000_000
N_USERS = 1_000


def test_als_trains_at_1m_distinct_items(spark):
    from clv_data_pipeline_spark.operators.recsys import (
        als_fit,
        als_objective_df,
    )

    ratings = spark.range(N_ITEMS).select(
        (F.col("id") % N_USERS).alias("user"),
        F.col("id").alias("item"),
        (
            1.0
            + (
                F.conv(
                    F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 5
            ).cast("double")
        ).alias("rating"),
    )
    t0 = time.perf_counter()
    uf, yf = als_fit(ratings, k=4, iters=1, reg=0.1, max_items=100_000)
    assert isinstance(yf, DataFrame)  # scale path, not a driver dict
    n_items = yf.count()
    n_users = uf.count()
    elapsed = time.perf_counter() - t0
    assert n_items == N_ITEMS
    assert n_users == N_USERS
    # the objective must at least be finite and the factors usable
    obj = als_objective_df(ratings, uf, yf, reg=0.1)
    assert obj > 0 and obj == obj  # finite, not NaN
    # one iteration = 2 shuffle+solve jobs; if this takes minutes the
    # item step regressed to a driver collect or per-group applies
    assert elapsed < 180, f"join-shaped ALS took {elapsed:.0f}s at 1M items"
