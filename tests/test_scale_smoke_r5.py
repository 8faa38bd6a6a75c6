"""Scale-shape smoke for the round-5 heavies (VERDICT r5 #7):
distributed id assignment and ALS at 3M rows / 200k keys, SemDeDup at
50k vectors, and the streaming id-issuance twin at 300k rows.  Same
contract as test_scale_smoke.py — bound wall time on local[4] to catch
cost curves that would not survive a scale-up (single-reducer windows,
driver collects of unbounded data, per-cell quadratics without the
cell bound)."""

from __future__ import annotations

import pytest
import time

import pandas as pd
from pyspark.sql import functions as F
pytestmark = pytest.mark.slowsuite  # excluded from the default (driver) run; see pytest.ini


N_ROWS = 3_000_000
N_KEYS = 200_000


def test_assign_ids_3m_rows_no_single_reducer(spark):
    """distributed_row_number over 3M keys: ids must come out exactly
    1..n (sum identity pins both contiguity and uniqueness) without a
    global sort or single-partition window."""
    from clv_data_pipeline_spark.operators.ids import distributed_row_number

    df = spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )
    t0 = time.perf_counter()
    out = distributed_row_number(
        df, hash_col="h", tiebreak_col="doc_id", out_col="new_id"
    )
    agg = out.agg(
        F.count("*").alias("n"),
        F.min("new_id").alias("lo"),
        F.max("new_id").alias("hi"),
        F.sum("new_id").alias("s"),
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    assert agg["n"] == N_ROWS
    assert agg["lo"] == 1 and agg["hi"] == N_ROWS
    assert agg["s"] == N_ROWS * (N_ROWS + 1) // 2
    assert elapsed < 90, f"assign_ids took {elapsed:.1f}s on 3M rows"


def test_semdedup_50k_vectors_cell_bounded(spark):
    """SemDeDup at 50k x 64-dim with planted duplicate pairs: the
    within-cell quadratic must stay cell-bounded (n^2/k), every planted
    twin must be absorbed, and wall time must stay linear-ish."""
    import numpy as np

    from clv_data_pipeline_spark.operators.similarity import semdedup

    n, dim = 50_000, 64

    def _gen(batches):
        js = np.arange(1, dim + 1, dtype=np.uint64)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            base = (ids // 2).astype(np.uint64)  # 2j/2j+1: planted twins
            # murmur fmix64 per (base, dim): distinct bases give near-
            # independent uniforms, so non-twin cosine ~ N(0, 1/64) and
            # threshold 0.95 only ever fires on the planted twins
            x = base[:, None] * np.uint64(2654435761) + js[None, :] * np.uint64(97)
            x ^= x >> np.uint64(33)
            x *= np.uint64(0xFF51AFD7ED558CCD)
            x ^= x >> np.uint64(33)
            vals = (x % np.uint64(100_000)).astype(np.float64) / 100_000.0 - 0.5
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in vals]}
            )

    vecs = spark.range(n).mapInPandas(
        _gen, "vec_id long, embedding array<double>"
    )
    t0 = time.perf_counter()
    out = semdedup(vecs, n_cells=64, threshold=0.95)
    kept = out.filter(F.col("kept")).count()
    dups = out.filter(~F.col("kept")).count()
    elapsed = time.perf_counter() - t0
    # identical twins always collide in-cell: exactly one of each pair
    # survives, so kept == dups == n/2 regardless of cell assignment
    assert kept == n // 2, (kept, dups)
    assert dups == n // 2
    assert elapsed < 150, f"semdedup took {elapsed:.1f}s on 50k vectors"


def test_als_3m_ratings_bounded(spark):
    """One ALS half-sweep pair at 3M interactions x 200k users x 40
    items: the user step must stay one Arrow pass over grouped
    observations and the item step join-shaped — nothing user-sized on
    the driver."""
    from clv_data_pipeline_spark.operators.recsys import als_fit

    ratings = spark.range(N_ROWS).select(
        (F.col("id") % N_KEYS).alias("user"),
        F.concat(
            F.lit("i"), (F.pmod(F.xxhash64("id"), 40)).cast("string")
        ).alias("item"),
        (F.pmod(F.col("id") * 2654435761, 50) / 10.0 + 1.0).alias(
            "rating"
        ),
    )
    t0 = time.perf_counter()
    uf, Y = als_fit(ratings, k=4, iters=1, reg=0.1)
    n_users = uf.count()
    elapsed = time.perf_counter() - t0
    assert n_users == N_KEYS
    assert len(Y) == 40
    assert elapsed < 180, f"ALS iteration took {elapsed:.1f}s on 3M rows"


def test_stream_id_issuance_300k_rows(spark, tmp_path):
    """The streaming id-issuance sink at 300k rows across 3 triggers:
    stored-count continuation must hold at volume (ids exactly 1..n by
    the sum identity) with per-trigger cost bounded by the batch, not
    the accumulated corpus."""
    import uuid

    from clv_data_pipeline_spark.streaming.ingest import id_issuance_sink

    n = 300_000
    src = str(tmp_path / "arrivals")
    d = spark.range(n).select(F.col("id").alias("doc_id"))
    third = n // 3
    for lo, hi in ((0, third), (third, 2 * third), (2 * third, n)):
        d.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(2).write.mode("append").parquet(src)

    target = f"ids_smoke_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    stream = (
        spark.readStream.schema(d.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(id_issuance_sink(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.table(target)
    agg = out.agg(
        F.count("*").alias("n"),
        F.min("new_id").alias("lo"),
        F.max("new_id").alias("hi"),
        F.sum("new_id").alias("s"),
    ).collect()[0]
    elapsed = time.perf_counter() - t0
    assert agg["n"] == n
    assert agg["lo"] == 1 and agg["hi"] == n
    assert agg["s"] == n * (n + 1) // 2
    assert elapsed < 120, f"stream issuance took {elapsed:.1f}s on 300k rows"
    spark.sql(f"DROP TABLE IF EXISTS {target}")
