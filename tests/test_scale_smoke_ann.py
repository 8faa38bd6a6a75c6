"""Scale-shape smoke for the dedup/ANN suite: MinHash at ~100k docs,
SRP-LSH and IVF ANN at 10-20k vectors (~10-40x the oracle SF).  Same
contract as test_scale_smoke.py — catches cost curves that would not
survive a scale-up (candidate explosions, driver collects, quadratic
banding) by bounding wall time on local[4]."""

from __future__ import annotations

import pytest
import time

import pandas as pd
from pyspark.sql import functions as F
pytestmark = pytest.mark.slowsuite  # excluded from the default (driver) run; see pytest.ini


N_DOCS = 100_000
N_VECS = 20_000
DIM = 64


def _synthetic_docs(spark, n=N_DOCS):
    """Deterministic ~8-word docs over a 1k-word vocabulary; ids pair up
    (2j, 2j+1) with identical text, so true near-dup structure exists."""
    base = (F.col("id") / 2).cast("long")  # duplicate pairs
    # xxhash mixing: words reuse a 1k vocabulary but the 8-tuple is
    # unique per base (collision odds ~1e-24), unlike a linear formula
    # whose words would all share one period
    words = [
        F.concat(F.lit("w"), F.pmod(F.xxhash64(base, F.lit(i)), F.lit(1000)))
        for i in range(8)
    ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )


def _synthetic_vecs(spark, n=N_VECS, dim=DIM):
    """Id-deterministic pseudo-random vectors via an Arrow-batched numpy
    kernel (integer-hash lattice, no RNG state)."""
    import numpy as np

    primes = np.array(
        [(2654435761 * (j + 1)) % 1_000_003 for j in range(dim)],
        dtype=np.int64,
    )

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vals = ((ids[:, None] * primes[None, :] + 7) % 997) / 997.0 - 0.5
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [row.astype("float32") for row in vals],
                }
            )

    return spark.range(n).mapInPandas(_gen, "vec_id long, embedding array<float>")


def test_minhash_dedup_100k_docs(spark):
    from clv_data_pipeline_spark.operators.dedup import dedup_minhash

    docs = _synthetic_docs(spark)
    t0 = time.perf_counter()
    n = dedup_minhash(docs).count()
    elapsed = time.perf_counter() - t0
    # every (2j, 2j+1) pair is an exact dup -> at most ~half survive;
    # vocabulary reuse may merge a few more, never fewer
    assert n <= N_DOCS // 2
    assert n > N_DOCS // 10  # but not collapsed to nothing
    assert elapsed < 120, f"minhash dedup took {elapsed:.1f}s on 100k docs"


def test_lsh_ann_20k_vectors(spark):
    from clv_data_pipeline_spark.operators.similarity import lsh_topk

    vecs = _synthetic_vecs(spark)
    t0 = time.perf_counter()
    # 8 bits/band keeps buckets ~n/256: candidate volume stays linear-ish
    out = lsh_topk(vecs, k=1, dim=DIM, num_planes=64, bands=8)
    n = out.count()
    elapsed = time.perf_counter() - t0
    # uniform vectors: not every vector finds a bucket-mate, but most do
    assert n > N_VECS // 2
    assert elapsed < 120, f"LSH ANN took {elapsed:.1f}s on 20k vectors"


def test_ivf_ann_10k_vectors(spark):
    from clv_data_pipeline_spark.operators.similarity import ivf_topk

    vecs = _synthetic_vecs(spark, n=10_000)
    t0 = time.perf_counter()
    # 64 cells x nprobe 2 -> candidate volume ~ n^2/32, bounded einsum
    out = ivf_topk(vecs, k=1, n_cells=64, nprobe=2)
    n = out.count()
    elapsed = time.perf_counter() - t0
    assert n == 10_000  # every vector probes its own cell -> has neighbors
    assert elapsed < 120, f"IVF ANN took {elapsed:.1f}s on 10k vectors"


def test_cosine_topk_sharded_stays_bounded(spark):
    """The default brute-force path must route through bounded index
    shards (never one full-index driver collect) once the table exceeds
    the shard cap."""
    from clv_data_pipeline_spark.operators import similarity as S

    vecs = _synthetic_vecs(spark, n=4_000)
    t0 = time.perf_counter()
    out = S.cosine_topk(vecs, k=1, max_rows_per_shard=1_000)
    n = out.count()
    elapsed = time.perf_counter() - t0
    assert n == 4_000
    assert elapsed < 120, f"sharded cosine took {elapsed:.1f}s on 4k vectors"


def test_pq_ann_20k_vectors(spark):
    from clv_data_pipeline_spark.operators.pq import pq_topk

    vecs = _synthetic_vecs(spark, n=N_VECS)
    t0 = time.perf_counter()
    n = pq_topk(vecs, k=1, num_shards=4).count()
    elapsed = time.perf_counter() - t0
    assert n == N_VECS
    assert elapsed < 120, f"PQ ANN took {elapsed:.1f}s on 20k vectors"


def test_bloom_semi_join_3m_rows_linear(spark):
    from clv_data_pipeline_spark.operators.bloom import bloom_semi_join

    big = spark.range(3_000_000).select(F.col("id").alias("k"))
    small = spark.range(0, 3_000_000, 100).select(F.col("id").alias("j"))
    t0 = time.perf_counter()
    n = bloom_semi_join(big, "k", small, "j").count()
    elapsed = time.perf_counter() - t0
    assert n == 30_000
    assert elapsed < 60, f"bloom semi-join took {elapsed:.1f}s on 3M rows"


def test_ivf_pq_ann_20k_vectors(spark):
    """IVF-PQ at 20k vectors / 64 cells: wall-time bound plus the
    composition's defining property — the inverted file that crosses
    the cell shuffle carries codes and a cell id, never float
    vectors (the 32x member-shuffle saving over plain IVF)."""
    from clv_data_pipeline_spark.operators.pq import (
        build_ivf_pq_index,
        ivf_pq_topk,
        train_pq_codebooks,
    )
    from clv_data_pipeline_spark.operators.similarity import (
        fit_ivf_centroids,
    )

    vecs = _synthetic_vecs(spark, n=N_VECS)
    cents = fit_ivf_centroids(vecs, k=64)
    books = train_pq_codebooks(vecs)
    index = build_ivf_pq_index(vecs, cents, books)
    # member rows are (id, cell, codes) — no vector column at all
    assert set(index.columns) == {"vec_id", "cell", "codes"}
    t0 = time.perf_counter()
    n = ivf_pq_topk(
        vecs, k=1, n_cells=64, nprobe=2, shortlist=20,
        centroids=cents, books=books, index_df=index,
    ).count()
    elapsed = time.perf_counter() - t0
    assert n == N_VECS
    assert elapsed < 120, f"IVF-PQ took {elapsed:.1f}s on 20k vectors"


def test_semdedup_20k_vectors(spark):
    """SemDeDup at 20k vectors / 64 cells: wall-time bound (the
    within-cell Gram blocks are ~(n/k)^2 = ~100k dot products each,
    not n^2 = 400M) plus the kernel contract — every vector appears
    exactly once, and duplicates only reference earlier-admitted ids
    within their own cell."""
    from clv_data_pipeline_spark.operators.similarity import semdedup

    vecs = _synthetic_vecs(spark, n=N_VECS)
    t0 = time.perf_counter()
    rows = semdedup(vecs, n_cells=64, threshold=0.95).collect()
    elapsed = time.perf_counter() - t0
    assert len(rows) == N_VECS
    by_id = {r["vec_id"]: r for r in rows}
    dups = [r for r in rows if not r["kept"]]
    for r in dups:
        keeper = by_id[r["dup_of"]]
        assert keeper["kept"] and keeper["cell"] == r["cell"]
        assert keeper["vec_id"] < r["vec_id"]
    assert elapsed < 120, f"semdedup took {elapsed:.1f}s on 20k vectors"
