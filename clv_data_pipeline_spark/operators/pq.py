"""Product-quantization (PQ) approximate nearest neighbors.

Completes the ANN ladder (operators/similarity.py: brute -> LSH -> IVF)
with the memory-bound scale path: each vector compresses to ``m`` small
codes (one per subspace), so the broadcast index shrinks by
``d * 8 / m`` (32x at the defaults: 64-dim float64 -> 16 bytes of
codes).  Where brute-force sharding is compute-bound and IVF is
probe-bound, PQ is the kernel you reach for when the INDEX ITSELF is
the bottleneck — 1B vectors = 16 GB of codes vs 512 GB of floats.

Pipeline (all barriers bounded, same contract as the IVF quantizer,
operators/similarity.py:419):
1. **Train** (driver): k-means per subspace on a bounded sample
   (``limit(sample_n).toPandas()``), seeded numpy RNG, fixed iteration
   count — the codebook is ``m x ksub x dsub`` floats (4 KB at the
   defaults), broadcast-trivial.
2. **Encode** (map-only): Arrow-batched argmin over each subspace —
   one matmul per subspace per batch, no shuffle.
3. **Score** (asymmetric distance computation): queries stay
   full-precision; each query builds an ``m x ksub`` inner-product
   table against the codebooks (one tiny matmul) and scores an entire
   code shard with ``m`` numpy gathers — no decompression, no
   per-pair arithmetic beyond the table lookup.

Approximate by construction (quantization error), so the registered
query is rows-only; recall@k against the exact kernel is pinned in
tests/test_pq.py, mirroring the LSH/IVF recall tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clv_data_pipeline_spark.operators.similarity import spread_partitions

#: subspaces (d must divide evenly), centroids per subspace, training
#: sample cap, k-means iterations.  16 x 64 on 64-dim = 16 codes/vector
#: (32x compression); measured recall@10 vs brute on the synthetic
#: embeddings: ~0.62 ADC-only, ~1.0 with the exact re-rank stage.
PQ_M = 16
PQ_KSUB = 64
PQ_SAMPLE = 20_000
PQ_ITERS = 10


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return x / n


def train_pq_codebooks(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    sample_n: int = PQ_SAMPLE,
    iters: int = PQ_ITERS,
    seed: int = 7,
) -> np.ndarray:
    """(m, ksub, d/m) codebooks from a bounded sample — one driver-side
    k-means per subspace (n <= sample_n rows, fixed iters, seeded)."""
    pdf = embeddings.select(vec_col).limit(sample_n).toPandas()
    x = _normalize(np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        c = sub[rng.choice(len(sub), size=min(ksub, len(sub)),
                           replace=False)].copy()
        if len(c) < ksub:  # tiny input: pad with jittered repeats
            c = np.vstack([c, c[rng.integers(len(c), size=ksub - len(c))]
                           + rng.normal(0, 1e-6, (ksub - len(c), dsub))])
        for _ in range(iters):
            # argmin_c |x - c|^2 == argmin_c (|c|^2 - 2 x.c)
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (sub @ c.T)
            assign = d2.argmin(axis=1)
            for ci in range(ksub):
                pts = sub[assign == ci]
                c[ci] = pts.mean(axis=0) if len(pts) else \
                    sub[rng.integers(len(sub))]
        books[j] = c
    return books


def encode_pq(
    embeddings: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>[m]) — map-only Arrow-batched argmin per
    subspace; the codebook rides an executor broadcast."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(books)
    m, ksub, dsub = books.shape

    def _enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bks = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            x = _normalize(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            )
            codes = np.empty((len(x), m), dtype=np.int64)
            for j in range(m):
                sub = x[:, j * dsub:(j + 1) * dsub]
                c = bks[j]
                d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (sub @ c.T)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        _enc, f"{id_col} long, codes array<bigint>"
    )


def pq_topk(
    embeddings: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    num_shards: int = 1,
    round_scale: int = 6,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via ADC over the compressed index.

    Same output contract as cosine_topk/lsh_topk/ivf_topk:
    (vec_id, neighbor_id, sim, rank), sim = approximate cosine.  The
    collected object per shard is the CODES matrix (n/shards x m
    int64 -> int8-sized information), not the vectors — the whole point
    at 100 TB.  Shards union and re-rank globally, exact with respect
    to the approximate scores.
    """
    books = train_pq_codebooks(
        embeddings, vec_col, m=m, ksub=ksub, seed=seed
    )
    codes_df = encode_pq(embeddings, books, id_col, vec_col)
    return pq_topk_from_codes(
        codes_df, embeddings, books, k=k, id_col=id_col, vec_col=vec_col,
        num_shards=num_shards, round_scale=round_scale,
    )


def pq_topk_from_codes(
    codes_df: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_shards: int = 1,
    round_scale: int = 6,
) -> DataFrame:
    """ADC top-k of ``queries`` against a PRE-ENCODED codes index —
    the kernel :func:`pq_topk` wraps, split out so an incremental
    pipeline can feed stored codes plus a freshly-encoded delta
    (:func:`pq_incremental`) without re-encoding the corpus."""
    spark = queries.sparkSession
    dsub = books.shape[2]
    if num_shards > 1:
        codes_df = codes_df.persist()

    per_shard = None
    for si in range(num_shards):
        shard = codes_df if num_shards == 1 else codes_df.filter(
            F.pmod(F.col(id_col), F.lit(num_shards)) == si
        )
        pdf = shard.toPandas()
        if pdf.empty:
            continue
        ids_b = pdf[id_col].to_numpy(dtype=np.int64)
        codes_b = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
        bc = spark.sparkContext.broadcast((ids_b, codes_b, books))

        def _score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids_idx, codes, bks = bc.value
            mm = bks.shape[0]
            for qdf in it:
                if not len(qdf):
                    continue
                q = _normalize(
                    np.stack(qdf[vec_col].to_numpy()).astype(np.float64)
                )
                qids = qdf[id_col].to_numpy(dtype=np.int64)
                out = {"vec_id": [], "neighbor_id": [], "sim": [],
                       "rank": []}
                # ADC in query chunks: one (chunk, ksub) IP matmul +
                # one (chunk, n_index) gather per subspace — mm numpy
                # ops per chunk instead of mm per query, while the
                # score matrix stays <=256 x n_index (a full Arrow
                # batch x 1M-row shard would be GBs)
                for c0 in range(0, len(qids), 256):
                    qc = q[c0:c0 + 256]
                    scores = np.zeros((len(qc), len(ids_idx)))
                    for j in range(mm):
                        table = qc[:, j * dsub:(j + 1) * dsub] @ bks[j].T
                        scores += table[:, codes[:, j]]
                    scores = np.round(scores, round_scale)
                    for i, qid in enumerate(qids[c0:c0 + 256]):
                        mask = ids_idx != qid
                        s, nb_ids = scores[i][mask], ids_idx[mask]
                        # O(n) partition to the k-th score, keep ALL
                        # boundary ties, then sort only the survivors —
                        # identical output to a full (sim desc, id)
                        # lexsort because every candidate tied at the
                        # threshold stays in the sorted pool
                        if len(s) > 2 * k:
                            thresh = np.partition(s, len(s) - k)[len(s) - k]
                            sel = np.flatnonzero(s >= thresh)
                            s, nb_ids = s[sel], nb_ids[sel]
                        order = np.lexsort((nb_ids, -s))[:k]
                        out["vec_id"].extend([qid] * len(order))
                        out["neighbor_id"].extend(nb_ids[order].tolist())
                        out["sim"].extend(s[order].tolist())
                        out["rank"].extend(range(1, len(order) + 1))
                yield pd.DataFrame(out)

        topk = spread_partitions(
            queries.select(id_col, vec_col)
        ).mapInPandas(
            _score, "vec_id long, neighbor_id long, sim double, rank long"
        )
        per_shard = topk if per_shard is None else per_shard.unionByName(topk)

    if num_shards > 1:
        # codes were only consumed by the per-shard collects above —
        # nothing in the returned plan reads them, so release eagerly
        # instead of leaning on the caller's cache lifetime
        codes_df.unpersist()

    if per_shard is None:
        return spark.createDataFrame(
            [], "vec_id long, neighbor_id long, sim double, rank long"
        )
    if num_shards == 1:
        return per_shard
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.col("neighbor_id")
    )
    return (
        per_shard.drop("rank")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def pq_topk_rerank(
    embeddings: DataFrame,
    k: int = 1,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    num_shards: int = 1,
    seed: int = 7,
    books=None,
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """PQ retrieve + exact re-rank — the production PQ shape.

    ADC over the compressed index retrieves a ``shortlist``-sized
    candidate set per query (cheap: code gathers), then ONLY those
    ``n x shortlist`` pairs fetch full-precision vectors (two equi
    joins — the shuffle carries candidate rows, never the index) and
    re-score exactly.  Quantization error decides which candidates are
    seen, not their final order — measured recall@10 ~1.0 at
    shortlist=50 on the synthetic table vs ~0.62 ADC-only.

    ``books``/``codes_df`` accept a stored codebook + encoded index so
    a caller with artifact state (q_ann_pq) skips train/encode.
    """
    from clv_data_pipeline_spark.operators.similarity import (
        _pair_cosine_scores,
    )

    if books is not None and codes_df is not None:
        cand = pq_topk_from_codes(
            codes_df, embeddings, books, k=shortlist,
            id_col=id_col, vec_col=vec_col, num_shards=num_shards,
        ).select("vec_id", "neighbor_id")
    else:
        cand = pq_topk(
            embeddings, k=shortlist, id_col=id_col, vec_col=vec_col,
            m=m, ksub=ksub, num_shards=num_shards, seed=seed,
        ).select("vec_id", "neighbor_id")
    a = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_va")
    )
    b = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vb")
    )
    scored = _pair_cosine_scores(
        cand.join(a, "vec_id").join(b, "neighbor_id"), "_va", "_vb"
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "sim", "rank")
    )


def pq_incremental(
    index_codes: DataFrame,
    delta: DataFrame,
    books: np.ndarray,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_shards: int = 1,
    round_scale: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """O(delta) maintenance of a PQ index: encode ONLY the delta
    against FROZEN codebooks, append to the stored codes, and answer
    the delta's top-k over the combined index — the daily shape for a
    1B-vector store where re-encoding (let alone re-training) the
    corpus per batch is not an option.

    Returns ``(delta_codes, topk)``: the codes to append to the stored
    index, and the delta queries' neighbors over base+delta.  Because
    :func:`encode_pq` is row-wise deterministic, the appended index is
    byte-identical to a full re-encode with the same books, and the
    retrieval equals :func:`pq_topk_from_codes` over the full set
    restricted to delta queries (pinned in tests/test_pq.py).

    Codebook drift is the one approximation this admits: frozen books
    quantize a shifting distribution progressively worse.  Production
    retrains on a sample when recall audits (q_ann_recall's shape) sag
    — retraining is bounded (PQ_SAMPLE rows); RE-ENCODING the corpus is
    the O(n) step this function exists to avoid paying per delta.
    """
    delta_codes = encode_pq(delta, books, id_col, vec_col)
    combined = index_codes.unionByName(delta_codes)
    topk = pq_topk_from_codes(
        combined, delta, books, k=k, id_col=id_col, vec_col=vec_col,
        num_shards=num_shards, round_scale=round_scale,
    )
    return delta_codes, topk


def build_ivf_pq_index(
    embeddings: DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, codes) — the stored IVF-PQ inverted file: one map-only
    Arrow pass does BOTH the coarse-cell assignment and the PQ encode,
    so building the index reads each vector exactly once and the stored
    row is ~``m`` small ints + a cell id (never the float vector)."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast((centroids, books))
    m, ksub, dsub = books.shape

    def _enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent, bks = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            x = _normalize(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            )
            cells = (x @ cent.T).argmax(axis=1)
            codes = np.empty((len(x), m), dtype=np.int64)
            for j in range(m):
                sub = x[:, j * dsub:(j + 1) * dsub]
                c = bks[j]
                d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (sub @ c.T)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cell": cells, "codes": list(codes)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        _enc, f"{id_col} long, cell long, codes array<bigint>"
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    k: int = 1,
    n_cells: int = 16,
    nprobe: int = 4,
    shortlist: int = 50,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    books=None,
    index_df: DataFrame | None = None,
    round_scale: int = 6,
    seed: int = 7,
) -> DataFrame:
    """IVF-PQ: coarse-quantizer cell pruning x PQ-compressed ADC scoring
    x exact shortlist re-rank — the composition production 1B-vector
    stores actually run (FAISS ``IVFxx,PQyy``), built from this repo's
    two proven kernels.

    Why the composition wins at 100 TB: plain IVF's probed cells still
    shuffle FULL vectors into each cell group; plain PQ still scores
    every code against every query.  Here the inverted file carries
    only (cell, codes) — members cross the wire at ~m bytes each, a
    32x smaller cell-group footprint — and each query ADC-scores only
    its ``nprobe`` cells, ~nprobe/n_cells of the corpus.  Cost per
    query: nprobe LUT matmuls (m x ksub each) + code gathers + an
    exact re-rank of ``shortlist`` candidate pairs (two equi joins —
    the only stage that touches full-precision member vectors).

    Same output contract as cosine_topk/lsh_topk/ivf_topk/pq_topk:
    (vec_id, neighbor_id, sim, rank), sim = exact cosine after
    re-rank.  ``centroids``/``books``/``index_df`` accept stored
    artifacts (q_ann_ivf_pq wires the keyed-artifact lifecycle).
    Recall floors vs the exact kernel are pinned in tests/test_pq.py.
    """
    from clv_data_pipeline_spark.operators.similarity import (
        _pair_cosine_scores,
        fit_ivf_centroids,
    )

    spark = embeddings.sparkSession
    C = (
        centroids
        if centroids is not None
        else fit_ivf_centroids(
            embeddings, k=n_cells, id_col=id_col, vec_col=vec_col
        )
    )
    bks = (
        books
        if books is not None
        else train_pq_codebooks(
            embeddings, vec_col, m=m, ksub=ksub, seed=seed
        )
    )
    if index_df is None:
        index_df = build_ivf_pq_index(embeddings, C, bks, id_col, vec_col)
    nprobe = min(nprobe, len(C))
    bc = spark.sparkContext.broadcast((C, bks))
    dsub = bks.shape[2]
    sl = shortlist
    vec_type = embeddings.schema[vec_col].dataType.simpleString()

    def _probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent, _ = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            xq = _normalize(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            )
            cells = np.argsort(-(xq @ cent.T), axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(nprobe),
                    "_v": pdf[vec_col].to_numpy().repeat(nprobe),
                    "cell": cells.ravel(),
                }
            )

    probes = embeddings.select(id_col, vec_col).mapInPandas(
        _probe, f"{id_col} long, _v {vec_type}, cell long"
    )
    members = index_df.select(
        F.col(id_col).alias("vec_id"),
        "cell",
        "codes",
        F.lit(None).cast(vec_type).alias("_v"),
        F.lit(False).alias("_q"),
    )
    queries = probes.select(
        F.col(id_col).alias("vec_id"),
        "cell",
        F.lit(None).cast("array<bigint>").alias("codes"),
        "_v",
        F.lit(True).alias("_q"),
    )
    both = members.unionByName(queries)

    def _cell_adc(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"vec_id": [], "neighbor_id": [], "sim": []}
        ).astype(
            {"vec_id": "int64", "neighbor_id": "int64", "sim": "float64"}
        )
        qd, md = pdf[pdf["_q"]], pdf[~pdf["_q"]]
        if qd.empty or md.empty:
            return empty
        _, books_v = bc.value
        mm = books_v.shape[0]
        mids = md["vec_id"].to_numpy(dtype=np.int64)
        codes = np.stack(md["codes"].to_numpy()).astype(np.int64)
        qids = qd["vec_id"].to_numpy(dtype=np.int64)
        Q = _normalize(np.stack(qd["_v"].to_numpy()).astype(np.float64))
        out_q: list[int] = []
        out_m: list[int] = []
        out_s: list[float] = []
        # chunked ADC: one (chunk x ksub) LUT matmul + one gather per
        # subspace — scores stay <=256 x cell-members (pq.py rationale)
        for c0 in range(0, len(qids), 256):
            qc = Q[c0:c0 + 256]
            scores = np.zeros((len(qc), len(mids)))
            for j in range(mm):
                table = qc[:, j * dsub:(j + 1) * dsub] @ books_v[j].T
                scores += table[:, codes[:, j]]
            scores = np.round(scores, round_scale)
            for i, qid in enumerate(qids[c0:c0 + 256]):
                mask = mids != qid
                s, nb = scores[i][mask], mids[mask]
                if len(s) > 2 * sl:
                    thresh = np.partition(s, len(s) - sl)[len(s) - sl]
                    sel = np.flatnonzero(s >= thresh)
                    s, nb = s[sel], nb[sel]
                order = np.lexsort((nb, -s))[:sl]
                out_q.extend([qid] * len(order))
                out_m.extend(nb[order].tolist())
                out_s.extend(s[order].tolist())
        return pd.DataFrame(
            {"vec_id": out_q, "neighbor_id": out_m, "sim": out_s}
        )

    adc = both.groupBy("cell").applyInPandas(
        _cell_adc, "vec_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.col("neighbor_id")
    )
    cand = (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= sl)
        .select("vec_id", "neighbor_id")
    )
    a = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_va")
    )
    b = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vb")
    )
    scored = _pair_cosine_scores(
        cand.join(a, "vec_id").join(b, "neighbor_id"), "_va", "_vb"
    )
    w2 = Window.partitionBy("vec_id").orderBy(
        F.desc("sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "sim", "rank")
    )
