"""Round-11 property pins: the Pareto/NBD lattice MLE, the
exact-integer incremental PCA, the additive data-Shapley rewrite, the
sweep-wired LSH banding, and the two additions (learned-sparse
retrieval, packing tradeoff eval).  These pin the SEMANTIC claims the
oracles cannot state (monotonicity, reorder evidence, additivity,
artifact lifecycle) — the DuckDB hash gate lives in
test_queries_oracle.py like every other query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _rows(spark, name):
    from clv_data_pipeline_spark import registry

    return registry.all_queries()[name](spark, SF).collect()


def test_pareto_lattice_beats_neighbours_on_penalized_ll(spark):
    """The winning lattice cell must truly be the penalized-LL argmax:
    re-scoring every cell with the independent float LL
    (operators/clv._pnbd_ll, scipy-free own-series kernel) must rank
    the chosen cell first — the lattice argmax is an MLE restricted to
    the grid, not an arbitrary pick."""
    import numpy as np

    from clv_data_pipeline_spark.operators.clv import _pnbd_ll
    from clv_data_pipeline_spark.queries.clvq import (
        _PNBD_GRID,
        _features,
    )

    rows = _rows(spark, "q_pareto_nbd")
    cand = int(rows[0]["cand"])
    feats = (
        _features(spark, SF)
        .select(
            F.col("frequency").cast("double").alias("x"),
            F.col("recency").cast("double").alias("t_x"),
            F.col("T").cast("double").alias("tt"),
        )
        .toPandas()
    )
    x = feats["x"].to_numpy()
    t_x = feats["t_x"].to_numpy()
    T = feats["tt"].to_numpy()

    def pen_ll(r, al, sh, be) -> float:
        pen = 0.1 * (r * r + al * al + sh * sh + be * be)
        return float(np.sum(_pnbd_ll(r, al, sh, be, x, t_x, T))) - len(
            x
        ) * pen

    scores = {i: pen_ll(r, al, sh, be) for i, r, al, sh, be in _PNBD_GRID}
    best = max(scores, key=lambda i: (scores[i], -i))
    assert best == cand, (
        f"lattice argmax {cand} but float penalized LL prefers {best}"
    )


def test_pareto_scores_match_float_kernel(spark):
    """The integer-replay scoring must agree with the independent
    float kernel (pnbd_prob_alive_np / pnbd_expected_purchases_np,
    which use different op order and np.logaddexp) to float noise —
    same model, two derivations."""
    import numpy as np

    from clv_data_pipeline_spark.operators.clv import (
        ParetoNBDParams,
        pnbd_expected_purchases_np,
        pnbd_prob_alive_np,
    )
    from clv_data_pipeline_spark.queries.clvq import _features

    rows = _rows(spark, "q_pareto_nbd")
    p = ParetoNBDParams(
        rows[0]["fit_r"],
        rows[0]["fit_alpha"],
        rows[0]["fit_s"],
        rows[0]["fit_beta"],
    )
    feats = {
        r["customer_id"]: r
        for r in _features(spark, SF)
        .select(
            "customer_id",
            F.col("frequency").cast("double").alias("x"),
            F.col("recency").cast("double").alias("t_x"),
            F.col("T").cast("double").alias("tt"),
        )
        .collect()
    }
    for r in rows:
        f = feats[r["customer_id"]]
        x = np.array([f["x"]])
        t_x = np.array([f["t_x"]])
        T = np.array([f["tt"]])
        pa = float(pnbd_prob_alive_np(p, x, t_x, T)[0])
        ey = float(pnbd_expected_purchases_np(p, 30.0, x, t_x, T)[0])
        assert abs(pa - r["p_alive"]) < 1e-6, r
        assert abs(ey - r["pred_30d"]) < 1e-6, r


def test_pca_incremental_merge_is_exact_and_drift_is_real(spark):
    """Integer sufficient stats are exactly additive, so the refreshed
    basis must BE the q_pca_project basis (shared artifact) — and the
    stale-vs-refreshed drift must be a real signal (some component
    moved at sf0.01's 10% delta)."""
    rows = {r["component"]: r for r in _rows(spark, "q_pca_incremental")}
    assert set(rows) == {1, 2, 3, 4}
    assert all(r["n_delta"] > 0 for r in rows.values())
    assert any(r["drift_l1"] > 0 for r in rows.values()), (
        "10% delta moved no component — drift readout is vacuous"
    )
    # align_q is a quantized <v_new, v_old> dot: |align| <= (4096^2)*64
    bound = 4096 * 4096 * 64
    assert all(abs(r["align_q"]) <= bound for r in rows.values())


def test_data_shapley_additive_matches_independent_recount(spark):
    """The driver-side coalition addition must reproduce what a direct
    per-coalition Spark aggregation computes — the additivity claim
    itself, checked for the full coalition (012) vocabulary size and
    class totals."""
    from clv_data_pipeline_spark.queries.mlprep import normalize_text
    from clv_data_pipeline_spark.sources.io import load_table

    docs = load_table(spark, SF, "documents").select(
        "lang",
        F.split(normalize_text(F.col("text")), " ").alias("toks"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias(
            "pref"
        ),
        (F.ascii(F.substring(F.md5(F.col("source")), 1, 1)) % 3).alias(
            "grp"
        ),
    )
    full = (
        docs.filter(F.col("pref") < "cc")
        .select("lang", F.explode("toks").alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    gcc = (
        docs.filter(F.col("pref") < "cc")
        .select("lang", "grp", F.explode("toks").alias("tok"))
        .groupBy("grp", "lang", "tok")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    added: dict[tuple[str, str], int] = {}
    for r in gcc:
        k = (r["lang"], r["tok"])
        added[k] = added.get(k, 0) + int(r["c"])
    direct = {
        (r["lang"], r["tok"]): int(r["c"]) for r in full.collect()
    }
    assert added == direct


def test_lsh_banding_artifact_flows_from_sweep(spark):
    """lsh_chosen_banding must return exactly the sweep's chosen row
    and multiply back to the production 64-hash budget."""
    from clv_data_pipeline_spark.queries.textops import (
        _LSH_SWEEP_N,
        lsh_chosen_banding,
    )

    chosen = [r for r in _rows(spark, "q_lsh_param_sweep") if r["chosen"]]
    assert len(chosen) == 1
    b, r = lsh_chosen_banding(spark, SF)
    assert (b, r) == (chosen[0]["b"], chosen[0]["r"])
    assert b * r == _LSH_SWEEP_N


def test_splade_expansion_reorders_and_scores_decompose(spark):
    """Expansion must contribute real score mass (score_exp > 0
    somewhere), never exceed the total, and visibly reorder the
    direct-only ranking for at least one shortlisted doc — otherwise
    the learned-sparse leg is BM25 with extra steps."""
    rows = _rows(spark, "q_splade_retrieval")
    assert rows, "no retrieval results"
    assert all(0 <= r["score_exp"] <= r["score_q"] for r in rows)
    assert any(r["score_exp"] > 0 for r in rows)
    assert any(r["rnk"] != r["rnk_direct"] for r in rows), (
        "expansion never reordered the direct ranking"
    )
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    for q, rnks in per_q.items():
        assert sorted(rnks) == [1, 2, 3, 4, 5], (q, rnks)


def test_dedup_minhash_bucket_min_equals_pair_formulation(spark):
    """The pair-free bucket-min greedy dedup must keep EXACTLY the
    docs the former pair-enumeration + anti-join formulation kept —
    the rewrite is a complexity-class change (sf10 measured the pair
    path super-linear on dense near-dup clusters), not a semantics
    change."""
    from clv_data_pipeline_spark.operators.dedup import (
        dedup_minhash,
        minhash_candidates,
    )
    from clv_data_pipeline_spark.sources.io import load_table

    df = load_table(spark, SF, "documents")
    new = {
        r["doc_id"]
        for r in dedup_minhash(df).select("doc_id").collect()
    }
    losers = {
        r["id_b"]
        for r in minhash_candidates(df).select("id_b").distinct().collect()
    }
    all_ids = {r["doc_id"] for r in df.select("doc_id").collect()}
    assert new == all_ids - losers
    assert 0 < len(new) < len(all_ids)


def test_dedup_minhash_stays_fast_on_dense_near_dup_clusters(spark):
    """The regime the sf10 octave exposed: a corpus that is k families
    of ~1000 near-identical docs makes per-bucket candidate PAIRS
    quadratic (~k * 10^6), while the bucket-min path stays O(n x
    bands).  10k docs in 10 dense families must dedup to exactly the
    10 family minima in seconds, not minutes."""
    import time

    from pyspark.sql import functions as F

    from clv_data_pipeline_spark.operators.dedup import dedup_minhash

    # family-specific vocabulary everywhere — md5-derived words so
    # even the CHARACTER 5-gram shingles are family-disjoint
    # (cross-family Jaccard ~ 0) — plus a per-copy suffix
    # (within-family Jaccard ~ 1)
    fam = (F.col("id") % 10).cast("string")
    body = F.concat_ws(
        " ",
        *[
            F.substring(
                F.md5(F.concat(F.lit(f"w{i}|"), fam)), 1, 12
            )
            for i in range(30)
        ],
    )
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            body, F.lit(" copy"), F.col("id").cast("string")
        ).alias("text"),
    )
    t0 = time.perf_counter()
    kept = dedup_minhash(docs).select("doc_id").collect()
    elapsed = time.perf_counter() - t0
    kept_ids = sorted(r["doc_id"] for r in kept)
    # greedy min-id: each family's smallest id survives; near-identical
    # texts within a family must collide in at least one band
    assert kept_ids[:10] == list(range(10)), kept_ids[:20]
    assert len(kept_ids) < 200, len(kept_ids)
    assert elapsed < 120, f"dense-cluster dedup took {elapsed:.0f}s"


def test_pack_eval_tradeoff_is_monotone(spark):
    """The tradeoff must have its defining shape: contamination
    (split_docs) non-increasing in the budget, padding (pad_tokens)
    non-decreasing, one chosen argmin row, and token conservation
    (n_seqs * L >= total_tokens)."""
    rows = sorted(_rows(spark, "q_pack_eval"), key=lambda r: r["budget"])
    assert len(rows) == 5
    splits = [r["split_docs"] for r in rows]
    pads = [r["pad_tokens"] for r in rows]
    assert splits == sorted(splits, reverse=True), splits
    assert pads == sorted(pads), pads
    assert sum(1 for r in rows if r["chosen"]) == 1
    for r in rows:
        assert r["n_seqs"] * r["budget"] == r["total_tokens"] + r[
            "pad_tokens"
        ], r
