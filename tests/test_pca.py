"""Distributed PCA (operators/pca.py) vs an in-driver numpy PCA on the
same rows: the sufficient-stats pass must reproduce exact full-data
results, the sign convention must make projections deterministic, and
the plan must stay Arrow-batched (no row-at-a-time Python)."""

from __future__ import annotations

import numpy as np

from clv_data_pipeline_spark.operators.pca import (
    fit_pca,
    pca_explained_variance,
    pca_project,
)
from clv_data_pipeline_spark.sources.io import load_table
from tests.conftest import SF_SMOKE


def _numpy_pca(x: np.ndarray, k: int):
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    w = evecs[:, order]
    flip = np.sign(w[np.abs(w).argmax(axis=0), np.arange(w.shape[1])])
    flip[flip == 0] = 1.0
    return mu, w * flip, evals[order]


def _collect_matrix(df, id_col="vec_id", vec_col="embedding"):
    rows = df.select(id_col, vec_col).collect()
    rows.sort(key=lambda r: r[id_col])
    ids = [r[id_col] for r in rows]
    return ids, np.array([list(r[vec_col]) for r in rows], dtype=np.float64)


def test_fit_matches_numpy_full_data(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    _, x = _collect_matrix(emb)
    mu_s, w_s, ev_s = fit_pca(emb, n_components=4)
    mu_n, w_n, ev_n = _numpy_pca(x, 4)
    assert np.allclose(mu_s, mu_n, atol=1e-9)
    assert np.allclose(ev_s, ev_n, atol=1e-7)
    assert np.allclose(np.abs(w_s.T @ w_n), np.eye(4), atol=1e-6)
    assert np.allclose(w_s, w_n, atol=1e-6)  # sign convention agrees


def test_projection_matches_numpy_and_is_partition_invariant(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    ids, x = _collect_matrix(emb)
    mu_n, w_n, _ = _numpy_pca(x, 4)
    expected = np.round((x - mu_n) @ w_n, 6)

    got = {r["vec_id"]: list(r["pc"]) for r in pca_project(emb).collect()}
    p = np.array([got[i] for i in ids])
    assert np.allclose(p, expected, atol=1e-5)

    got17 = {
        r["vec_id"]: list(r["pc"])
        for r in pca_project(emb.repartition(17)).collect()
    }
    p17 = np.array([got17[i] for i in ids])
    assert np.allclose(p17, p, atol=1e-5)


def test_variance_table_is_descending_and_trace_based(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = pca_explained_variance(emb).collect()
    evs = [r["explained_var"] for r in rows]
    assert evs == sorted(evs, reverse=True)
    assert all(v > 0 for v in evs)
    # pct is measured against the FULL covariance trace, so 4 of 64
    # near-isotropic components explain well under 100%
    _, x = _collect_matrix(emb)
    trace = float(np.trace(np.cov(x, rowvar=False)))
    for r in rows:
        expect = r["explained_var"] / trace * 100.0
        assert abs(r["explained_pct"] - expect) < 1e-3
    assert sum(r["explained_pct"] for r in rows) < 99.0


def test_variance_of_constant_embeddings_is_zero_not_crash(spark):
    emb = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    rows = pca_explained_variance(emb, n_components=2).collect()
    assert [r["explained_pct"] for r in rows] == [0.0, 0.0]


def test_portable_twin_aligns_with_numpy_pc1(spark):
    """q_pca_portable's fixed-step integer iterate is NOT run to float
    convergence (that's the point — bit-equality across engines instead
    of tolerance), but it must still land near the true top principal
    direction or the twin verifies a vacuous mechanism.  Floor: the
    per-vector integer projections correlate >= 0.9 in absolute value
    with the numpy PC1 scores (measured ~0.97 at 32 iterations), and
    are genuinely non-constant."""
    from clv_data_pipeline_spark.registry import all_queries

    emb = load_table(spark, SF_SMOKE, "embeddings")
    ids, x = _collect_matrix(emb)
    mu_n, w_n, _ = _numpy_pca(x, 1)
    pc1 = (x - mu_n) @ w_n[:, 0]

    rows = all_queries()["q_pca_portable"](spark, SF_SMOKE).collect()
    got = {r["vec_id"]: r["proj"] for r in rows}
    proj = np.array([got[i] for i in ids], dtype=np.float64)
    assert rows[0]["lam_den"] > 0
    assert proj.std() > 0
    corr = abs(float(np.corrcoef(proj, pc1)[0, 1]))
    assert corr >= 0.9, corr


def test_pca_project_basis_aligns_with_numpy(spark):
    """GRADUATED q_pca_project (round 10): the 4-component deflating
    integer fit must land near the true leading eigenbasis or the
    oracle verifies a vacuous mechanism.  The synthetic embeddings
    have a nearly FLAT spectrum (top-8 eigenvalue shares 0.14..0.11
    at sf0.001), so per-component identity is only well-posed for the
    leading components; deeper ones live in a near-degenerate shell
    where any rotation is equally principal.  Floors measured on that
    geometry: |correlation| with the matching numpy PC >= 0.95/0.8/
    0.75 for PC1-3; PC4 must lie in the numpy top-8 subspace with
    R^2 >= 0.85 AND be essentially PC1-free (|corr| <= 0.2); every
    component non-constant; integer directions near-orthogonal
    (|cos| <= 0.25) — an exact-deflation mechanism property."""
    from itertools import combinations

    from clv_data_pipeline_spark.registry import all_queries

    emb = load_table(spark, SF_SMOKE, "embeddings")
    ids, x = _collect_matrix(emb)
    mu_n, w_n, _ = _numpy_pca(x, 8)
    ref = (x - mu_n) @ w_n[:, :8]

    rows = all_queries()["q_pca_project"](spark, SF_SMOKE).collect()
    got = {r["vec_id"]: [r[f"pc{c + 1}"] for c in range(4)] for r in rows}
    proj = np.array([got[i] for i in ids], dtype=np.float64)
    for c, floor in enumerate([0.95, 0.8, 0.75]):
        assert proj[:, c].std() > 0, c
        corr = abs(float(np.corrcoef(proj[:, c], ref[:, c])[0, 1]))
        assert corr >= floor, (c, corr)
    # PC4: inside the top-8 shell, orthogonal to PC1
    p4 = proj[:, 3]
    assert p4.std() > 0
    coef, res, *_ = np.linalg.lstsq(ref, p4 - p4.mean(), rcond=None)
    sse = (
        float(res[0])
        if len(res)
        else float((((p4 - p4.mean()) - ref @ coef) ** 2).sum())
    )
    r2 = 1.0 - sse / float(((p4 - p4.mean()) ** 2).sum())
    assert r2 >= 0.85, r2
    assert abs(float(np.corrcoef(p4, ref[:, 0])[0, 1])) <= 0.2
    # the integer directions themselves: near-orthogonal after the
    # three deflations
    u = proj / np.linalg.norm(proj, axis=0)
    for a, b in combinations(range(4), 2):
        assert abs(float(u[:, a] @ u[:, b])) <= 0.25, (a, b)
