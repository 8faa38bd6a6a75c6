"""PageRank operator vs a dense numpy power-iteration reference,
including dangling-node mass redistribution and edge weights."""

from __future__ import annotations

import numpy as np
import pytest


def _np_pagerank(n, edges, damping=0.85, iters=10):
    """Dense reference: edges = [(src, dst, w)], nodes 0..n-1."""
    P = np.zeros((n, n))
    for s, d, w in edges:
        P[s, d] += w
    out = P.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s in range(n):
            if out[s] > 0:
                contrib += r[s] * P[s] / out[s]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return r


@pytest.mark.parametrize(
    "edges",
    [
        [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)],              # cycle
        [(0, 1, 1.0), (0, 2, 3.0), (1, 2, 1.0)],              # weighted, 2 dangling-free
        [(0, 1, 1.0), (1, 2, 1.0)],                           # node 2 dangles
        [(0, 1, 2.0), (1, 0, 1.0), (2, 0, 5.0), (3, 3, 1.0)], # self-loop + source
    ],
)
def test_pagerank_matches_dense_reference(spark, edges):
    from clv_data_pipeline_spark.operators.graph import pagerank

    n = max(max(s, d) for s, d, _ in edges) + 1
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["node"]: r["rank"] for r in pagerank(df, weight="w").collect()
    }
    # nodes that appear in no edge at all are absent from the operator's
    # node set; restrict the reference to participating nodes
    participating = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    ref = _np_pagerank(n, edges)
    # renormalize reference over participating nodes (operator's universe)
    if len(participating) != n:
        ref_p = _np_pagerank(
            len(participating),
            [
                (participating.index(s), participating.index(d), w)
                for s, d, w in edges
            ],
        )
        ref = {node: ref_p[i] for i, node in enumerate(participating)}
    else:
        ref = {i: ref[i] for i in range(n)}
    assert set(got) == set(ref)
    for node in ref:
        assert got[node] == pytest.approx(ref[node], abs=1e-12), node
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
