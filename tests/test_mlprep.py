"""ML-prep query behavior beyond the DuckDB oracle: the ANN label
spreading variant must agree with the exact kernel — the recall
contract that justifies swapping IVF in at 100 TB."""

from __future__ import annotations

from clv_data_pipeline_spark import registry
from tests.conftest import SF_SMOKE


def test_knn_label_ann_agrees_with_exact(spark):
    """q_knn_label_ann (IVF retrieval, nprobe=24/32 cells) must predict
    the same label as the exact q_knn_label for >=90% of vectors at
    sf0.001.  This is the verified form of the exact query's "swap the
    kernel at scale" promise: the vote logic is shared, so any
    disagreement is purely ANN recall (measured 0.95 on these
    near-uniform synthetic embeddings — the IVF worst case)."""
    qs = registry.all_queries()
    exact = {
        r["vec_id"]: r["pred_label"]
        for r in qs["q_knn_label"](spark, SF_SMOKE).collect()
    }
    ann = {
        r["vec_id"]: r["pred_label"]
        for r in qs["q_knn_label_ann"](spark, SF_SMOKE).collect()
    }
    # every vector gets a prediction from both kernels
    assert set(ann) == set(exact)
    agree = sum(ann[v] == exact[v] for v in exact)
    assert agree / len(exact) >= 0.9, (
        f"ANN label agreement {agree}/{len(exact)}"
    )


def test_knn_label_ignores_null_neighbor_labels(spark):
    """Null-labeled vectors must never appear as a predicted label:
    voting filters them (engines disagree on NULL ordering, and an
    unlabeled neighbor carries no signal)."""
    qs = registry.all_queries()
    for name in ("q_knn_label", "q_knn_label_ann"):
        rows = qs[name](spark, SF_SMOKE).collect()
        assert rows, name
        assert all(r["pred_label"] is not None for r in rows), name
