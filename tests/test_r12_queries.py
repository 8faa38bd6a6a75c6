"""Round-12 property pins.

The headline pin: the additive-NB vocabulary cap (VERDICT r11 item 1).
The (grain x class x token) sufficient-statistic aggregate behind
q_data_shapley / q_cross_validation / q_learning_curve is collected
driver-side; on a Heaps-law web corpus the distinct-token count reaches
1e8-1e9 and the pull becomes the bottleneck.  The fix caps the model
vocabulary at the top-``_NB_VOCAB_CAP`` training tokens (frequency
DESC, token ASC — a total order both engines share) and folds the tail
into one ``<unk>`` pseudo-token BEFORE the aggregate.  Two regimes,
both pinned here:

* cap does NOT fire (testdata: 31 distinct tokens << 4096): the remap
  is skipped entirely — ``_nb_capped_vocab`` returns None and the plan
  and hashes are IDENTICAL to the pre-cap path (the production oracle
  gate in test_queries_oracle.py covers this regime).
* cap FIRES (patched tiny cap here): Spark and a same-cap DuckDB
  oracle still agree cell-for-cell — the UNK folding is mirrored, not
  approximated.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from tests.oracle import compare_frames, run_oracle

SF = "/root/testdata/sf0.01"
TINY_CAP = 6  # < the 31-token testdata vocabulary, so the cap fires


def _mlprep():
    from clv_data_pipeline_spark.queries import mlprep

    return mlprep


def test_nb_vocab_cap_noop_when_vocab_fits(spark):
    """At every test SF the corpus vocabulary (31 distinct tokens) is
    far under the 4096 production cap: the helper must return None and
    the remap must be the identity (zero plan change)."""
    m = _mlprep()
    toks = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    )
    assert m._nb_capped_vocab(spark, toks) is None
    out = m._nb_remap_tok(toks, None)
    assert out is toks  # identity, not merely equal


def test_nb_vocab_cap_bounds_distinct_tokens(spark, monkeypatch):
    """When the cap fires the remapped stream has exactly cap kept
    tokens + <unk>, the kept set is the (count DESC, tok ASC) top-K,
    and total token count is conserved (folding moves mass, never
    drops it)."""
    m = _mlprep()
    monkeypatch.setattr(m, "_NB_VOCAB_CAP", TINY_CAP)
    toks = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .persist()
    )
    n_before = toks.count()
    vocab = m._nb_capped_vocab(spark, toks)
    assert vocab is not None
    kept = {r["tok"] for r in vocab.collect()}
    assert len(kept) == TINY_CAP
    # kept set == independent top-K by the shared total order
    top = [
        r["tok"]
        for r in toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(TINY_CAP)
        .collect()
    ]
    assert kept == set(top)
    out = m._nb_remap_tok(toks, vocab).persist()
    assert out.count() == n_before
    distinct = {r["tok"] for r in out.select("tok").distinct().collect()}
    assert distinct == kept | {m._NB_UNK}
    toks.unpersist()
    out.unpersist()


@pytest.mark.parametrize(
    "qname, builder",
    [
        ("q_cross_validation", "_cv_oracle"),
        ("q_learning_curve", "_learning_curve_oracle"),
        ("q_data_shapley", "_shapley_oracle"),
    ],
)
def test_nb_cap_fires_parity(spark, monkeypatch, qname, builder):
    """Cap-fires regime: with a tiny cap patched into BOTH engines
    (Spark helpers read it at call time; the oracle SQL is rebuilt so
    its LIMIT literal matches), the full query output still matches
    the DuckDB oracle cell-for-cell — the UNK folding, the smoothing
    denominators (vocab size now counts <unk>), and the prediction
    argmax all survive the cap identically."""
    m = _mlprep()
    monkeypatch.setattr(m, "_NB_VOCAB_CAP", TINY_CAP)
    sql = getattr(m, builder)()
    fn = getattr(m, qname)
    spark_pdf = fn(spark, SF_SMOKE).toPandas()
    oracle_pdf = run_oracle(sql, SF_SMOKE)
    compare_frames(spark_pdf, oracle_pdf)
