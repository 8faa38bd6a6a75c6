"""Corpus operators: vocabulary, chunking, packing (operators/corpus.py)."""

from __future__ import annotations

from clv_data_pipeline_spark.operators.corpus import (
    chunk_documents,
    pack_documents,
    vocabulary,
)


def _docs(spark):
    rows = [
        (1, "a b c a b a", "s1"),
        (2, "x" * 250, "s1"),          # single long token, chunk fan-out
        (3, "one two three four five six seven eight", "s1"),
        (4, "short", "s2"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_vocabulary_counts_and_tiebreak(spark):
    v = {r["token"]: r["n"] for r in vocabulary(_docs(spark)).collect()}
    assert v["a"] == 3 and v["b"] == 2 and v["c"] == 1
    top = vocabulary(_docs(spark), top_k=3).collect()
    assert top[0]["token"] == "a"
    # ties (n=1) break alphabetically
    ns = [r["n"] for r in top]
    assert ns == sorted(ns, reverse=True)


def test_chunk_documents_reconstruct(spark):
    chunks = chunk_documents(
        _docs(spark), chunk_chars=100, overlap=20
    ).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk"]
    # doc 2: 250 chars, stride 80 -> ceil(230/80)=3 chunks
    assert len(by_doc[2]) == 3
    # stitched chunks (dropping the 20-char overlap) reconstruct the text
    stitched = by_doc[2][0]
    for i in range(1, len(by_doc[2])):
        stitched += by_doc[2][i][20:]
    assert stitched == "x" * 250
    # short docs produce exactly one chunk equal to the text
    assert by_doc[4] == {0: "short"}


def test_pack_documents_budget(spark):
    packed = pack_documents(
        _docs(spark), budget_tokens=8, stream_col="source"
    ).collect()
    by_id = {r["doc_id"]: r for r in packed}
    # s1 stream in doc_id order: 6 + 1 + 8 tokens with budget 8:
    # doc1 starts bin 0 (cum-n=0), doc2 bin 0 (cum-n=6), doc3 bin 0? cum
    # before doc3 = 7 -> floor(7/8)=0; deterministic quotient packing
    assert by_id[1]["bin_id"] == 0
    assert by_id[2]["bin_id"] == 0
    assert by_id[3]["bin_id"] == 0
    assert by_id[4]["bin_id"] == 0  # s2 stream starts fresh
    # larger corpus: bins never exceed budget by more than one document
    docs = spark.createDataFrame(
        [(i, "w " * (i % 5 + 1), "s") for i in range(1, 40)],
        ["doc_id", "text", "source"],
    )
    out = pack_documents(docs, budget_tokens=10).collect()
    from collections import defaultdict

    per_bin = defaultdict(int)
    for r in out:
        per_bin[r["bin_id"]] += r["n_tokens"]
    # every bin except possibly via a single spill-over doc stays bounded
    assert all(v <= 10 + 5 for v in per_bin.values())


def test_bpe_train_matches_reference_on_fixture(spark):
    """bpe_train's merges must equal an independently coded reference
    BPE (Sennrich-style, word-frequency dict, end-of-word marker) on
    the classic low/lower fixture."""
    from clv_data_pipeline_spark.operators.corpus import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower widest widest"),
         (3, "newest newest newest widest")],
        "doc_id long, text string",
    )

    # independent reference implementation (dict-based, no Spark)
    vocab = {"low": 5, "lower": 2, "widest": 3, "newest": 3}
    seqs = {w: tuple(w) + ("</w>",) for w in vocab}
    want = []
    for _ in range(6):
        pc = {}
        for w, f in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + f
        top = max(pc.values())
        best = min(p for p, c in pc.items() if c == top)
        want.append((best[0], best[1], top))
        m = best[0] + best[1]
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) == best:
                    out.append(m); i += 2
                else:
                    out.append(s[i]); i += 1
            seqs[w] = tuple(out)

    got = bpe_train(docs, num_merges=6)
    assert got == want
    # hand-check the first merge: ('l','o') rides low(5) + lower(2)
    assert got[0] == ("l", "o", 7)


def test_bpe_segment_counts_applies_merges(spark):
    """Segmentation with learned merges: fully-merged words collapse
    to one token; unseen words fall back to characters + marker."""
    from clv_data_pipeline_spark.operators.corpus import (
        bpe_segment_counts,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower widest widest"),
         (3, "newest newest newest widest")],
        "doc_id long, text string",
    )
    # enough merges to fully merge every vocab word
    merges = bpe_train(docs, num_merges=30)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_segment_counts(docs, merges).collect()
    }
    # every in-vocab word collapses to a single token
    assert got == {1: (5, 5), 2: (4, 4), 3: (4, 4)}

    # unseen word: no merge applies beyond learned pairs; 'zzz' has no
    # learned merges so it stays 3 chars + </w> = 4 pieces
    other = spark.createDataFrame([(9, "zzz low")], "doc_id long, text string")
    got9 = bpe_segment_counts(other, merges).collect()[0]
    assert got9["n_words"] == 2
    assert got9["n_bpe_tokens"] == 4 + 1


def test_cdc_chunks_tile_documents_exactly(spark):
    """Content-defined chunks must partition each normalized document:
    per-doc chunk lengths sum to the document length, starts are the
    cumulative lengths, and re-running produces identical boundaries
    (determinism of the md5 window hash)."""
    from pyspark.sql import functions as F

    from clv_data_pipeline_spark import registry
    from clv_data_pipeline_spark.functions.text import normalize_text
    from clv_data_pipeline_spark.sources.io import load_table
    from tests.conftest import SF_SMOKE

    df = registry.all_queries()["q_cdc_chunks"](spark, SF_SMOKE)
    lens = df.groupBy("doc_id").agg(F.sum("chunk_len").alias("s"))
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.length(normalize_text(F.col("text"))).alias("L")
    ).filter(F.col("L") >= 8)
    assert lens.join(docs, "doc_id").filter("s <> L").count() == 0
    rows1 = sorted(map(str, df.collect()))
    rows2 = sorted(
        map(str, registry.all_queries()["q_cdc_chunks"](
            spark, SF_SMOKE
        ).collect())
    )
    assert rows1 == rows2


def test_viterbi_segmentation_is_maximum_likelihood():
    """The DP must reach the same best total log-prob as exhaustive
    enumeration of every segmentation (tie-break-free check)."""
    import itertools
    import math

    from clv_data_pipeline_spark.operators.corpus import viterbi_segment

    logp = {
        "a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.25),
        "ba": math.log(0.05), "abb": math.log(0.1), "bb": math.log(0.1),
    }

    def brute_best(word):
        best = float("-inf")
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            pieces = [word[bounds[k]:bounds[k + 1]]
                      for k in range(len(bounds) - 1)]
            if any(p not in logp for p in pieces):
                continue
            best = max(best, sum(logp[p] for p in pieces))
        return best

    for word in ["ab", "abb", "abab", "babba", "aabbab"]:
        got = viterbi_segment(word, logp, max_piece_len=3)
        assert "".join(got) == word
        assert math.isclose(
            sum(logp[p] for p in got), brute_best(word), rel_tol=1e-12
        ), word


def test_unigram_tokenize_counts_dictionary_discipline(spark):
    """End-to-end on a tiny corpus: coverage (pieces tile each word) is
    implied by n_pieces <= n_chars; per-doc counts must be exact and
    partition-independent."""
    from clv_data_pipeline_spark.operators.corpus import (
        unigram_tokenize_counts,
        unigram_train,
    )

    rows = [
        (1, "banana band ban"),
        (2, "banana banana"),
        (3, "ban nab and band"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    logp = unigram_train(docs, vocab_size=16, max_piece_len=4)
    assert all(len(p) == 1 for p in logp if len(p) == 1)  # chars covered
    got = {
        r["doc_id"]: r
        for r in unigram_tokenize_counts(docs, logp).collect()
    }
    assert got[1]["n_words"] == 3 and got[2]["n_words"] == 2
    # repartitioned input must give identical counts
    got13 = {
        r["doc_id"]: r
        for r in unigram_tokenize_counts(docs.repartition(7), logp).collect()
    }
    assert {k: (v["n_words"], v["n_pieces"]) for k, v in got.items()} == {
        k: (v["n_words"], v["n_pieces"]) for k, v in got13.items()
    }
    # frequent substrings become multi-char pieces, so segmentation
    # compresses below character count
    assert got[2]["n_pieces"] < len("banana banana".replace(" ", ""))
