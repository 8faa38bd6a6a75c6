"""Corpus-preparation operators: vocabulary, chunking, sequence packing
(BASELINE.json north star — the steps between raw documents and a
training batch).

All three are pure DataFrame plans:

- **vocabulary**: explode tokens -> count -> top-k with deterministic
  tie-break.  The explode multiplies rows but the count's partial
  aggregation collapses them map-side, so the shuffle carries one row
  per (partition, token) — vocabulary-sized, not corpus-sized.
- **chunking**: fixed-width character windows with overlap via
  explode(sequence) + substring — the standard long-document split
  before tokenization.  Generator runs inside the scan stage.
- **packing**: greedy assignment of documents to fixed-budget bins in
  a deterministic order — a running-sum window per stream followed by
  integer division.  One shuffle on the stream key.  (True bin-packing
  is NP-hard; budget-quotient packing is the streaming-friendly
  standard and is what fixed-length training batches use.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clv_data_pipeline_spark.functions.text import normalize_text


def vocabulary(
    documents: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Token -> document frequency + total count; optionally top-k by
    (count desc, token asc) — the deterministic tie order."""
    tokens = documents.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = tokens.groupBy("token").agg(F.count("*").alias("n"))
    if top_k is None:
        return counts
    return counts.orderBy(F.desc("n"), "token").limit(top_k)


def chunk_documents(
    documents: DataFrame,
    chunk_chars: int = 120,
    overlap: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-width character chunks with
    ``overlap`` characters of context carry-over.  1 row in, ceil(n /
    stride) rows out, all inside the scan stage (no shuffle)."""
    stride = chunk_chars - overlap
    n_chunks = F.greatest(
        F.ceil(
            (F.length(F.col(text_col)) - F.lit(overlap))
            / F.lit(float(stride))
        ),
        F.lit(1),
    ).cast("int")
    return (
        documents.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
            F.col(text_col),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(
                f"substring({text_col}, chunk_idx * {stride} + 1, {chunk_chars})"
            ).alias("chunk"),
        )
        .filter(F.length("chunk") > 0)
    )


def pack_documents(
    documents: DataFrame,
    budget_tokens: int = 256,
    stream_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-budget bins per stream: deterministic
    order (doc id) within each stream, running token total, bin =
    (cumsum - tokens) / budget — the greedy quotient packing used for
    fixed-length training batches.  Oversized documents occupy their
    own bins rather than being dropped."""
    tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    w = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = documents.select(
        F.col(id_col),
        F.col(stream_col),
        tokens.alias("n_tokens"),
        F.sum(tokens).over(w).alias("_cum"),
    )
    return with_cum.select(
        id_col,
        stream_col,
        "n_tokens",
        F.floor(
            (F.col("_cum") - F.col("n_tokens")) / F.lit(budget_tokens)
        ).cast("long").alias("bin_id"),
    )


def bpe_train(
    documents: DataFrame,
    num_merges: int = 20,
    vocab_cap: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Train byte-pair-encoding merges on a corpus — the tokenizer-
    training step of an LLM data pipeline, in the shape that scales:
    the corpus contributes ONE aggregation (word -> frequency), and the
    merge loop runs on that vocab-sized table, never touching the
    corpus again.  This is the standard formulation (Sennrich et al.
    2016 train on word-frequency dicts); a 100 TB corpus still yields
    a ~1e5-row vocabulary, so the driver-side loop is a bounded
    barrier like the CLV MLE fit, not a scale risk — ``vocab_cap``
    (top-N words by frequency, deterministic tie-break) makes the
    bound explicit.

    Returns the learned merges as [(left, right, pair_count), ...] in
    merge order: greedy highest-count pair each round, ties broken
    lexicographically so training is deterministic."""
    words = (
        documents.select(
            F.explode(
                F.split(normalize_text(F.col(text_col)), " ")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(vocab_cap)
    )
    vocab = {r["word"]: r["freq"] for r in words.collect()}
    # classic BPE over the word-frequency dict: each word is a symbol
    # sequence (characters + end-of-word marker); repeatedly merge the
    # most frequent adjacent pair
    seqs = {w: tuple(w) + ("</w>",) for w in vocab}
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, freq in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + freq
        if not pair_counts:
            break
        # deterministic: highest count, ties to the lexicographically
        # smallest pair
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        count = top
        merges.append((best[0], best[1], count))
        merged = best[0] + best[1]
        for w in seqs:
            s = seqs[w]
            out = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def bpe_segment_counts(
    documents: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply learned BPE merges to the corpus and count the resulting
    tokens per document — train/apply symmetry with :func:`bpe_train`.
    The merge table broadcasts (it is tokenizer-sized, ~30k entries in
    practice) and segmentation is one map-only Arrow pass with a
    per-word memo, so the 100 TB corpus is tokenized at scan speed
    with zero shuffles.  Output: (doc_id, n_words, n_bpe_tokens)."""
    import pandas as pd

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    bc = documents.sparkSession.sparkContext.broadcast(ranks)

    def _seg(batches):
        import re

        mr = bc.value
        memo: dict[str, int] = {}

        def n_pieces(word: str) -> int:
            n = memo.get(word)
            if n is not None:
                return n
            s = tuple(word) + ("</w>",)
            while len(s) > 1:
                best, best_rank = None, None
                for i in range(len(s) - 1):
                    r = mr.get((s[i], s[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = (s[i], s[i + 1]), r
                if best is None:
                    break
                out, i = [], 0
                while i < len(s):
                    if i < len(s) - 1 and (s[i], s[i + 1]) == best:
                        out.append(s[i] + s[i + 1])
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = tuple(out)
            memo[word] = len(s)
            return len(s)

        for pdf in batches:
            if pdf.empty:
                continue
            n_words, n_bpe = [], []
            for text in pdf[text_col]:
                words = [
                    w
                    for w in re.sub(r"\s+", " ", (text or "").lower())
                    .strip()
                    .split(" ")
                    if w
                ]
                n_words.append(len(words))
                n_bpe.append(sum(n_pieces(w) for w in words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_words": pd.array(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.array(n_bpe, dtype="int64"),
                }
            )

    return documents.select(id_col, text_col).mapInPandas(
        _seg, "doc_id long, n_words long, n_bpe_tokens long"
    )
