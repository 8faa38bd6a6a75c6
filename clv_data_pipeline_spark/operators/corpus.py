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


def unigram_train(
    documents: DataFrame,
    vocab_size: int = 512,
    max_piece_len: int = 5,
    word_cap: int = 20_000,
    text_col: str = "text",
) -> dict[str, int]:
    """Train a unigram-LM tokenizer vocabulary — the SentencePiece
    family (Kudo 2018), the other production tokenizer beside BPE.
    Simplified but faithful shape: substring candidates are counted
    over the word-frequency dict (weighted by word frequency), the top
    ``vocab_size`` by count become pieces, single characters are always
    included (coverage guarantee), and piece log-probs derive from the
    counts.  The full EM refinement prunes this same seed vocabulary;
    the seed already exhibits the family's defining property —
    maximum-likelihood Viterbi segmentation under piece probabilities
    instead of greedy merge application.

    Scale shape mirrors bpe_train: the corpus contributes ONE
    word->frequency aggregation; substring candidate counting runs
    COLUMN-SIDE over that vocab-capped table (explode of l in
    2..max_piece_len and start offsets — |word| x L rows per DISTINCT
    word, never per corpus token), collapses in a partial-aggregating
    piece shuffle, and the final cut is a bounded sort-limit.  The
    returned dict is vocab_size+|alphabet| entries — broadcast-sized.
    """
    import math

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
        .limit(word_cap)
    )
    lens = F.explode(
        F.sequence(F.lit(1), F.least(F.length("word"), F.lit(max_piece_len)))
    )
    subs = (
        words.select("word", "freq", lens.alias("l"))
        .select(
            "word",
            "freq",
            "l",
            F.explode(
                F.sequence(F.lit(1), F.length("word") - F.col("l") + 1)
            ).alias("i"),
        )
        .select(
            F.expr("substring(word, i, l)").alias("piece"),
            "freq",
            F.col("l"),
        )
    )
    counts = subs.groupBy("piece", "l").agg(
        F.sum("freq").alias("count")
    )
    top = (
        counts.filter(F.col("l") > 1)
        .orderBy(F.desc("count"), "piece")
        .limit(vocab_size)
    )
    chars = counts.filter(F.col("l") == 1)
    rows = top.unionByName(chars).select("piece", "count").collect()
    total = sum(r["count"] for r in rows)
    # log-probs quantize to exact NANO-NAT INTEGERS (half away from
    # zero, matching ROUND(ln(c/total) * 1e9, 0) in SQL): Viterbi then
    # sums and compares exact integers, so segmentation is
    # deterministic AND engine-portable — the quantization that let
    # q_unigram_tokenize graduate to oracle-checked (round 9)
    out: dict[str, int] = {}
    for r in rows:
        v = math.log(r["count"] / total)
        out[r["piece"]] = int(math.copysign(math.floor(abs(v) * 1e9 + 0.5), v))
    return out


#: log-prob charged to a character absent from the vocabulary (cannot
#: happen after unigram_train's single-char coverage, but keeps the
#: segmenter total on unseen alphabets).
#: nano-nat penalty for a character absent from the vocabulary —
#: same 1e9 scale as unigram_train's quantized log-probs
_UNK_LOGP = -20 * 10**9


def viterbi_segment(
    word: str, logp: dict[str, int], max_piece_len: int = 5
) -> list[str]:
    """Maximum-likelihood segmentation of one word under piece
    log-probs — the unigram-LM decoder.  O(|word| x max_piece_len)
    dynamic program; deterministic (ties keep the longer final piece,
    checked last in ascending-l order with strict improvement)."""
    n = len(word)
    neg = float("-inf")
    dp = [0.0] + [neg] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        for l in range(1, min(max_piece_len, j) + 1):
            piece = word[j - l : j]
            lp = logp.get(piece, _UNK_LOGP if l == 1 else None)
            if lp is None:
                continue
            cand = dp[j - l] + lp
            if cand >= dp[j]:
                dp[j] = cand
                back[j] = l
    pieces: list[str] = []
    j = n
    while j > 0:
        l = back[j]
        pieces.append(word[j - l : j])
        j -= l
    pieces.reverse()
    return pieces


def unigram_tokenize_counts(
    documents: DataFrame,
    logp: dict[str, int],
    max_piece_len: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply the unigram tokenizer corpus-wide: Viterbi runs ONCE per
    DISTINCT word (the dictionary, vocabulary-sized) in an Arrow batch
    with the piece table broadcast, and the per-word piece counts join
    back to the corpus word stream by broadcast — the fact table never
    enters Python (the q_fuzzy_join dictionary discipline).  Returns
    (doc_id, n_words, n_pieces)."""
    import pandas as pd

    toks = documents.select(
        id_col,
        F.explode(
            F.split(normalize_text(F.col(text_col)), " ")
        ).alias("word"),
    ).filter(F.col("word") != "")
    dictionary = toks.select("word").distinct()
    bc = documents.sparkSession.sparkContext.broadcast(
        (logp, max_piece_len)
    )

    def _segment(batches):
        lp, mpl = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_pieces": [
                        len(viterbi_segment(w, lp, mpl))
                        for w in pdf["word"]
                    ],
                }
            )

    seg = dictionary.mapInPandas(_segment, "word string, n_pieces long")
    return (
        toks.join(F.broadcast(seg), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
        )
    )
