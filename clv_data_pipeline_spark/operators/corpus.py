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
