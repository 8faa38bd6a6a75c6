"""Bloom-filter join pruning: cut the big side of a selective join
BEFORE its shuffle, entirely JVM-side.

The 100 TB problem this solves: a semi-join of a 100 TB fact table
against a selective dimension subset shuffles the WHOLE fact table on
the join key before the join can drop anything.  Spark's own runtime
row-level filtering does this opportunistically; this operator makes
the pattern explicit and tunable:

1. **Build** (one job over the SMALL side): k = ``BLOOM_K`` bit
   positions per key via ``xxhash64(key, seed) mod m``, OR-folded into
   64-bit words by a ``groupBy(word_idx).agg(bit_or(bit))`` — a
   map-side-combinable aggregate whose output is at most ``m/64`` rows
   (2048 rows = 16 KiB at the default m = 2^17 bits) regardless of how
   many keys went in.  The driver collect is bounded by that word
   count, never by the key count — the same bounded-barrier contract as
   the CLV sufficient-stats fit (operators/clv.py).
2. **Prune** (map-only over the BIG side): the word array rides a
   1-row broadcast (the repo's standard scalar-attach pattern, see
   tests/test_plan_lint.py) and each row tests its k bit positions with
   ``element_at`` + ``&`` — pure Column expressions inside whole-stage
   codegen, zero Python in the hot path.
3. **Verify** (exact semi-join on the survivors): Bloom filters have
   false positives, so the pruned frame still semi-joins against the
   real key set.  The final result is therefore EXACTLY the plain
   semi-join — hash-verifiable against a SQL oracle — while the shuffle
   that feeds the exact join sees only the ~selectivity fraction of the
   big side plus a vanishing FP tail (~(kn/m)^k; at the defaults with
   n = 10^5 keys that is < 2e-3).

The reference engine gets this implicitly from BigQuery's runtime
pruning; a user switching to this repo keeps the capability as an
explicit, composable operator (SURVEY.md §2 substrate surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bloom bitmap size in bits (2^17 = 16 KiB — broadcast-trivial) and
#: hash-function count.  FP rate ~ (k*n/m)^k; resize m for larger key
#: sets (the build cost is unchanged: the collect is m/64 rows max).
BLOOM_M_BITS = 1 << 17
BLOOM_K = 3


def _one_shifted_by(bits: Column) -> Column:
    """``1L << bits`` with a COLUMN shift count — the Python
    ``F.shiftleft`` wrapper only takes a literal count, so go through
    the SQL function registry (same JVM expression, codegen-friendly)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), bits.cast("int")
    )


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for one key — xxhash64 with the seed folded in
    as an extra hashed column, so all hashing stays JVM-side."""
    return [
        F.pmod(F.xxhash64(key, F.lit(s)), F.lit(m_bits)) for s in range(k)
    ]


def build_bloom_words(
    df: DataFrame,
    key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> list[int]:
    """One job over ``df``: the Bloom bitmap as ``m_bits/64`` longs.

    The aggregate is ``bit_or`` keyed by word index — partial-agg
    (map-side combine) applies, and the collect is bounded by the word
    count (2048 at the default m), NOT the number of keys.
    """
    n_words = m_bits // 64
    pos = df.select(
        F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    )
    rows = (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("w"),
            _one_shifted_by(F.col("pos").bitwiseAND(F.lit(63))).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_might_contain(
    key: Column,
    words: Column,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> Column:
    """Membership predicate: every one of the k bit positions is set.

    ``words`` is the ``array<bigint>`` bitmap column (normally attached
    via a 1-row broadcast).  Pure Column arithmetic — element_at, shift,
    AND — stays inside whole-stage codegen.
    """
    cond = F.lit(True)
    for pos in _positions(key, m_bits, k):
        word = F.element_at(words, (F.shiftright(pos, 6) + 1).cast("int"))
        bit = _one_shifted_by(pos.bitwiseAND(F.lit(63)))
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_semi_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Semi-join ``big`` to ``small`` with a Bloom pre-filter.

    Result is EXACTLY ``big.join(small, key, "left_semi")`` — the Bloom
    stage only decides how much of ``big`` reaches the exact join's
    shuffle.  The small side is read twice (bitmap build + exact join);
    by contract it is the *small* side, and on a real cluster the
    second read broadcasts or shuffles only the key column.
    """
    spark = big.sparkSession
    words = build_bloom_words(small, small_key, m_bits, k)
    wdf = spark.createDataFrame([(words,)], "bloom_words: array<bigint>")
    pruned = (
        big.crossJoin(F.broadcast(wdf))
        .filter(bloom_might_contain(F.col(big_key), F.col("bloom_words"),
                                    m_bits, k))
        .drop("bloom_words")
    )
    return pruned.join(
        small.select(small_key), pruned[big_key] == small[small_key],
        "left_semi",
    )
