"""Property-based tests (hypothesis) — SURVEY.md §5 strategy item 5:
invariants of the RFM features, quality fixes, and the firewall gate."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clv_data_pipeline_spark.operators.quality import apply_data_quality_fixes
from clv_data_pipeline_spark.operators.validate import run_validation_checks

# --- pure-logic properties (no Spark needed, run fast under hypothesis)


@given(
    raw=st.integers(min_value=0, max_value=10_000),
    feat=st.integers(min_value=0, max_value=10_000),
)
def test_ratio_gate_monotone(raw, feat):
    """The gate passes iff feat/raw >= 0.95 (raw>0); adding feature rows
    never flips a pass into a fail."""
    cols = [
        "customer_id", "recency", "T", "frequency",
        "monetary_value", "first_purchase", "last_purchase",
    ]
    def gate(r, f):
        try:
            run_validation_checks(r, f, 0, cols)
            return True
        except ValueError:
            return False

    ok = gate(raw, feat)
    if raw == 0:
        assert not ok  # ratio defined as 0 -> always fails (reference :9)
    else:
        assert ok == (feat / raw >= 0.95)
        if ok and feat < 10_000:
            assert gate(raw, feat + 1)  # monotone in feat


@given(invalid=st.integers(min_value=1, max_value=1_000_000))
def test_any_invalid_rows_fail(invalid):
    cols = [
        "customer_id", "recency", "T", "frequency",
        "monetary_value", "first_purchase", "last_purchase",
    ]
    with pytest.raises(ValueError, match="SANITY ERROR"):
        run_validation_checks(100, 100, invalid, cols)


# --- Spark-backed properties (single example batch per case to keep the
# suite fast; hypothesis drives the data, Spark executes once per list)


@settings(max_examples=10, deadline=None)
@given(
    scores=st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_quality_fixes_invariants(spark, scores):
    """After fixes: clv >= 0 always; negatif flag iff input < 0; outlier
    flag iff input > 1e6; flags are 0/1."""
    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(scores)], ["customer_id", "clv"]
    )
    out = apply_data_quality_fixes(df).collect()
    by_id = {r["customer_id"]: r for r in out}
    for i, s in enumerate(scores):
        r = by_id[i]
        assert r["clv"] >= 0.0
        assert r["negatif_clv_flag"] == (1 if s < 0 else 0)
        assert r["outliners_flag"] == (1 if s > 1_000_000 else 0)
        if s >= 0:
            assert r["clv"] == s


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),        # customer
            st.integers(min_value=0, max_value=59 * 86400),  # ts offset sec
            st.floats(min_value=0.01, max_value=1e4,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_rfm_invariants(spark, data):
    """0 <= recency <= T, frequency >= 0, monetary > 0, first <= last —
    for any transaction multiset with asof after every timestamp."""
    from clv_data_pipeline_spark.operators.features import rfm_features

    base = dt.datetime(2026, 1, 1)
    rows = [
        (c, base + dt.timedelta(seconds=off), float(v)) for c, off, v in data
    ]
    df = spark.createDataFrame(
        rows, ["CustomerID", "order_timestamp", "TotalPurchase"]
    )
    feats = rfm_features(df, asof="2026-03-15").collect()
    assert len(feats) == len({c for c, _, _ in data})
    for r in feats:
        assert 0 <= r["recency"] <= r["T"]
        assert r["frequency"] >= 0
        assert r["monetary_value"] > 0
        assert r["first_purchase"] <= r["last_purchase"]


@settings(max_examples=8, deadline=None)
@given(
    tkeys=st.lists(
        st.integers(min_value=0, max_value=20), min_size=0, max_size=15,
        unique=True,
    ),
    skeys=st.lists(
        st.integers(min_value=0, max_value=20), min_size=0, max_size=15,
        unique=True,
    ),
)
def test_merge_upsert_invariants(spark, tkeys, skeys):
    """merge_upsert: output keys = target ∪ source keys; source wins on
    overlap; applying the same source twice is idempotent."""
    from clv_data_pipeline_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(k, "t") for k in tkeys] or [(None, None)], "id long, tag string"
    ).filter("id IS NOT NULL")
    source = spark.createDataFrame(
        [(k, "s") for k in skeys] or [(None, None)], "id long, tag string"
    ).filter("id IS NOT NULL")
    once = merge_upsert(target, source, ["id"])
    rows = {r["id"]: r["tag"] for r in once.collect()}
    assert set(rows) == set(tkeys) | set(skeys)
    for k in skeys:
        assert rows[k] == "s"
    for k in set(tkeys) - set(skeys):
        assert rows[k] == "t"
    twice = {
        r["id"]: r["tag"]
        for r in merge_upsert(once, source, ["id"]).collect()
    }
    assert twice == rows


@settings(max_examples=8, deadline=None)
@given(
    tkeys=st.lists(
        st.integers(min_value=0, max_value=20), min_size=1, max_size=15,
        unique=True,
    ),
    svals=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.one_of(st.none(), st.text(min_size=1, max_size=3)),
        min_size=1, max_size=15,
    ),
)
def test_merge_upsert_null_updates(spark, tkeys, svals):
    """SQL MERGE UPDATE semantics: a matched row takes the source value
    even when that value is NULL (a COALESCE-based merge would keep the
    stale target value — the ADVICE.md regression this pins)."""
    from clv_data_pipeline_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(k, "t") for k in tkeys], "id long, tag string"
    )
    source = spark.createDataFrame(
        list(svals.items()), "id long, tag string"
    )
    rows = {r["id"]: r["tag"] for r in merge_upsert(target, source, ["id"]).collect()}
    assert set(rows) == set(tkeys) | set(svals)
    for k, v in svals.items():
        assert rows[k] == v  # source wins, including NULL
    for k in set(tkeys) - set(svals):
        assert rows[k] == "t"


@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    n_merges=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=25, deadline=None)
def test_bpe_train_matches_reference_property(spark, words, n_merges):
    """bpe_train == an independently coded reference BPE for ANY small
    corpus: same merges, same counts, same order (greedy max count,
    lexicographic ties)."""
    from clv_data_pipeline_spark.operators.corpus import bpe_train

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )

    # reference: dict-based BPE on the word-frequency table
    vocab: dict = {}
    for w in words:
        vocab[w] = vocab.get(w, 0) + 1
    seqs = {w: tuple(w) + ("</w>",) for w in vocab}
    want = []
    for _ in range(n_merges):
        pc: dict = {}
        for w, f in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + f
        if not pc:
            break
        top = max(pc.values())
        best = min(p for p, c in pc.items() if c == top)
        want.append((best[0], best[1], top))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) == best:
                    out.append(best[0] + best[1]); i += 2
                else:
                    out.append(s[i]); i += 1
            seqs[w] = tuple(out)

    assert bpe_train(docs, num_merges=n_merges) == want


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.sampled_from(["aaaa", "bbbb", "cccc", "aaaa ", " aaaa", "dd dd"]),
        min_size=2,
        max_size=20,
    ),
    cut_frac=st.floats(min_value=0.1, max_value=0.9),
)
@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_dedup_incremental_equals_full_property(spark, texts, cut_frac):
    """For ANY corpus with duplicates and ANY id-ordered base/delta cut,
    incremental admission against the fingerprint index must equal the
    full greedy dedup restricted to the delta (first-seen-wins: the
    normalized-text winner is always the smallest id, which lives in
    the base whenever the fingerprint exists there)."""
    from clv_data_pipeline_spark.operators.dedup import (
        dedup_exact,
        dedup_incremental,
        fingerprint_index,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    cut = int(len(texts) * cut_frac)
    base = docs.filter(F.col("doc_id") < cut)
    delta = docs.filter(F.col("doc_id") >= cut)
    incremental = {
        r.doc_id
        for r in dedup_incremental(fingerprint_index(base), delta).collect()
    }
    full = {
        r.doc_id
        for r in dedup_exact(docs).collect()
        if r.doc_id >= cut
    }
    assert incremental == full


@settings(max_examples=8, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # user
            st.sampled_from(["a", "b"]),             # state attr
            st.integers(min_value=0, max_value=1000),  # ts offset min
        ),
        min_size=1,
        max_size=25,
    ),
    cut_min=st.integers(min_value=0, max_value=1000),
)
@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_scd2_merge_equals_rebuild_property(spark, events, cut_min):
    """For ANY change-event stream and ANY time cut, folding the
    post-cut delta into the pre-cut interval table must produce exactly
    the intervals of a full rebuild over all events."""
    import datetime as dt

    from clv_data_pipeline_spark.queries.temporal import (
        scd2_intervals,
        scd2_merge,
    )

    base_ts = dt.datetime(2026, 1, 1)
    rows = [
        (u, a, base_ts + dt.timedelta(minutes=m), i)
        for i, (u, a, m) in enumerate(events)
    ]
    ev = spark.createDataFrame(
        rows, ["user_id", "event_type", "ts", "event_id"]
    )
    cut = base_ts + dt.timedelta(minutes=cut_min)
    target = scd2_intervals(ev.filter(F.col("ts") < cut))
    delta = ev.filter(F.col("ts") >= cut)
    merged = {
        (r.user_id, r.event_type, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_merge(target, delta).collect()
    }
    rebuilt = {
        (r.user_id, r.event_type, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_intervals(ev).collect()
    }
    assert merged == rebuilt


@settings(max_examples=8, deadline=None)
@given(
    bkeys=st.lists(
        st.integers(min_value=0, max_value=200), min_size=1, max_size=40,
    ),
    skeys=st.lists(
        st.integers(min_value=0, max_value=200), min_size=0, max_size=20,
        unique=True,
    ),
)
def test_bloom_semi_join_equals_exact_property(spark, bkeys, skeys):
    """bloom_semi_join is EXACTLY the plain left-semi join for any key
    sets (duplicates on the big side preserved, empty small side ->
    empty result)."""
    from clv_data_pipeline_spark.operators.bloom import bloom_semi_join

    big = spark.createDataFrame([(k,) for k in bkeys], "k long")
    small = spark.createDataFrame(
        [(k,) for k in skeys] or [(None,)], "j long"
    ).filter("j IS NOT NULL")
    got = sorted(
        r["k"] for r in bloom_semi_join(big, "k", small, "j").collect()
    )
    expect = sorted(k for k in bkeys if k in set(skeys))
    assert got == expect


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=25,
    ),
)
def test_lpa_fixed_iteration_reference_property(spark, edges):
    """label_propagation matches a literal python implementation of the
    same synchronous min-tie-break rule on arbitrary small graphs."""
    from collections import Counter

    from clv_data_pipeline_spark.operators.graph import label_propagation

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({a for a, _ in und})
    nbrs = {n: [b for a, b in und if a == n] for n in nodes}
    lab = {n: n for n in nodes}
    for _ in range(3):
        new = {}
        for n in nodes:
            votes = Counter(lab[m] for m in nbrs[n])
            top = max(votes.values())
            new[n] = min(l for l, c in votes.items() if c == top)
        lab = new

    df = spark.createDataFrame(list(edges), "src long, dst long")
    got = {
        r["node"]: r["lab"]
        for r in label_propagation(df, iters=3).collect()
    }
    assert got == lab


# --- distributed scan/rank operators vs the naive single-partition
# window (operators/ids.py): the decomposition must be EXACTLY the
# sequential semantics on arbitrary inputs.

@settings(max_examples=8, deadline=None)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1, max_size=60, unique=True,
    ),
    vals=st.data(),
)
@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_distributed_prefix_scans_equal_sequential(spark, ids, vals):
    from pyspark.sql import Window

    from clv_data_pipeline_spark.operators.ids import (
        distributed_prefix_max,
        distributed_prefix_sum,
    )

    rows = [
        (i, vals.draw(st.integers(min_value=-1000, max_value=1000)))
        for i in ids
    ]
    df = spark.createDataFrame(rows, "k long, v long").repartition(5)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    naive = {
        r["k"]: (r["s"], r["m"])
        for r in df.select(
            "k",
            F.sum("v").over(w).alias("s"),
            F.max("v").over(w).alias("m"),
        ).collect()
    }
    got_s = {
        r["k"]: r["running"]
        for r in distributed_prefix_sum(
            df, "k", "v", out_col="running", n_buckets=7
        ).collect()
    }
    got_m = {
        r["k"]: r["running_max"]
        for r in distributed_prefix_max(
            df, "k", "v", n_buckets=7
        ).collect()
    }
    assert got_s == {k: v[0] for k, v in naive.items()}
    assert got_m == {k: v[1] for k, v in naive.items()}


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # order key, MANY ties
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1, max_size=40,
    )
)
@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_prefix_max_tiebreak_matches_sequential(spark, rows):
    """With duplicate order keys, tiebreak_col must reproduce the
    sequential scan ordered by (k, id) exactly — the q_late_events
    watermark contract (ADVICE r8: tied arrivals made wm
    nondeterministic without it)."""
    from pyspark.sql import Window

    from clv_data_pipeline_spark.operators.ids import (
        distributed_prefix_max,
    )

    data = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, k long, v long").repartition(5)
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    naive = {
        r["id"]: r["m"]
        for r in df.select("id", F.max("v").over(w).alias("m")).collect()
    }
    got = {
        r["id"]: r["running_max"]
        for r in distributed_prefix_max(
            df, "k", "v", n_buckets=3, tiebreak_col="id"
        ).collect()
    }
    assert got == naive


@settings(max_examples=8, deadline=None)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=100_000),
        min_size=1, max_size=60, unique=True,
    )
)
@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_distributed_row_number_equals_sequential(spark, ids):
    from pyspark.sql import Window

    from clv_data_pipeline_spark.operators.ids import (
        distributed_row_number,
    )

    df = (
        spark.createDataFrame([(i,) for i in ids], "doc_id long")
        .select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("h"))
        .repartition(3)
    )
    naive = {
        r["doc_id"]: r["rn"]
        for r in df.select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy("h", "doc_id"))
            .cast("long")
            .alias("rn"),
        ).collect()
    }
    got = {
        r["doc_id"]: r["pos"]
        for r in distributed_row_number(df, "h", "doc_id").collect()
    }
    assert got == naive


def test_distributed_scans_edge_cases(spark):
    """Single-row and two-row-one-bucket inputs must not break the
    bucket decomposition (empty offsets frame, width-0 guards)."""
    from pyspark.sql import Window

    from clv_data_pipeline_spark.operators.ids import (
        distributed_prefix_max,
        distributed_prefix_sum,
        distributed_row_number,
    )

    one = spark.createDataFrame([(5, 10)], "k long, v long")
    assert distributed_prefix_sum(one, "k", "v").collect()[0]["running"] == 10
    assert (
        distributed_prefix_max(one, "k", "v").collect()[0]["running_max"]
        == 10
    )
    h = one.select("k", F.md5(F.col("k").cast("string")).alias("h"))
    assert distributed_row_number(h, "h", "k").collect()[0]["pos"] == 1

    # equal order keys in one bucket: running sum over ties is
    # frame-order dependent per ROW frame; final value must still be
    # the total
    ties = spark.createDataFrame([(7, 1), (7, 2), (7, 3)], "k long, v long")
    vals = sorted(
        r["running"]
        for r in distributed_prefix_sum(ties, "k", "v").collect()
    )
    assert vals[-1] == 6


@settings(max_examples=12, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    )
)
@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_cc_pointer_jump_equals_union_find_property(spark, edges):
    """Pointer-jumping connected components must match a driver-side
    union-find on arbitrary random graphs (self-loops, duplicates,
    chains, stars — whatever hypothesis draws): every node labeled by
    its component's minimum id."""
    from clv_data_pipeline_spark.operators.density import cc_pointer_jump

    parent: dict[int, int] = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
    for v in nodes:
        parent[v] = v
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {v: find(v) for v in nodes}

    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["cluster_id"]
        for r in cc_pointer_jump(df, "a", "b").collect()
    }
    assert got == expected, (edges, got, expected)


@settings(max_examples=12, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False,
            ),
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
@pytest.mark.slowsuite  # brute-force comparison; see pytest.ini
def test_skyline_equals_brute_force_property(spark, pts):
    """Bucket-pruned skyline must equal the textbook NOT EXISTS
    domination check on arbitrary float point sets (including the
    fractional min_col values the round-6 rangeBetween bug missed)."""
    from clv_data_pipeline_spark.operators.skyline import skyline_2d

    rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
    expected = sorted(
        i
        for i, x, y in rows
        if not any(
            (x2 <= x and y2 >= y and (x2 < x or y2 > y))
            for _, x2, y2 in rows
        )
    )
    df = spark.createDataFrame(rows, "id long, mn double, mx double")
    got = sorted(
        r["id"] for r in skyline_2d(df, "mn", "mx", n_buckets=8).collect()
    )
    assert got == expected, (rows, got, expected)
