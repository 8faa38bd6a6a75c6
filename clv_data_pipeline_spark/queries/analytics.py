"""Behavioral / corpus analytics extensions: retention cohorts, funnel
conversion, TF-IDF, stratified sampling, embedding quantization, n-gram
statistics.  All pure DataFrame expressions (no Python in the hot
path), each with a DuckDB oracle.

Scale shapes: every query here is scan -> (map-side) expand ->
hash-aggregate; the only shuffles are on the aggregation keys
(cohort_week, user_id, term, bigram).  TF-IDF's document frequency is
a second aggregate over distinct (term, doc) — both stages partial-
aggregate before shuffling.  Quantization is map-only.  The stratified
sample's keep/drop decision is a pure integer function of the id, so
the sample is identical on any partitioning, engine, or rerun — the
same governance contract as the corpus split/mix queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from clv_data_pipeline_spark.functions.text import normalize_text
from clv_data_pipeline_spark.registry import query
from clv_data_pipeline_spark.sources.io import load_table


@query(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort_week,
               date_diff('day', f.cohort_week,
                         date_trunc('week', e.ts)) // 7 AS week_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users keyed by first-activity week,
    counted in each later week they return.  Two hash aggregates (first
    week per user, then distinct user-week activity); the firsts frame
    is per-user-small and joins back on the already-shuffled key."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("long").alias("n_active")
    ).select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active",
    )


@query(
    "q_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click_any,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS t_purchase_any
        FROM events GROUP BY user_id),
    staged AS (
        SELECT user_id, t_view,
               CASE WHEN t_click_any >= t_view THEN t_click_any END AS t_click
        FROM per_user),
    staged2 AS (
        SELECT s.user_id, s.t_view, s.t_click,
               (SELECT MIN(ts) FROM events e
                WHERE e.user_id = s.user_id AND e.event_type = 'purchase'
                  AND e.ts >= s.t_click) AS t_purchase
        FROM staged s)
    SELECT CAST(COUNT(t_view) AS BIGINT) AS step1_view,
           CAST(COUNT(t_click) AS BIGINT) AS step2_click,
           CAST(COUNT(t_purchase) AS BIGINT) AS step3_purchase
    FROM staged2
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user
    advances a step only with an event at-or-after their previous
    step's time.  ONE aggregate computes all stage times via
    conditional MINs (the click >= first-view refinement folds in
    afterwards as pure column math; the purchase step needs the
    post-click MIN, a second conditional aggregate over the join).

    Spark-first: no per-step self-joins of the event log; the log is
    scanned once, aggregated by user, and the funnel logic runs on the
    150-row (per-user) frame."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
            "t_click_any"
        ),
    )
    staged = per_user.select(
        "user_id",
        "t_view",
        F.when(F.col("t_click_any") >= F.col("t_view"), F.col("t_click_any"))
        .alias("t_click"),
    )
    # post-click purchase: conditional MIN over one more join-aggregate
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    t_purchase = (
        staged.join(purchases, "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("p_ts") >= F.col("t_click"), F.col("p_ts"))
            ).alias("t_purchase")
        )
    )
    full = staged.join(t_purchase, "user_id")
    return full.agg(
        F.count("t_view").cast("long").alias("step1_view"),
        F.count("t_click").cast("long").alias("step2_click"),
        F.count("t_purchase").cast("long").alias("step3_purchase"),
    )


_TOKENIZE_SQL = (
    "string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),"
    " ' ')"
)


@query(
    "q_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKENIZE_SQL}) AS term FROM documents),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                   AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n),
    ranked AS (
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
        FROM scored)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, term, tfidf,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.  Term frequency and document
    frequency are two partial-aggregating shuffles on (doc, term) /
    (term); N is a 1-row broadcast; ranking windows over the already
    doc-partitioned score frame.  Scores round to 6 places BEFORE
    ranking so ordering (and the oracle hash) is engine-stable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(F.col("doc_id").cast("long"), "term", "tfidf", "rnk")
    )


@query(
    "q_stratified_sample",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source
    FROM documents
    WHERE (doc_id * 1103515245 + 12345) % 1000 <
          CASE WHEN lang = 'en' THEN 500 ELSE 200 END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: 50% of English docs, 20% of
    everything else, via a pure integer hash of the id — identical
    membership on any engine, partitioning, or rerun (the governance
    property exact-Bernoulli `sample()` cannot give).  Map-only."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * 1103515245 + 12345) % 1000
    rate = F.when(F.col("lang") == "en", 500).otherwise(200)
    return docs.filter(bucket < rate).select(
        F.col("doc_id").cast("long"), "lang", "source"
    )


@query(
    "q_sample_exact_n",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                    AS BIGINT) AS pick
        FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source, pick
    FROM ranked WHERE pick <= 20
    """,
)
def q_sample_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-n-per-stratum sampling (20 docs per source) by md5-hash
    order — how eval/holdout sets of a FIXED size are drawn when the
    rate-based q_stratified_sample's binomial size variance is
    unacceptable.  Hash order makes the pick uniform-ish,
    engine-portable, and stable under reruns and repartitioning; the
    doc_id tiebreak pins md5 collisions.  One shuffle on the stratum
    key; rn<=20 pushes down as a per-partition group limit
    (WindowGroupLimit) so the shuffle carries only survivors of the
    map-side top-20, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("pick", F.row_number().over(w).cast("long"))
        .filter(F.col("pick") <= 20)
        .select(F.col("doc_id").cast("long"), "source", "pick")
    )


@query(
    "q_quantize_embeddings",
    oracle="""
    WITH scaled AS (
        SELECT vec_id,
               list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS mx
        FROM embeddings)
    SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
           array_to_string(list_transform(e.embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / s.mx) AS INT)),
               ',') AS q,
           ROUND(s.mx / 127.0, 6) AS scale
    FROM embeddings e JOIN scaled s ON e.vec_id = s.vec_id
    """,
)
def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column —
    the 4x memory/bandwidth lever for 100 TB ANN (scores rerank against
    the fp32 originals).  Map-only: per-vector max-abs then a rounded
    rescale, all JVM array expressions.  The int8 vector serializes to
    a comma-joined string — raw array columns stringify differently
    across engines (Python list vs numpy array), so the driver's canon
    hash could never match them."""
    emb = load_table(spark, sf_dir, "embeddings")
    mx = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    return emb.select(
        F.col("vec_id").cast("long"),
        F.array_join(
            F.transform(
                F.col("embedding"),
                lambda x: F.round(x.cast("double") * 127.0 / mx)
                .cast("int")
                .cast("string"),
            ),
            ",",
        ).alias("q"),
        F.round(mx / 127.0, 6).alias("scale"),
    )


@query(
    "q_bigram_counts",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKENIZE_SQL} AS ts FROM documents),
    bigrams AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(ts)),
                   i -> ts[i] || ' ' || ts[i + 1])) AS bigram
        FROM toks WHERE len(ts) >= 2)
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM bigrams GROUP BY bigram HAVING COUNT(*) >= 3
    """,
)
def q_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics (the n-gram LM / collocation primitive):
    adjacent-token pairs via one zip_with over the token array — no
    self-join — then a single hash aggregate with map-side combine.
    HAVING >= 3 keeps the long tail off the wire."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(normalize_text(F.col("text")), " ").alias("ts")
    ).filter(F.size("ts") >= 2)
    bigrams = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ts"), 1, F.size("ts") - 1),
                F.slice(F.col("ts"), 2, F.size("ts") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") >= 3)
    )


@query(
    "q_zscore",
    oracle="""
    WITH stats AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6)))
                    AS DOUBLE) AS s,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))
                        * CAST(l_extendedprice AS DECIMAL(38,6)))
                    AS DOUBLE) AS ss
        FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           ROUND((l.l_extendedprice - s.s / s.n)
                 / sqrt((s.ss - s.s * s.s / s.n) / (s.n - 1)), 6) AS z
    FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
    """,
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization (the feature-scaling primitive):
    group mean/std from exact decimal sufficient statistics (one
    aggregate), broadcast back, then map-only standardization.  Decimal
    sums make mean/std bit-identical across partitionings; the per-row
    z is pure scalar double math after that."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)"))
        .cast("double")
        .alias("s"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(38,6)")
            * F.col("l_extendedprice").cast("decimal(38,6)")
        )
        .cast("double")
        .alias("ss"),
    )
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(
                (F.col("l_extendedprice") - F.col("s") / F.col("n"))
                / F.sqrt(
                    (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
                    / (F.col("n") - 1)
                ),
                6,
            ).alias("z"),
        )
    )


#: count-min sketch geometry + universal-hash constants (31-bit family,
#: same overflow-safe construction as operators/dedup.py)
_CM_WIDTH = 32
_CM_HASHES = [(1103515245, 12345), (214013, 2531011), (69069, 362437)]


def _cm_bucket_sql(key: str, a: int, b: int) -> str:
    return f"(({key} * {a} + {b}) % 2147483647) % {_CM_WIDTH}"


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH sketch AS (
        SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM (
            {' UNION ALL '.join(
                f"SELECT {i} AS d, {_cm_bucket_sql('user_id', a, b)} AS bucket"
                f" FROM events"
                for i, (a, b) in enumerate(_CM_HASHES)
            )}
        ) GROUP BY d, bucket),
    keys AS (SELECT DISTINCT user_id FROM events),
    est AS (
        SELECT k.user_id,
               MIN(s.c) AS cm_estimate
        FROM keys k JOIN sketch s
          ON s.bucket = CASE s.d
               {' '.join(
                   f"WHEN {i} THEN {_cm_bucket_sql('k.user_id', a, b)}"
                   for i, (a, b) in enumerate(_CM_HASHES)
               )} END
        GROUP BY k.user_id),
    truth AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_count
        FROM events GROUP BY user_id)
    SELECT t.user_id, t.true_count, e.cm_estimate
    FROM truth t JOIN est e ON t.user_id = e.user_id
    WHERE t.true_count >= (SELECT COUNT(*) FROM events)
                          // (SELECT COUNT(DISTINCT user_id) FROM events)
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via an explicit count-min sketch: 3 universal
    hash rows x 32 buckets, built as ONE hash aggregate over exploded
    (row, bucket) pairs — the sketch is 96 cells regardless of key
    cardinality, and merging partial sketches is plain addition (the
    mergeability that makes CM work on 1000 executors).  Estimates
    (min over rows) ride a broadcast join; exact counts come along to
    exhibit the overestimate-only guarantee.  Deterministic: explicit
    31-bit affine hashes, identical in the SQL oracle."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    pairs = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        ((F.col("user_id") * a + b) % 2147483647 % _CM_WIDTH)
                        .alias("bucket"),
                    )
                    for i, (a, b) in enumerate(_CM_HASHES)
                ]
            )
        ).alias("p")
    ).select("p.d", "p.bucket")
    sketch = pairs.groupBy("d", "bucket").agg(
        F.count("*").cast("long").alias("c")
    )
    truth = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("true_count")
    )
    keys = truth.select("user_id")
    probe = keys.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        ((F.col("user_id") * a + b) % 2147483647 % _CM_WIDTH)
                        .alias("bucket"),
                    )
                    for i, (a, b) in enumerate(_CM_HASHES)
                ]
            )
        ).alias("p"),
    ).select("user_id", "p.d", "p.bucket")
    est = (
        probe.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cm_estimate"))
    )
    # adaptive heavy-hitter bar: users at or above the mean event count
    # (integer division, same arithmetic as the oracle's scalar subqueries)
    mean_bar = ev.agg(
        (
            F.count("*") / F.countDistinct("user_id")
        ).cast("long").alias("bar")
    )
    return (
        truth.join(est, "user_id")
        .crossJoin(F.broadcast(mean_bar))
        .filter(F.col("true_count") >= F.col("bar"))
        .select("user_id", "true_count", "cm_estimate")
    )


def _pagerank_oracle(iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled power-iteration CTE chain — DuckDB executes the exact
    same fixed DAG the Spark operator runs, so the oracle verifies the
    iterative algorithm itself, not just one step."""
    prs = []
    for k in range(1, iters + 1):
        prs.append(f"""
    pr{k} AS (
        SELECT n.node,
               {1.0 - damping} / (SELECT n FROM nn)
               + {damping} * COALESCE(s.v, 0) AS rank
        FROM nodes n LEFT JOIN (
            SELECT t.dst, SUM(t.p * p.rank) AS v
            FROM trans t JOIN pr{k - 1} p ON p.node = t.src
            GROUP BY t.dst) s ON s.dst = n.node)""")
    return f"""
    WITH pairs AS (
        SELECT user_id, event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events),
    edges AS (
        SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
        FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst),
    out_w AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
    trans AS (
        SELECT e.src, e.dst, e.w / o.ow AS p
        FROM edges e JOIN out_w o ON e.src = o.src),
    nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
    {','.join(prs)}
    SELECT node AS event_type, ROUND(rank, 8) AS rank FROM pr{iters}
    """


@query(
    "q_tree_paths",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT CAST(doc_id AS BIGINT) AS node,
               CASE WHEN doc_id = 0 THEN NULL
                    ELSE CAST((doc_id - 1) // 2 AS BIGINT) END AS parent
        FROM documents),
    walk AS (
        SELECT node, node AS cur, CAST(0 AS BIGINT) AS depth,
               CAST(node AS VARCHAR) AS path
        FROM edges
        UNION ALL
        SELECT w.node, e.parent, w.depth + 1,
               CAST(e.parent AS VARCHAR) || '/' || w.path
        FROM walk w JOIN edges e ON w.cur = e.node
        WHERE e.parent IS NOT NULL)
    SELECT node AS doc_id,
           CAST(MAX(depth) AS BIGINT) AS depth,
           CAST(0 AS BIGINT) AS root,
           arg_max(path, depth) AS path
    FROM walk GROUP BY node
    """,
)
def q_tree_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy traversal WITHOUT recursive CTEs: every document's
    ancestor path to the root of the binary-heap taxonomy
    (parent = (id-1)/2 materialized as an explicit edge table — the
    traversal only ever touches edges, never the formula).

    The operator (operators/graph.py ancestor_paths) re-expresses the
    recursion as ceil(log2(n))+1 iterative hash joins with lineage
    breaks — the category-tree/org-chart shape every warehouse
    migration hits.  Spark 4 does run genuine WITH RECURSIVE
    (q_recursive_cte is the same traversal on that runtime, one join
    per LEVEL); this unrolled form stays registered as the
    extreme-depth strategy — log2 D doubling rounds instead of D
    sequential levels.  The DuckDB oracle IS a recursive CTE, so the
    driver hash-verifies the unrolled-join reformulation against the
    genuine recursive semantics (path strings, depths, roots)."""
    import math

    from clv_data_pipeline_spark.operators.graph import ancestor_paths

    docs = load_table(spark, sf_dir, "documents")
    edges = docs.select(
        F.col("doc_id").cast("long").alias("node"),
        F.when(F.col("doc_id") == 0, F.lit(None).cast("long"))
        .otherwise(F.floor((F.col("doc_id") - 1) / 2).cast("long"))
        .alias("parent"),
    )
    # bounded metadata barrier: one count to size the unroll depth
    depth = int(math.ceil(math.log2(docs.count() + 1))) + 1
    return ancestor_paths(edges, max_depth=depth).select(
        F.col("node").alias("doc_id"), "depth", "root", "path"
    )


@query(
    "q_tree_depth_doubling",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT CAST(doc_id AS BIGINT) AS node,
               CASE WHEN doc_id = 0 THEN NULL
                    ELSE CAST((doc_id - 1) // 2 AS BIGINT) END AS parent
        FROM documents),
    walk AS (
        SELECT node, node AS cur, CAST(0 AS BIGINT) AS depth FROM edges
        UNION ALL
        SELECT w.node, e.parent, w.depth + 1
        FROM walk w JOIN edges e ON w.cur = e.node
        WHERE e.parent IS NOT NULL)
    SELECT node AS doc_id, CAST(MAX(depth) AS BIGINT) AS depth,
           CAST(0 AS BIGINT) AS root
    FROM walk GROUP BY node
    """,
)
def q_tree_depth_doubling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The POINTER-DOUBLING twin of q_tree_paths: depth/root of every
    node in O(log D) rounds (jump table squared each round) instead of
    D sequential joins — 4 rounds cover the depth-12 taxonomy here, 30
    rounds would cover a billion-deep chain.  Hash-verified against
    the same genuine recursive CTE, so BOTH reformulations of
    WITH RECURSIVE (linear unroll and doubling) carry driver-checked
    proofs (operators/graph.py ancestor_depths_doubling)."""
    from clv_data_pipeline_spark.operators.graph import (
        ancestor_depths_doubling,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = docs.select(
        F.col("doc_id").cast("long").alias("node"),
        F.when(F.col("doc_id") == 0, F.lit(None).cast("long"))
        .otherwise(F.floor((F.col("doc_id") - 1) / 2).cast("long"))
        .alias("parent"),
    )
    return ancestor_depths_doubling(edges, rounds=5).select(
        F.col("node").alias("doc_id"), "depth", "root"
    )


@query(
    "q_k_anonymity",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    HAVING COUNT(*) < 8
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment) quasi-
    identifier: every combination whose population is below k = 8 —
    the privacy-governance pass a dataset release runs to find
    re-identifiable cohorts before publishing aggregates.  One
    partial-aggregated group-by with the HAVING filter applied at the
    aggregate, so only violating combos (11 of 125 here) leave the
    shuffle."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").cast("long").alias("group_size"))
        .filter(F.col("group_size") < 8)
        .select(
            F.col("c_nationkey").cast("long"), "c_mktsegment", "group_size"
        )
    )


@query(
    "q_hll_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS est_within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch pre-aggregation — THE incremental distinct-count
    pattern at 100 TB: per-(type, day) HyperLogLog sketches of user_id
    (what a daily rollup job would persist) union-merge into per-type
    distinct-user estimates WITHOUT rescanning raw events — a day's
    late data just re-merges one sketch.  Oracle-backed in the sketch
    self-audit form (VERDICT r5 #5): the exact countDistinct side is
    hash-verified, and the engine-specific estimate rides as a verdict
    boolean the oracle pins — DataSketches HLL at default lgk=12 has
    ~1.6% standard error, measured <=0.8% on every testdata SF, so the
    5% bound is a real quality gate, not slack.  Register merges are
    order-independent (max per register), so the verdict is
    deterministic under any partitioning."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("est_within_5pct"),
    )


@query("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of event types over the behavior-transition
    graph (which states dominate user flows).  The operator is the
    generic scale path — per-iteration message shuffle + localCheckpoint
    lineage breaks; the oracle unrolls the identical 10 damped power
    iterations in chained CTEs, so the driver hash-verifies the
    ITERATIVE computation end to end (rare for oracle checks)."""
    from pyspark.sql.window import Window as W

    from clv_data_pipeline_spark.operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.withColumn("dst", F.lead("event_type").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    ranks = pagerank(edges, weight="w")
    return ranks.select(
        F.col("node").alias("event_type"), F.round("rank", 8).alias("rank")
    )


@query(
    "q_skew_report",
    oracle="""
    WITH sizes AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS sz
        FROM lineitem GROUP BY l_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(sz) AS BIGINT) AS max_sz,
           CAST(SUM(sz) AS BIGINT) AS n_rows,
           ROUND(CAST(MAX(sz) AS DOUBLE)
                 / (CAST(SUM(sz) AS DOUBLE) / COUNT(*)), 6) AS skew_factor
    FROM sizes
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/aggregate skew diagnostics for a key column: group-size
    extremes and the max/mean skew factor that decides whether a key
    needs salting or AQE skew-join handling.  Two partial-aggregating
    shuffles, output is one row regardless of scale."""
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("sz"))
    return sizes.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.max("sz").cast("long").alias("max_sz"),
        F.sum("sz").cast("long").alias("n_rows"),
        F.round(
            F.max("sz").cast("double")
            / (F.sum("sz").cast("double") / F.count("*")),
            6,
        ).alias("skew_factor"),
    )


@query(
    "q_profile",
    oracle="""
    SELECT 'o_totalprice' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_totalprice), 6) AS min_v,
           ROUND(MAX(o_totalprice), 6) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           ROUND(CAST(MIN(o_custkey) AS DOUBLE), 6),
           ROUND(CAST(MAX(o_custkey) AS DOUBLE), 6)
    FROM orders
    """,
)
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the ANALYZE TABLE primitive): null/distinct
    counts and value ranges per column, one output row per column.
    All columns profile in a single scan — Spark computes the combined
    aggregate set in one pass, then the tiny per-column rows unpivot
    driver-free via a union of 1-row projections."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("o_totalprice").cast("long").alias("nn_price"),
        F.countDistinct("o_totalprice").cast("long").alias("nd_price"),
        F.round(F.min("o_totalprice"), 6).alias("min_price"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
        F.count("o_custkey").cast("long").alias("nn_cust"),
        F.countDistinct("o_custkey").cast("long").alias("nd_cust"),
        F.round(F.min("o_custkey").cast("double"), 6).alias("min_cust"),
        F.round(F.max("o_custkey").cast("double"), 6).alias("max_cust"),
    )
    price = agg.select(
        F.lit("o_totalprice").alias("col"),
        "n_rows",
        F.col("nn_price").alias("n_nonnull"),
        F.col("nd_price").alias("n_distinct"),
        F.col("min_price").alias("min_v"),
        F.col("max_price").alias("max_v"),
    )
    cust = agg.select(
        F.lit("o_custkey").alias("col"),
        "n_rows",
        F.col("nn_cust").alias("n_nonnull"),
        F.col("nd_cust").alias("n_distinct"),
        F.col("min_cust").alias("min_v"),
        F.col("max_cust").alias("max_v"),
    )
    return price.unionByName(cust)


@query(
    "q_source_report",
    oracle=r"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(CAST(len(regexp_extract_all(trim(text), '\S+', 0))
                         AS BIGINT)) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS mean_chars
    FROM documents GROUP BY source
    """,
)
def q_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus dashboard: the governance aggregate a curator
    reads before reweighting (volume, language spread, token budget).
    One partial-aggregating shuffle on source; token counting stays in
    the scan stage as a regexp_count expression."""
    from clv_data_pipeline_spark.functions.text import whitespace_token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(whitespace_token_count(F.col("text"))).cast("long").alias(
            "total_tokens"
        ),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.count("*"), 4
        ).alias("mean_chars"),
    )


@query(
    "q_anomaly_days",
    oracle="""
    WITH daily AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY day),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS DOUBLE) AS s,
               CAST(SUM(n * n) AS DOUBLE) AS ss
        FROM daily),
    scored AS (
        SELECT d.day, d.n,
               CASE WHEN s.k <= 1 OR s.ss - s.s * s.s / s.k <= 0 THEN NULL
                    ELSE (d.n - s.s / s.k)
                         / sqrt((s.ss - s.s * s.s / s.k) / (s.k - 1)) END AS z
        FROM daily d CROSS JOIN stats s)
    SELECT day, n, ROUND(z, 6) AS z,
           CAST(COALESCE(ABS(z) > 2.0, FALSE) AS BIGINT) AS is_anomaly
    FROM scored
    """,
)
def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection: per-day event counts scored as
    z-scores against the whole series (|z| > 2 flags).  Two tiny
    aggregates — the stats row broadcasts; integer sufficient
    statistics make mean/std exact, so the z is engine-deterministic
    pure double math."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    # decimal square-sum: day counts at 100 TB square past long range
    # (ANSI overflow error); decimal(38) stays exact like DuckDB HUGEINT
    stats = daily.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n").cast("double").alias("s"),
        F.sum(
            F.col("n").cast("decimal(19,0)") * F.col("n").cast("decimal(19,0)")
        )
        .cast("double")
        .alias("ss"),
    )
    var_num = F.col("ss") - F.col("s") * F.col("s") / F.col("k")
    z = F.when(
        (F.col("k") <= 1) | (var_num <= 0), F.lit(None).cast("double")
    ).otherwise(
        (F.col("n") - F.col("s") / F.col("k"))
        / F.sqrt(var_num / (F.col("k") - 1))
    )
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n",
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > 2.0, F.lit(False)).cast("long").alias("is_anomaly"),
    )


@query(
    "q_python_datasource",
    oracle="""
    WITH gen AS (
        SELECT i AS txn_id,
               (i * 1103515245 + 12345) % 2147483647 AS h
        FROM (SELECT unnest(generate_series(0, 1999)) AS i)),
    rows_ AS (
        SELECT txn_id,
               h % 200 AS customer_id,
               (h % 99000) / 100.0 + 1.0 AS amount,
               h % 30 AS day_offset
        FROM gen)
    SELECT CAST(customer_id AS BIGINT) AS customer_id,
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           ROUND(CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_amount,
           CAST(MIN(day_offset) AS BIGINT) AS first_day
    FROM rows_ GROUP BY customer_id
    """,
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom CONNECTOR coverage (Spark 4 Python DataSource API): scan
    the `clv_synthetic` source — partition-parallel executor-side row
    generation, the Spark-native answer to the reference's single-host
    row-loop generator — and aggregate per customer.  The source's
    integer arithmetic is mirrored in the oracle's generate_series, so
    the driver hash-verifies a custom data source end to end."""
    from clv_data_pipeline_spark.sources.pyds import register

    register(spark)
    txns = (
        spark.read.format("clv_synthetic")
        .option("n_rows", 2000)
        .option("partitions", 8)
        .load()
    )
    return txns.groupBy("customer_id").agg(
        F.count("*").cast("long").alias("n_txns"),
        F.round(
            F.sum(F.col("amount").cast("decimal(18,4)")).cast("double"), 2
        ).alias("total_amount"),
        F.min("day_offset").cast("long").alias("first_day"),
    )


@query(
    "q_variant_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                OVER (PARTITION BY event_type) AS BIGINT) AS k_total
    FROM events
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): parse the JSON props
    column once into a variant, extract a typed path, and window over
    it — the modern engine path for schemaless columns (parse once,
    binary-encoded, no per-access JSON re-parse like get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "event_type",
        F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
    )
    w = Window.partitionBy("event_type")
    return v.select(
        "event_id",
        "event_type",
        "k",
        F.sum("k").over(w).cast("long").alias("k_total"),
    )


@query(
    "q_udtf_sentences",
    oracle=r"""
    WITH s AS (
        SELECT doc_id, string_split_regex(text, '[.!?]+\s*') AS parts
        FROM documents),
    ex AS (
        SELECT doc_id, unnest(parts) AS sentence,
               unnest(generate_series(1, len(parts))) AS pos
        FROM s)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1
                AS BIGINT) AS sent_idx,
           sentence
    FROM ex WHERE sentence <> ''
    """,
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (table function, Arrow-batched): sentence
    splitting as a 1-to-N lateral expansion.  UDTFs are the escape
    hatch for expansions with per-row Python logic; this one is also
    SQL-expressible, so it carries a full oracle — the UDTF mechanism
    itself gets hash-verified.  (For pure regex splits the built-in
    explode/split is the hot path; the UDTF exists to pin the API.)"""
    import re

    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="sent_idx bigint, sentence string", useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            parts = [p for p in re.split(r"[.!?]+\s*", text or "") if p]
            for i, s in enumerate(parts):
                yield i, s

    spark.udtf.register("sentence_split", SentenceSplit)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id, s.sent_idx, s.sentence
        FROM _udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )


@query(
    "q_cogroup_reconcile",
    oracle="""
    WITH o AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS order_total
        FROM orders GROUP BY o_custkey),
    l AS (
        SELECT o_custkey, COUNT(*) AS n_lines,
               SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS line_total
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey)
    SELECT CAST(o.o_custkey AS BIGINT) AS custkey,
           CAST(o.n_orders AS BIGINT) AS n_orders,
           CAST(COALESCE(l.n_lines, 0) AS BIGINT) AS n_lines,
           ROUND(CAST(o.order_total AS DOUBLE), 2) AS order_total,
           ROUND(CAST(COALESCE(l.line_total, 0) AS DOUBLE), 2) AS line_total
    FROM o LEFT JOIN l ON o.o_custkey = l.o_custkey
    """,
)
def q_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-pandas API surface: reconcile per-customer order
    headers against their lineitems with ``cogroup().applyInPandas`` —
    both sides shuffle once on the key and arrive as aligned pandas
    frames (the escape hatch for custom two-table merge logic that a
    join can't express).  This instance IS join-expressible, so the
    oracle hash-verifies the cogroup mechanism end to end.  Decimal
    sums inside the Python side keep totals order-independent."""
    import decimal

    import pandas as pd

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey"), F.col("o_totalprice")
    )
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .join(
            load_table(spark, sf_dir, "orders").select(
                "o_orderkey", F.col("o_custkey").alias("c2")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("c2").alias("o_custkey"), "l_extendedprice")
    )

    def _reconcile(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        q = decimal.Decimal("0.0001")
        order_total = sum(
            (decimal.Decimal(str(v)).quantize(q) for v in odf["o_totalprice"]),
            decimal.Decimal(0),
        )
        line_total = sum(
            (decimal.Decimal(str(v)).quantize(q) for v in ldf["l_extendedprice"]),
            decimal.Decimal(0),
        )
        return pd.DataFrame(
            {
                "custkey": [key[0]],
                "n_orders": [len(odf)],
                "n_lines": [len(ldf)],
                "order_total": [round(float(order_total), 2)],
                "line_total": [round(float(line_total), 2)],
            }
        )

    return (
        orders.groupBy("o_custkey")
        .cogroup(lines.groupBy("o_custkey"))
        .applyInPandas(
            _reconcile,
            "custkey long, n_orders long, n_lines long, "
            "order_total double, line_total double",
        )
    )


@query(
    "q_chisq",
    oracle="""
    WITH obs AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY lang, source),
    rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS n_l FROM obs GROUP BY lang),
    ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS n_s
           FROM obs GROUP BY source),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
    grid AS (
        SELECT rt.lang, rt.n_l, ct.source, ct.n_s, tot.n
        FROM rt CROSS JOIN ct CROSS JOIN tot),
    cells AS (
        SELECT g.lang, g.source, g.n_l, g.n_s, g.n,
               COALESCE(obs.o, 0) AS o,
               CAST(g.n_l AS DOUBLE) * g.n_s / g.n AS e
        FROM grid g LEFT JOIN obs
          ON g.lang = obs.lang AND g.source = obs.source),
    summed AS (
        SELECT SUM(CAST(ROUND((o - e) * (o - e) / e, 9)
                        AS DECIMAL(28,9))) AS chi2_acc,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS c,
               CAST(SUM(o) AS BIGINT) AS n
        FROM cells)
    SELECT ROUND(CAST(chi2_acc AS DOUBLE), 6) AS chi2,
           (r - 1) * (c - 1) AS dof,
           n,
           ROUND(SQRT(ROUND(CAST(chi2_acc AS DOUBLE), 6)
                      / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v
    FROM summed
    """,
)
def q_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between two categorical columns
    (document language x source) plus Cramer's V effect size — the
    feature-selection / stratification-audit primitive for training
    pipelines (is the corpus's language mix independent of its
    sources?).

    Spark-first: observed counts are ONE hash aggregate over the fact
    table; marginals re-aggregate the already-tiny contingency frame;
    the full r x c grid (zero-observed cells included — they carry
    expected mass) comes from crossing the two dimension-sized
    marginal frames, a broadcast nested-loop over 5 x 20 rows
    (plan-lint whitelisted).  Determinism: each cell's (o-e)^2/e term
    rounds to 9 places and accumulates as exact DECIMAL (the
    q_perplexity pattern), so partitioning never changes the sum;
    Cramer's V takes the square root of the already-rounded chi2."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT persisted although obs feeds four branches: all of them share
    # obs's identical (lang, source) exchange, which AQE stage-reuse
    # dedupes — measured A/B at sf0.1: 0.25 s no-persist vs 0.41 s
    # persist (docs/SCALE.md, persist barriers).
    obs = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("o")
    )
    rt = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("n_l"))
    ct = obs.groupBy("source").agg(F.sum("o").cast("long").alias("n_s"))
    tot = obs.agg(F.sum("o").cast("long").alias("n"))
    grid = rt.crossJoin(F.broadcast(ct)).crossJoin(F.broadcast(tot))
    cells = grid.join(F.broadcast(obs), ["lang", "source"], "left").select(
        "lang",
        "source",
        "n_l",
        "n_s",
        "n",
        F.coalesce("o", F.lit(0)).alias("o"),
        (F.col("n_l").cast("double") * F.col("n_s") / F.col("n")).alias("e"),
    )
    term = F.round(
        (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 9
    ).cast("decimal(28,9)")
    summed = cells.agg(
        F.sum(term).alias("chi2_acc"),
        F.countDistinct("lang").cast("long").alias("r"),
        F.countDistinct("source").cast("long").alias("c"),
        F.sum("o").cast("long").alias("n"),
    )
    chi2 = F.round(F.col("chi2_acc").cast("double"), 6)
    return summed.select(
        chi2.alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        "n",
        F.round(
            F.sqrt(chi2 / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))),
            6,
        ).alias("cramers_v"),
    )


@query(
    "q_psi_drift",
    oracle="""
    WITH binned AS (
        SELECT event_type,
               CASE WHEN value < 0 THEN CAST(0 AS BIGINT)
                    WHEN value >= 500 THEN CAST(11 AS BIGINT)
                    ELSE CAST(FLOOR(value / 50.0) AS BIGINT) + 1
               END AS bucket,
               CAST(ts < TIMESTAMP '2024-01-16' AS BIGINT) AS in_a
        FROM events),
    counts AS (
        SELECT event_type, bucket,
               CAST(SUM(in_a) AS BIGINT) AS ca,
               CAST(SUM(1 - in_a) AS BIGINT) AS cb
        FROM binned GROUP BY event_type, bucket),
    grid AS (
        SELECT t.event_type, b.bucket
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS bucket) b),
    cells AS (
        SELECT g.event_type, g.bucket,
               COALESCE(c.ca, 0) AS ca, COALESCE(c.cb, 0) AS cb
        FROM grid g LEFT JOIN counts c
          ON g.event_type = c.event_type AND g.bucket = c.bucket),
    tots AS (
        SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na,
               CAST(SUM(cb) AS BIGINT) AS nb
        FROM cells GROUP BY event_type),
    terms AS (
        SELECT c.event_type, t.na, t.nb,
               (CAST(c.ca + 1 AS DOUBLE) / (t.na + 12)) AS pa,
               (CAST(c.cb + 1 AS DOUBLE) / (t.nb + 12)) AS pb
        FROM cells c JOIN tots t ON c.event_type = t.event_type)
    SELECT event_type,
           ROUND(CAST(SUM(CAST(ROUND((pa - pb) * ln(pa / pb), 9)
                                AS DECIMAL(28,9))) AS DOUBLE), 6) AS psi,
           na AS n_before, nb AS n_after
    FROM terms GROUP BY event_type, na, nb
    """,
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the first 15
    days of the event log and everything after — the standard
    distribution-drift monitor a training pipeline runs before
    admitting a new data window (PSI > 0.2 means the feature moved).

    Spark-first: ONE scan of the log with conditional partial
    aggregation splits the two periods (no second scan, no self
    join); fixed-width value bins via width_bucket so both engines
    bin identically (no engine-specific quantiles); the full
    type x bin grid — empty bins carry add-one-smoothed mass — is a
    map-side sequence explode off the distinct-type frame, never a
    calendar join.  Laplace smoothing ((c+1)/(n+12)) keeps ln finite
    on empty bins with integer-exact inputs; each bin's PSI term
    rounds to 9 places and accumulates as DECIMAL (the q_perplexity
    pattern)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.width_bucket(F.col("value"), F.lit(0), F.lit(500), F.lit(10))
        .cast("long")
        .alias("bucket"),
        (F.col("ts") < F.lit("2024-01-16")).cast("long").alias("in_a"),
    )
    counts = ev.groupBy("event_type", "bucket").agg(
        F.sum("in_a").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("in_a")).cast("long").alias("cb"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(11))).alias("bucket"),
        )
    )
    cells = grid.join(counts, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    # period totals as WINDOW sums over the 60-row cells frame — a
    # groupBy+join-back here would branch the lineage and make Spark
    # re-execute the whole counts subtree (an extra corpus scan per
    # branch); the window keeps one linear plan.
    wt = Window.partitionBy("event_type")
    terms = cells.select(
        "event_type",
        F.sum("ca").over(wt).cast("long").alias("na"),
        F.sum("cb").over(wt).cast("long").alias("nb"),
        "ca",
        "cb",
    ).select(
        "event_type",
        "na",
        "nb",
        ((F.col("ca") + 1).cast("double") / (F.col("na") + 12)).alias("pa"),
        ((F.col("cb") + 1).cast("double") / (F.col("nb") + 12)).alias("pb"),
    )
    term = F.round(
        (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb")), 9
    ).cast("decimal(28,9)")
    return (
        terms.groupBy("event_type", "na", "nb")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("psi"))
        .select(
            "event_type",
            "psi",
            F.col("na").alias("n_before"),
            F.col("nb").alias("n_after"),
        )
    )


@query(
    "q_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               -ln(((doc_id * 1103515245 + 12345) % 1000000 + 0.5)
                   / 1000000.0) / n_chars AS k
        FROM documents),
    ranked AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY k, doc_id) AS BIGINT) AS pick
        FROM keyed)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source, pick
    FROM ranked WHERE pick <= 10
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (10 docs per source,
    inclusion probability proportional to document length) via the
    Efraimidis-Spirakis exponential race: each doc draws key
    -ln(u)/weight and the k smallest keys per stratum win — the
    distributed one-pass answer to "sample proportional to size",
    used when corpus mixing should favor long documents without a
    multinomial draw on the driver.

    Governance determinism (the q_stratified_sample contract): u comes
    from the same pure-integer LCG hash of the id, offset by 0.5 so
    ln never sees 0 — membership is identical on any engine,
    partitioning, or rerun; doc_id breaks key ties.  One shuffle on
    the stratum key, and rn<=10 pushes down as WindowGroupLimit so
    only each partition's local top-10 ever shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (F.col("doc_id") * 1103515245 + 12345) % 1000000 + 0.5
    ) / 1000000.0
    key = -F.log(u) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(key.alias("k"), "doc_id")
    return (
        docs.select("doc_id", "source", "n_chars")
        .withColumn("pick", F.row_number().over(w).cast("long"))
        .filter(F.col("pick") <= 10)
        .select(F.col("doc_id").cast("long"), "source", "pick")
    )


@query(
    "q_robust_z",
    oracle="""
    WITH med AS (
        SELECT event_type,
               CAST(quantile_cont(value, 0.5) AS DOUBLE) AS med
        FROM events GROUP BY event_type),
    mad AS (
        SELECT e.event_type,
               CAST(quantile_cont(abs(e.value - m.med), 0.5) AS DOUBLE)
                   AS mad
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type)
    SELECT e.event_type,
           ROUND(m.med, 4) AS med, ROUND(d.mad, 4) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN 0.6745 * abs(e.value - m.med) / d.mad > 3.5
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    GROUP BY e.event_type, m.med, d.mad
    """,
)
def q_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type by modified z-score
    (0.6745*|x-median|/MAD > 3.5, the Iglewicz-Hoaglin rule) — the
    median/MAD twin of q_zscore that heavy-tailed value columns need,
    since mean/std are themselves dragged by the outliers being hunted.

    Exact two-level medians cost two aggregation passes over the fact
    table plus a counting pass — the honest price of exactness (the
    approx path is percentile_approx in ONE pass; q_approx_percentiles
    covers that trade).  The per-type median/MAD frames are
    dimension-sized and broadcast back, so each pass is scan +
    partial/final agg, no sort of the fact table.  Determinism: exact
    percentile is order-free selection (midpoint averaging of two
    doubles is a single identical IEEE op), the outlier predicate
    compares identical doubles on both engines, and only the reported
    med/mad round."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )
    flagged = (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                (
                    F.lit(0.6745)
                    * F.abs(F.col("value") - F.col("med"))
                    / F.col("mad")
                    > 3.5
                ).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
    return flagged.select(
        "event_type",
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        "n",
        "n_outliers",
    )


@query(
    "q_ab_test",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               CAST(ts < TIMESTAMP '2024-01-16' AS BIGINT) AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
               CAST(SUM(CAST(value AS DECIMAL(18,4))
                        * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS ss
        FROM events GROUP BY 1, 2),
    sides AS (
        SELECT a.event_type,
               a.n AS na, b.n AS nb,
               a.s / a.n AS ma, b.s / b.n AS mb,
               (a.ss - a.s * a.s / a.n) / (a.n - 1) AS va,
               (b.ss - b.s * b.s / b.n) / (b.n - 1) AS vb
        FROM stats a JOIN stats b ON a.event_type = b.event_type
        WHERE a.grp = 1 AND b.grp = 0)
    SELECT event_type, na, nb,
           ROUND(ma - mb, 6) AS mean_diff,
           ROUND((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
           ROUND(POW(va / na + vb / nb, 2)
                 / (POW(va / na, 2) / (na - 1)
                    + POW(vb / nb, 2) / (nb - 1)), 2) AS dof
    FROM sides
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test per event type between the first 15
    days and the rest of the log (unequal variances, the A/B-testing
    default) — completing the statistical-testing trio: q_chisq for
    categorical association, q_psi_drift for distribution shift, this
    for mean shift.

    ONE conditionally-grouped scan computes both periods' sufficient
    statistics (n, sum, sum-of-squares accumulated as exact DECIMAL so
    the inputs to the float math are engine- and partitioning-exact);
    the t statistic and Welch-Satterthwaite dof are then identical
    IEEE754 expressions per 5-row group.  The period self-join runs on
    the 10-row stats frame, never the log."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts") < F.lit("2024-01-16")).cast("long").alias("grp"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    stats = ev.groupBy("event_type", "grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("double").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("ss"),
    )
    a = stats.filter(F.col("grp") == 1).drop("grp")
    b = stats.filter(F.col("grp") == 0).drop("grp")
    sides = a.alias("a").join(b.alias("b"), "event_type").select(
        "event_type",
        F.col("a.n").alias("na"),
        F.col("b.n").alias("nb"),
        (F.col("a.s") / F.col("a.n")).alias("ma"),
        (F.col("b.s") / F.col("b.n")).alias("mb"),
        (
            (F.col("a.ss") - F.col("a.s") * F.col("a.s") / F.col("a.n"))
            / (F.col("a.n") - 1)
        ).alias("va"),
        (
            (F.col("b.ss") - F.col("b.s") * F.col("b.s") / F.col("b.n"))
            / (F.col("b.n") - 1)
        ).alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    return sides.select(
        "event_type",
        "na",
        "nb",
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
                + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
            ),
            2,
        ).alias("dof"),
    )


@query(
    "q_trend",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS y
        FROM events GROUP BY 1, 2),
    suff AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(CAST(x AS BIGINT) * x) AS BIGINT) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sy,
               CAST(SUM(x * CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sxy
        FROM daily GROUP BY event_type)
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - CAST(sx AS BIGINT) * sx),
                 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy)
                        / (n * sxx - CAST(sx AS BIGINT) * sx)) * sx) / n,
                 4) AS intercept
    FROM suff
    """,
)
def q_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of daily volume: ordinary-least-squares
    slope/intercept of SUM(value) over the day index, the one-number
    answer to "is this metric growing?" that monitoring dashboards fit
    constantly.

    Two aggregation passes, both tiny after the first: daily sums
    accumulate as exact DECIMAL (deterministic y), then the OLS
    closed form runs on per-type sufficient statistics (n, Σx, Σx²,
    Σy, Σxy — x integer-exact, Σy/Σxy decimal-accumulated), so the
    final slope is one identical IEEE754 expression per group.  No
    window sorts, no driver math."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("x"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("y")
    )
    suff = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x").cast("long") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y").cast("decimal(28,9)")).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y").cast("decimal(28,9)"))
        .cast("double")
        .alias("sxy"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx") - F.col("sx").cast("long") * F.col("sx")
    )
    return suff.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 4
        ).alias("intercept"),
    )


@query(
    "q_stream_pyds",
    oracle="""
    WITH gen AS (
        SELECT i AS txn_id,
               (i * 1103515245 + 12345) % 2147483647 AS h
        FROM (SELECT unnest(generate_series(0, 1999)) AS i)),
    rows_ AS (
        SELECT txn_id,
               h % 200 AS customer_id,
               (h % 99000) / 100.0 + 1.0 AS amount,
               h % 30 AS day_offset
        FROM gen)
    SELECT CAST(customer_id AS BIGINT) AS customer_id,
           CAST(COUNT(*) AS BIGINT) AS n_txns,
           ROUND(CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE), 2)
               AS total_amount,
           CAST(MIN(day_offset) AS BIGINT) AS first_day
    FROM rows_ GROUP BY customer_id
    """,
)
def q_stream_pyds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING connector coverage (Spark 4 streaming Python
    DataSource API): readStream the `clv_synthetic` source — offset
    ranges partition executor-side exactly like the batch reader, and
    reads are replayable from pure integer arithmetic — through an
    append memory sink, then aggregate the landed rows and hash-check
    against the same generate_series oracle as the batch connector
    (q_python_datasource).  Proves the engine's source API surface is
    complete in BOTH execution modes with one arithmetic contract."""
    import shutil
    import tempfile
    import uuid

    from clv_data_pipeline_spark.sources.pyds import register

    register(spark)
    stream = (
        spark.readStream.format("clv_synthetic")
        .option("n_rows", 2000)
        .option("partitions", 8)
        .load()
    )
    sink = f"stream_pyds_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="q_stream_pyds_")
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(sink).groupBy("customer_id").agg(
        F.count("*").cast("long").alias("n_txns"),
        F.round(
            F.sum(F.col("amount").cast("decimal(18,4)")).cast("double"), 2
        ).alias("total_amount"),
        F.min("day_offset").cast("long").alias("first_day"),
    )


@query(
    "q_rolling_distinct",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    days AS (SELECT DISTINCT day FROM pairs),
    wau AS (
        SELECT d.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS wau
        FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day),
    dau AS (
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM pairs GROUP BY day)
    SELECT CAST(w.day AS VARCHAR) AS day, u.dau, w.wau,
           ROUND(CAST(u.dau AS DOUBLE) / w.wau, 6) AS stickiness
    FROM wau w JOIN dau u ON w.day = u.day
    """,
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window distinct users (DAU / 7-day WAU / stickiness) —
    the engagement metric every event pipeline computes, and a shape
    plain windows cannot express (COUNT(DISTINCT) has no frame form).

    Scale shape: dedup to (user, day) pairs first (one partial-agg
    shuffle collapses the raw log), then EXPLODE each pair to the <=7
    observation days it contributes to — turning the oracle's range
    join into an equi-aggregate with bounded 7x fan-out of the deduped
    pair list, linear shuffle volume, no self-join of the log.  The
    observed-day restriction is a broadcast semi-join against the tiny
    day dimension.  At 100 TB the same plan holds: the fan-out rides
    the deduped pairs (|users| x |days|), not the raw events; for
    90-day windows swap the explode for per-day HLL sketch merges
    (q_hll_merge pattern)."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = pairs.select("day").distinct()
    expanded = pairs.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("obs_day"),
    )
    wau = (
        expanded.join(
            F.broadcast(days), expanded["obs_day"] == days["day"], "left_semi"
        )
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = pairs.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return (
        wau.join(dau, wau["obs_day"] == dau["day"])
        .select(
            F.col("obs_day").cast("string").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


@query(
    "q_erasure",
    oracle="""
    WITH erase AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0),
    ev AS (
        SELECT 'events' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS rows_before,
               CAST(COUNT(*) FILTER (WHERE user_id IN (SELECT user_id
                    FROM erase)) AS BIGINT) AS rows_erased
        FROM events),
    feat AS (
        SELECT 'customer_features' AS table_name,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS rows_before,
               CAST(COUNT(DISTINCT user_id) FILTER (WHERE user_id IN
                    (SELECT user_id FROM erase)) AS BIGINT) AS rows_erased
        FROM events),
    u AS (SELECT * FROM ev UNION ALL SELECT * FROM feat)
    SELECT table_name, rows_before, rows_erased,
           rows_before - rows_erased AS rows_after,
           CAST(0 AS BIGINT) AS residual_refs
    FROM u
    """,
)
def q_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure (GDPR art. 17) propagation audit: delete a
    deterministic user set from the event log AND every derived table
    (here the per-user feature grain), then PROVE completeness — the
    audit row carries before/erased/after counts per table plus
    residual_refs, the number of erased-user rows still reachable
    after the delete (must be 0, and is computed from the post-delete
    frames, not assumed).

    Scale shape: the erasure set broadcasts (it is always small
    relative to the corpus); deletion is one broadcast anti-join per
    table — no shuffle of the fact table; the residual audit is a
    broadcast semi-join over the already-filtered result.  The same
    plan drives a MERGE DELETE against a bucketed production table
    (operators/merge.py pattern)."""
    ev = load_table(spark, sf_dir, "events")
    erase = ev.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    feats = ev.select("user_id").distinct()

    def audit(df: DataFrame, name: str) -> DataFrame:
        kept = df.join(F.broadcast(erase), "user_id", "left_anti")
        residual = kept.join(F.broadcast(erase), "user_id", "left_semi")
        before = df.agg(F.count("*").alias("rows_before"))
        after = kept.agg(F.count("*").alias("rows_after"))
        res = residual.agg(F.count("*").alias("residual_refs"))
        return (
            before.crossJoin(after)
            .crossJoin(res)
            .select(
                F.lit(name).alias("table_name"),
                "rows_before",
                (F.col("rows_before") - F.col("rows_after")).alias(
                    "rows_erased"
                ),
                "rows_after",
                "residual_refs",
            )
        )

    return audit(ev, "events").unionByName(
        audit(feats, "customer_features")
    )


_DP_EPS = 0.5  # per-release epsilon; sensitivity-1 counts


@query(
    "q_dp_counts",
    oracle=f"""
    WITH c AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM events GROUP BY event_type),
    u AS (
        SELECT event_type, exact_n,
               (('0x' || substr(md5(event_type || '|dp'), 1, 8))::BIGINT
                + 0.5) / 4294967296.0 AS u
        FROM c)
    SELECT event_type, exact_n,
           ROUND(exact_n + CASE WHEN u < 0.5
                 THEN  ln(2.0 * u)       / {_DP_EPS}
                 ELSE -ln(2.0 * (1.0 - u)) / {_DP_EPS} END, 6) AS noisy_n,
           ABS(ROUND(exact_n + CASE WHEN u < 0.5
                 THEN  ln(2.0 * u)       / {_DP_EPS}
                 ELSE -ln(2.0 * (1.0 - u)) / {_DP_EPS} END, 6) - exact_n)
               <= 20.0 AS within_bound
    FROM u
    """,
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism,
    sensitivity 1, eps=0.5): per-type event counts plus
    inverse-CDF-sampled Laplace(1/eps) noise, and a within-bound
    verdict (|noise| <= 20 = the 1-in-22000 tail at this eps) so the
    driver row certifies the mechanism's calibration.  exact_n is the
    AUDIT side of this test query — a production release publishes
    only noisy_n.

    The noise uniform here derives from md5 of the release key —
    DETERMINISTIC, so the oracle reproduces the release bit-for-bit
    and rerunning never burns extra privacy budget for the same
    release id; production DP swaps in a sealed RNG seeded per
    release, with everything else (sensitivity-1 aggregate, inverse
    CDF, post-processing) unchanged.  Scale shape: one partial
    aggregate; noise is a map-only expression on the tiny grouped
    result."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count("*").alias("exact_n"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("event_type"), F.lit("|dp")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    noise = F.when(
        u < 0.5, F.log(2.0 * u) / _DP_EPS
    ).otherwise(-F.log(2.0 * (1.0 - u)) / _DP_EPS)
    noisy = F.round(F.col("exact_n") + noise, 6)
    return c.select(
        "event_type",
        "exact_n",
        noisy.alias("noisy_n"),
        (F.abs(noisy - F.col("exact_n")) <= 20.0).alias("within_bound"),
    )


@query(
    "q_benford",
    oracle="""
    WITH d AS (
        SELECT substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS digit
        FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT digit, n, SUM(n) OVER () AS total FROM c)
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / total, 6) AS obs_freq,
           ROUND(log10(1.0 + CAST(1.0 AS DOUBLE)
                 / CAST(digit AS BIGINT)), 6) AS benford_freq,
           ROUND(power(CAST(n AS DOUBLE) / total
                 - log10(1.0 + CAST(1.0 AS DOUBLE) / CAST(digit AS BIGINT)),
                 2)
                 / log10(1.0 + CAST(1.0 AS DOUBLE) / CAST(digit AS BIGINT)),
                 9) AS chi_term
    FROM t
    """,
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    forensic-accounting / synthetic-data detector: natural multi-scale
    amounts follow P(d) = log10(1 + 1/d); per-digit deviation terms
    localize where a distribution breaks the law (TPC-H-style uniform
    prices break it loudly, which is exactly what the audit should
    report for generated data).

    The first digit comes from the STRING prefix of the value, not
    floor(x / 10^floor(log10 x)) — float log10 at exact powers of ten
    rounds differently per libm and misclassifies; shortest-repr
    double formatting agrees between engines on the leading digit by
    construction.  One aggregate; the 9-row total reuses a window over
    the grouped result (no 1-row broadcast needed)."""
    from pyspark.sql.window import Window as W

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    c = o.select(
        F.substring(F.col("o_totalprice").cast("string"), 1, 1).alias(
            "digit"
        )
    ).groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    t = c.withColumn(
        "total", F.sum("n").over(W.partitionBy(F.lit(1)))
    )
    obs = F.col("n").cast("double") / F.col("total")
    exp = F.log10(1.0 + F.lit(1.0) / F.col("digit").cast("long"))
    return t.select(
        "digit",
        "n",
        F.round(obs, 6).alias("obs_freq"),
        F.round(exp, 6).alias("benford_freq"),
        F.round(F.pow(obs - exp, 2) / exp, 9).alias("chi_term"),
    )


@query(
    "q_lorenz_gini",
    oracle="""
    WITH cust AS (
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    b AS (
        SELECT CASE WHEN v < 0 THEN CAST(0 AS BIGINT)
                    WHEN v >= 2000 THEN CAST(21 AS BIGINT)
                    ELSE CAST(FLOOR(v / 100.0) AS BIGINT) + 1 END AS bucket,
               v
        FROM cust),
    g AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_customers,
               SUM(CAST(v AS DECIMAL(28,6))) AS sv
        FROM b GROUP BY bucket),
    c AS (
        SELECT bucket, n_customers,
               CAST(SUM(n_customers) OVER w AS DOUBLE)
                   / SUM(n_customers) OVER () AS x,
               CAST(SUM(sv) OVER w AS DOUBLE)
                   / CAST(SUM(sv) OVER () AS DOUBLE) AS y
        FROM g
        WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)),
    t AS (
        SELECT bucket, n_customers, x, y,
               (x - COALESCE(LAG(x) OVER (ORDER BY bucket), 0.0))
               * (y + COALESCE(LAG(y) OVER (ORDER BY bucket), 0.0)) AS term
        FROM c)
    SELECT bucket, n_customers,
           ROUND(x, 6) AS cum_cust_share,
           ROUND(y, 6) AS cum_value_share,
           ROUND(1.0 - SUM(term) OVER (), 6) AS gini
    FROM t
    """,
)
def q_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve + Gini coefficient of customer-value concentration
    (how much revenue the top customers hold — the inequality lens on
    the CLV distribution).  Histogram-based: per-customer value folds
    into fixed 100-unit buckets, the Lorenz points are cumulative
    (customers, value) shares over the ~21-row bucket frame, and Gini
    is the trapezoid integral 1 - sum((x_i - x_{i-1})(y_i + y_{i-1})).

    Scale shape: one per-customer aggregate, one ~21-group aggregate;
    every window runs on the BUCKET frame (bounded by the bin count,
    never by customers) — the exact-rank Gini would need a global sort
    of all customers; the histogram version is the 100 TB formulation,
    with resolution set by bin width.  Bucket edges use the identical
    floor-division formula on both engines (q_histogram's pattern), so
    boundary values cannot flip bins."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cust = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("v")
    )
    bucket = (
        F.when(F.col("v") < 0, F.lit(0))
        .when(F.col("v") >= 2000, F.lit(21))
        .otherwise(F.floor(F.col("v") / 100.0) + 1)
        .cast("long")
    )
    g = cust.select(bucket.alias("bucket"), "v").groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum(F.col("v").cast("decimal(28,6)")).alias("sv"),
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy(F.lit(1))
    c = g.select(
        "bucket",
        "n_customers",
        (
            F.sum("n_customers").over(w).cast("double")
            / F.sum("n_customers").over(wall)
        ).alias("x"),
        (
            F.sum("sv").over(w).cast("double")
            / F.sum("sv").over(wall).cast("double")
        ).alias("y"),
    )
    lx = F.coalesce(F.lag("x").over(W.orderBy("bucket")), F.lit(0.0))
    ly = F.coalesce(F.lag("y").over(W.orderBy("bucket")), F.lit(0.0))
    t = c.select(
        "bucket",
        "n_customers",
        "x",
        "y",
        ((F.col("x") - lx) * (F.col("y") + ly)).alias("term"),
    )
    return t.select(
        "bucket",
        "n_customers",
        F.round("x", 6).alias("cum_cust_share"),
        F.round("y", 6).alias("cum_value_share"),
        F.round(F.lit(1.0) - F.sum("term").over(wall), 6).alias("gini"),
    )


@query(
    "q_pmi",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               string_split(
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')
                   AS ws
        FROM documents),
    uni AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(COUNT(*)) OVER () AS n_uni
        FROM (SELECT unnest(ws) AS token FROM toks)
        WHERE token <> '' GROUP BY token),
    bg AS (
        SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_ab,
               SUM(COUNT(*)) OVER () AS n_bg
        FROM (SELECT unnest(list_transform(range(1, len(ws)),
                     i -> ws[i] || ' ' || ws[i + 1])) AS bigram
              FROM toks WHERE len(ws) >= 2)
        GROUP BY bigram)
    SELECT bg.bigram, bg.n_ab,
           ROUND(log2((CAST(bg.n_ab AS DOUBLE) / bg.n_bg)
                 / ((CAST(a.n AS DOUBLE) / a.n_uni)
                    * (CAST(b.n AS DOUBLE) / b.n_uni))), 6) AS pmi
    FROM bg
    JOIN uni a ON a.token = string_split(bg.bigram, ' ')[1]
    JOIN uni b ON b.token = string_split(bg.bigram, ' ')[2]
    WHERE bg.n_ab >= 3
    """,
)
def q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent-token bigrams —
    collocation strength, the statistic behind phrase mining and
    tokenizer-merge candidate ranking: PMI = log2(p(ab) / (p(a)p(b)))
    with bigram and unigram probabilities from their own totals.

    Scale shape: one zip_with bigram explode (no self-join), unigram
    counts broadcast back onto the bigram frame; the totals ride
    windows over the COUNT frames (vocabulary- and vocabulary^2-
    bounded, never the corpus).  All PMI inputs are integer-count
    ratios — identical IEEE doubles on both engines — rounded after
    the one log2."""
    from pyspark.sql.window import Window as W

    from clv_data_pipeline_spark.functions.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.split(normalize_text(F.col("text")), " ").alias("ws")
    )
    wall = W.partitionBy(F.lit(1))
    uni = (
        toks.select(F.explode("ws").alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .withColumn("n_uni", F.sum("n").over(wall))
    )
    bg = (
        toks.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n_ab"))
        .withColumn("n_bg", F.sum("n_ab").over(wall))
        .filter(F.col("n_ab") >= 3)
    )
    wa = F.split(F.col("bigram"), " ").getItem(0)
    wb = F.split(F.col("bigram"), " ").getItem(1)
    a = uni.select(
        F.col("token").alias("_ta"),
        F.col("n").alias("_na"),
        F.col("n_uni").alias("_ua"),
    )
    b = uni.select(
        F.col("token").alias("_tb"),
        F.col("n").alias("_nb"),
        F.col("n_uni").alias("_ub"),
    )
    joined = (
        bg.withColumn("_wa", wa)
        .withColumn("_wb", wb)
        .join(F.broadcast(a), F.col("_wa") == F.col("_ta"))
        .join(F.broadcast(b), F.col("_wb") == F.col("_tb"))
    )
    pmi = F.log2(
        (F.col("n_ab").cast("double") / F.col("n_bg"))
        / (
            (F.col("_na").cast("double") / F.col("_ua"))
            * (F.col("_nb").cast("double") / F.col("_ub"))
        )
    )
    return joined.select("bigram", "n_ab", F.round(pmi, 6).alias("pmi"))


@query(
    "q_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id),
    sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY cohort_week),
    rev AS (
        SELECT f.cohort_week,
               date_diff('day', f.cohort_week,
                         date_trunc('week', e.ts)) // 7 AS age_week,
               SUM(CAST(e.value AS DECIMAL(18,4))) AS revenue
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2),
    cum AS (
        SELECT cohort_week, age_week, revenue,
               SUM(revenue) OVER (PARTITION BY cohort_week ORDER BY age_week
                   ROWS UNBOUNDED PRECEDING) AS cum_revenue
        FROM rev)
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(c.age_week AS BIGINT) AS age_week,
           ROUND(CAST(c.revenue AS DOUBLE), 2) AS revenue,
           ROUND(CAST(c.cum_revenue AS DOUBLE) / s.cohort_size, 4)
               AS cum_ltv_per_customer
    FROM cum c JOIN sizes s USING (cohort_week)
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — cumulative purchase revenue per acquisition
    cohort, normalized per cohort member by age week: the standard
    'how much is a week-N customer worth by week M' payback table that
    the CLV model's predictions are validated against.

    Scale shape: one per-user firsts aggregate (reused for cohort
    sizes), one (cohort, age) revenue aggregate with DECIMAL
    accumulation, then a running sum over the cohort-by-age frame —
    bounded by calendar^2, never by users; cohort sizes broadcast
    back."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id",
        "event_type",
        "value",
        F.date_trunc("week", "ts").alias("week"),
    )
    firsts = weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    rev = (
        weeks.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("long")
            .alias("age_week"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("revenue"))
    )
    wc = W.partitionBy("cohort_week").orderBy("age_week").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = rev.withColumn("cum_revenue", F.sum("revenue").over(wc))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "age_week",
        F.round(F.col("revenue").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("cum_revenue").cast("double") / F.col("cohort_size"), 4
        ).alias("cum_ltv_per_customer"),
    )


@query(
    "q_cuped",
    oracle="""
    WITH u AS (
        SELECT user_id,
               substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS grp_a,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND ts < TIMESTAMP '2024-01-15 00:00:00'
                    THEN CAST(value AS DECIMAL(18,4)) END),
                    CAST(0 AS DECIMAL(18,4))) AS x,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND ts >= TIMESTAMP '2024-01-15 00:00:00'
                    THEN CAST(value AS DECIMAL(18,4)) END),
                    CAST(0 AS DECIMAL(18,4))) AS y
        FROM events GROUP BY user_id),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM u),
    t AS (
        SELECT *,
               (sxy / n - (sx / n) * (sy / n))
                   / (sxx / n - (sx / n) * (sx / n)) AS theta
        FROM s),
    adj AS (
        SELECT u.grp_a, u.y,
               CAST(ROUND(CAST(u.y AS DOUBLE)
                    - t.theta * (CAST(u.x AS DOUBLE) - t.sx / t.n), 9)
                    AS DECIMAL(18,9)) AS yc
        FROM u CROSS JOIN t),
    v AS (
        SELECT CAST(SUM(yc * yc) AS DOUBLE) / COUNT(*)
               - POWER(CAST(SUM(yc) AS DOUBLE) / COUNT(*), 2) AS var_adj
        FROM adj)
    SELECT CASE WHEN a.grp_a THEN 'A' ELSE 'B' END AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(a.y AS DECIMAL(28,9))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_y,
           ROUND(CAST(SUM(a.yc) AS DOUBLE) / COUNT(*), 6) AS mean_y_cuped,
           ROUND(1.0 - v.var_adj
                 / (t.syy / t.n - (t.sy / t.n) * (t.sy / t.n)), 6)
               AS var_reduction
    FROM adj a CROSS JOIN v CROSS JOIN t
    GROUP BY a.grp_a, v.var_adj, t.syy, t.sy, t.n
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for experiment readouts (Deng et al.
    2013): adjust each user's post-period revenue by their PRE-period
    revenue (theta = cov(x,y)/var(x)), cutting metric variance without
    biasing the treatment contrast — the standard trick that makes
    small lifts detectable.  Groups come from the md5 hash split
    (deterministic, engine-portable); output is per-group raw vs
    adjusted means plus the achieved variance reduction (small, ~3%,
    on this synthetic data where pre/post revenue are nearly
    independent; real commerce data correlates strongly and sees
    30-50%).

    Determinism: all moments accumulate as EXACT decimals (x, y are
    DECIMAL sums; their products stay decimal); theta and the
    adjustment are identical IEEE expressions; adjusted values round
    at 9 dp before the decimal re-aggregation.  Scale shape: one
    per-user aggregate, 1-row stats broadcasts, map-only adjustment —
    no window over users anywhere."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit("2024-01-15 00:00:00").cast("timestamp")
    d4 = "decimal(18,4)"
    u = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") < split),
                    F.col("value").cast(d4),
                )
            ),
            F.lit(0).cast(d4),
        ).alias("x"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= split),
                    F.col("value").cast(d4),
                )
            ),
            F.lit(0).cast(d4),
        ).alias("y"),
    ).withColumn(
        "grp_a",
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
    )
    s = u.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    t = s.withColumn(
        "theta",
        (F.col("sxy") / F.col("n") - (F.col("sx") / F.col("n"))
         * (F.col("sy") / F.col("n")))
        / (F.col("sxx") / F.col("n")
           - (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))),
    )
    adj = u.crossJoin(F.broadcast(t)).select(
        "grp_a",
        "y",
        "syy",
        "sy",
        "n",
        # DECIMAL(18,9): yc*yc must fit precision 38 exactly ((18,9)^2
        # -> (37,18)); larger operand precisions make each engine
        # truncate the product differently (see q_zipf_fit)
        F.round(
            F.col("y").cast("double")
            - F.col("theta")
            * (F.col("x").cast("double") - F.col("sx") / F.col("n")),
            9,
        )
        .cast("decimal(18,9)")
        .alias("yc"),
    )
    v = adj.agg(
        (
            F.sum(F.col("yc") * F.col("yc")).cast("double") / F.count("*")
            - F.pow(F.sum("yc").cast("double") / F.count("*"), 2)
        ).alias("var_adj")
    )
    return (
        adj.crossJoin(F.broadcast(v))
        .groupBy("grp_a", "var_adj", "syy", "sy", "n")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(
                F.sum(F.col("y").cast("decimal(28,9)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_y"),
            F.round(
                F.sum("yc").cast("double") / F.count("*"), 6
            ).alias("mean_y_cuped"),
        )
        .select(
            F.when(F.col("grp_a"), "A").otherwise("B").alias("grp"),
            "n_users",
            "mean_y",
            "mean_y_cuped",
            F.round(
                F.lit(1.0)
                - F.col("var_adj")
                / (
                    F.col("syy") / F.col("n")
                    - (F.col("sy") / F.col("n")) * (F.col("sy") / F.col("n"))
                ),
                6,
            ).alias("var_reduction"),
        )
    )


@query(
    "q_bootstrap",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    reps AS (
        SELECT u.user_id, u.v, r.b,
               (('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '|'
                    || CAST(r.b AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                   / 4294967296.0 AS p
        FROM u CROSS JOIN (SELECT unnest(range(100)) AS b) r),
    m AS (
        SELECT b,
               CASE WHEN p < 0.367879441 THEN 0
                    WHEN p < 0.735758882 THEN 1
                    WHEN p < 0.919698603 THEN 2
                    WHEN p < 0.981011843 THEN 3
                    WHEN p < 0.996340153 THEN 4 ELSE 5 END AS mult,
               v
        FROM reps),
    means AS (
        SELECT b,
               CAST(SUM(CAST(ROUND(mult * v, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) / SUM(mult) AS rep_mean
        FROM m GROUP BY b HAVING SUM(mult) > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
           ROUND(CAST(quantile_cont(rep_mean, 0.025) AS DOUBLE), 6)
               AS ci_lo,
           ROUND(CAST(quantile_cont(rep_mean, 0.5) AS DOUBLE), 6)
               AS ci_mid,
           ROUND(CAST(quantile_cont(rep_mean, 0.975) AS DOUBLE), 6)
               AS ci_hi
    FROM means
    """,
)
def q_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for mean customer value —
    THE resampling technique that survives scale (Chamandy et al.,
    Google 2012): instead of drawing n-out-of-n samples (impossible
    distributed), each row gets an independent Poisson(1) multiplicity
    per replicate, so 100 replicates are one map-side 100x expand +
    one aggregate — no shuffling of resampled data, no coordination.

    Multiplicities come from inverse-CDF thresholds on md5 uniforms
    (engine-portable, like q_minhash_weighted's race), making the
    whole bootstrap deterministic and oracle-checkable; production
    swaps a seeded RNG with everything else unchanged.  Replicate
    means accumulate rounded products as DECIMAL; the CI quantiles run
    on the 100-row replicate frame."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    u = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("v")
    )
    reps = u.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(99))))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("|"),
                    F.col("b").cast("string"),
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    p = (h + F.lit(0.5)) / F.lit(4294967296.0)
    mult = (
        F.when(p < 0.367879441, 0)
        .when(p < 0.735758882, 1)
        .when(p < 0.919698603, 2)
        .when(p < 0.981011843, 3)
        .when(p < 0.996340153, 4)
        .otherwise(5)
    )
    m = reps.select("b", mult.alias("mult"), "v")
    means = (
        m.groupBy("b")
        .agg(
            F.sum(
                F.round(F.col("mult") * F.col("v"), 6).cast("decimal(28,6)")
            ).alias("_s"),
            F.sum("mult").alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .select((F.col("_s").cast("double") / F.col("_n")).alias("rep_mean"))
    )
    return means.agg(
        F.count("*").cast("long").alias("n_replicates"),
        F.round(F.percentile("rep_mean", 0.025), 6).alias("ci_lo"),
        F.round(F.percentile("rep_mean", 0.5), 6).alias("ci_mid"),
        F.round(F.percentile("rep_mean", 0.975), 6).alias("ci_hi"),
    )


@query(
    "q_l_diversity",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT FLOOR(c_acctbal / 2000.0)) AS BIGINT)
               AS l_distinct,
           COUNT(DISTINCT FLOOR(c_acctbal / 2000.0)) >= 5 AS diverse
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary complement: a
    quasi-identifier group can be large (k-safe) yet still leak if
    everyone in it shares the same sensitive value.  Reports every
    (nation, segment) group with the distinct-value count of its
    sensitive attribute (account-balance band) and the l >= 5
    verdict (l = 3 is vacuously met by every group even at sf0.01 —
    round-8 degeneracy audit; at larger SFs every group genuinely
    saturates all bands, which is the true answer, not a bug) — the full audit table, so the release decision (and the
    driver hash) sees passing and failing groups alike.  Same single
    partial-aggregated group-by shape as q_k_anonymity, with the
    distinct-count folded into the aggregate."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 2000.0)
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("group_size"),
            F.countDistinct(band).cast("long").alias("l_distinct"),
        )
        .select(
            F.col("c_nationkey").cast("long"),
            "c_mktsegment",
            "group_size",
            "l_distinct",
            (F.col("l_distinct") >= 5).alias("diverse"),
        )
    )


@query(
    "q_t_closeness",
    oracle="""
    WITH gb AS (
        SELECT c_nationkey, c_mktsegment,
               FLOOR(c_acctbal / 2000.0) AS band,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM customer GROUP BY c_nationkey, c_mktsegment, band),
    g AS (
        SELECT c_nationkey, c_mktsegment, band, cnt,
               SUM(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment)
                   AS group_size
        FROM gb),
    b AS (
        SELECT band, SUM(cnt) AS bn, SUM(SUM(cnt)) OVER () AS n
        FROM gb GROUP BY band),
    parts AS (
        SELECT g.c_nationkey, g.c_mktsegment, g.group_size, b.n,
               SUM(ABS(g.cnt * b.n - b.bn * g.group_size)) AS moved,
               SUM(b.bn) AS covered
        FROM g JOIN b USING (band)
        GROUP BY g.c_nationkey, g.c_mktsegment, g.group_size, b.n)
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
           CAST(group_size AS BIGINT) AS group_size,
           CAST((CAST(moved + group_size * (n - covered) AS HUGEINT)
                 * 1000000 + group_size * n)
                // (2 * CAST(group_size AS HUGEINT) * n) AS BIGINT)
               AS tvd_ppm,
           CAST((CAST(moved + group_size * (n - covered) AS HUGEINT)
                 * 1000000 + group_size * n)
                // (2 * CAST(group_size AS HUGEINT) * n) AS BIGINT)
               <= 200000 AS close
    FROM parts
    """,
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third privacy gate after q_k_anonymity
    and q_l_diversity: a group passes iff the distribution of its
    sensitive attribute (acctbal band) is within total-variation
    distance t=0.2 of the GLOBAL distribution (a group can be k-large
    and l-diverse yet still skewed enough to leak).  Grid-free TVD:
    over a group's OBSERVED bands sum |p_group - p_global|, and bands
    absent from the group contribute their full global mass — exactly
    (1 - covered global mass) — so no (group x band) zero-fill grid
    ever materializes.  One (group, band) partial-agg shuffle; the
    band-level global distribution is six rows and broadcasts.

    Determinism: TVD rationals here routinely land EXACTLY on 6-digit
    round-half boundaries (small integer denominators x the 1/2
    factor), where double rounding diverges across engines — so the
    result is pure integer arithmetic end to end: TVD in parts-per-
    million = (moved*1e6 + den) DIV (2*den) with
    moved = sum |cnt*n - bn*gs| + gs*(n - covered), den = gs*n, run in
    DECIMAL(38,0)/HUGEINT so it is exact at any corpus size."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 2000.0)
    gb = (
        c.groupBy("c_nationkey", "c_mktsegment", band.alias("band"))
        .agg(F.count("*").alias("cnt"))
    )
    g = gb.withColumn(
        "group_size",
        F.sum("cnt").over(
            Window.partitionBy("c_nationkey", "c_mktsegment")
        ),
    )
    b = (
        gb.groupBy("band")
        .agg(F.sum("cnt").alias("bn"))
        .withColumn("n", F.sum("bn").over(Window.partitionBy()))
    )
    parts = (
        g.join(F.broadcast(b), "band")
        .groupBy("c_nationkey", "c_mktsegment", "group_size", "n")
        .agg(
            F.sum(
                F.abs(F.col("cnt") * F.col("n")
                      - F.col("bn") * F.col("group_size"))
            ).alias("moved"),
            F.sum("bn").alias("covered"),
        )
    )
    # integral DIV, not decimal '/': Spark's decimal division rounds at
    # the derived result scale, which can flip the half-up boundary the
    # +den term encodes; DIV is the exact integral quotient.
    tvd_ppm = F.expr(
        "CAST((CAST(moved + group_size * (n - covered) AS DECIMAL(38,0))"
        " * 1000000 + CAST(group_size AS DECIMAL(38,0)) * n)"
        " DIV (2 * CAST(group_size AS DECIMAL(38,0)) * n) AS BIGINT)"
    )
    return parts.select(
        F.col("c_nationkey").cast("long"),
        "c_mktsegment",
        F.col("group_size").cast("long"),
        tvd_ppm.alias("tvd_ppm"),
    ).withColumn("close", F.col("tvd_ppm") <= 200000)


@query(
    "q_recursive_cte",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT CAST(doc_id AS BIGINT) AS node,
               CASE WHEN doc_id = 0 THEN NULL
                    ELSE CAST((doc_id - 1) // 2 AS BIGINT) END AS parent
        FROM documents),
    walk AS (
        SELECT node, node AS cur, CAST(0 AS BIGINT) AS depth,
               CAST(node AS VARCHAR) AS path
        FROM edges
        UNION ALL
        SELECT w.node, e.parent, w.depth + 1,
               CAST(e.parent AS VARCHAR) || '/' || w.path
        FROM walk w JOIN edges e ON w.cur = e.node
        WHERE e.parent IS NOT NULL)
    SELECT node AS doc_id,
           CAST(MAX(depth) AS BIGINT) AS depth,
           arg_max(path, depth) AS path
    FROM walk GROUP BY node
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE `WITH RECURSIVE` on the Spark engine (new in Spark 4):
    the same binary-heap ancestor traversal as q_tree_paths, but
    declared recursively and executed by Spark's own recursion
    runtime — one equi-join per level, depth-bounded by
    spark.sql.cteRecursionLevelLimit.  q_tree_paths' hand-unrolled
    pointer-halving form remains the extreme-depth strategy (log2 D
    rounds vs D here); this query closes the SQL-surface gap so a
    BigQuery/DuckDB user's recursive query runs verbatim.  The oracle
    is the SAME recursive CTE on DuckDB's executor — two genuine
    recursion engines hash-compared."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        """
        WITH RECURSIVE edges AS (
            SELECT CAST(doc_id AS BIGINT) AS node,
                   CASE WHEN doc_id = 0 THEN NULL
                        ELSE CAST((doc_id - 1) DIV 2 AS BIGINT) END
                       AS parent
            FROM documents),
        walk AS (
            SELECT node, node AS cur, CAST(0 AS BIGINT) AS depth,
                   CAST(node AS STRING) AS path
            FROM edges
            UNION ALL
            SELECT w.node, e.parent, w.depth + CAST(1 AS BIGINT),
                   CAST(e.parent AS STRING) || '/' || w.path
            FROM walk w JOIN edges e ON w.cur = e.node
            WHERE e.parent IS NOT NULL)
        SELECT node AS doc_id,
               CAST(MAX(depth) AS BIGINT) AS depth,
               max_by(path, depth) AS path
        FROM walk GROUP BY node
        """
    )


@query(
    "q_ks_test",
    oracle="""
    WITH s AS (
        SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
    b AS (
        SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                    THEN 0 ELSE 1 END AS grp,
               LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 100.0))
                          AS BIGINT), 99) AS bin
        FROM events, s),
    c AS (
        SELECT bin,
               CAST(COUNT(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS n_a,
               CAST(COUNT(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS n_b
        FROM b GROUP BY bin),
    e AS (
        SELECT bin, n_a, n_b,
               SUM(n_a) OVER w AS ca, SUM(n_b) OVER w AS cb,
               SUM(n_a) OVER () AS na, SUM(n_b) OVER () AS nb
        FROM c WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)),
    d AS (
        SELECT MAX(ABS(CAST(ca AS DOUBLE) / na
                       - CAST(cb AS DOUBLE) / nb)) AS ks,
               CAST(MAX(na) AS BIGINT) AS n_a,
               CAST(MAX(nb) AS BIGINT) AS n_b
        FROM e)
    SELECT ROUND(ks, 6) AS ks_stat, n_a, n_b,
           ROUND(1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
                              / (CAST(n_a AS DOUBLE) * n_b)), 6)
               AS crit_05,
           CAST(ks > 1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
                                  / (CAST(n_a AS DOUBLE) * n_b))
                AS BIGINT) AS reject_05
    FROM d
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between event periods
    — completes the drift battery (PSI for binned population shift,
    chi-square for categorical independence, KS for continuous
    distribution equality) in the histogram formulation: ECDFs come
    from cumulative sums over a 100-bin frame, so the sup-distance
    costs bounded windows, never a global value sort; the binned KS
    statistic lower-bounds the exact one (resolution 1/100 of the
    value range).  Integer cumulative counts make the statistic
    engine-exact; the 1.358 coefficient is the alpha=0.05
    Smirnov critical value."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    s = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    b = ev.crossJoin(F.broadcast(s)).select(
        F.when(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("grp"),
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / 100.0)
            ).cast("long"),
            F.lit(99),
        ).alias("bin"),
    )
    c = b.groupBy("bin").agg(
        F.count(F.when(F.col("grp") == 0, 1)).cast("long").alias("n_a"),
        F.count(F.when(F.col("grp") == 1, 1)).cast("long").alias("n_b"),
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy(F.lit(1))
    e = c.select(
        F.sum("n_a").over(w).alias("ca"),
        F.sum("n_b").over(w).alias("cb"),
        F.sum("n_a").over(wall).alias("na"),
        F.sum("n_b").over(wall).alias("nb"),
    )
    d = e.agg(
        F.max(
            F.abs(
                F.col("ca").cast("double") / F.col("na")
                - F.col("cb").cast("double") / F.col("nb")
            )
        ).alias("ks"),
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
    )
    crit = 1.358 * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b"))
    )
    return d.select(
        F.round(F.col("ks"), 6).alias("ks_stat"),
        "n_a",
        "n_b",
        F.round(crit, 6).alias("crit_05"),
        (F.col("ks") > crit).cast("long").alias("reject_05"),
    )


@query(
    "q_mannwhitney",
    oracle="""
    WITH g AS (
        SELECT CAST(l_quantity AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS grp
        FROM lineitem WHERE l_returnflag IN ('R', 'N')),
    c AS (
        SELECT v,
               CAST(COUNT(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) AS n0,
               CAST(COUNT(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) AS n1
        FROM g GROUP BY v),
    e AS (
        SELECT v, n0, n1,
               COALESCE(SUM(n1) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS c1_below,
               SUM(n0) OVER () AS na, SUM(n1) OVER () AS nb,
               SUM((n0 + n1) * (n0 + n1) * (n0 + n1) - (n0 + n1))
                   OVER () AS tie3
        FROM c),
    u AS (
        SELECT CAST(MAX(na) AS BIGINT) AS na,
               CAST(MAX(nb) AS BIGINT) AS nb,
               CAST(MAX(tie3) AS BIGINT) AS tie3,
               CAST(SUM(n0 * (2 * c1_below + n1)) AS BIGINT) AS u2x
        FROM e)
    SELECT na, nb,
           ROUND(u2x / 2.0, 1) AS u_stat,
           ROUND((u2x / 2.0 - CAST(na AS DOUBLE) * nb / 2.0)
                 / sqrt(CAST(na AS DOUBLE) * nb / 12.0
                        * ((na + nb + 1)
                           - CAST(tie3 AS DOUBLE)
                             / ((na + nb) * (na + nb - 1.0)))), 6)
               AS z,
           CAST(ABS((u2x / 2.0 - CAST(na AS DOUBLE) * nb / 2.0)
                 / sqrt(CAST(na AS DOUBLE) * nb / 12.0
                        * ((na + nb + 1)
                           - CAST(tie3 AS DOUBLE)
                             / ((na + nb) * (na + nb - 1.0))))) > 1.96
                AS BIGINT) AS reject_05
    FROM u
    """,
)
def q_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U — the nonparametric two-sample location test
    beside Welch's t (q_ab_test): does returned-lineitem quantity
    stochastically dominate non-returned?  EXACT, not approximate:
    l_quantity's small integer domain means U computes from per-value
    counts — U = sum over values of n0_v x (count of group-1 below +
    half the ties) — as pure integers (doubled to dodge the .5), with
    the normal approximation's tie-corrected variance also exact-
    integer until one final sqrt.  One 50-row value-count shuffle,
    bounded windows; no rank sort of 600k rows anywhere."""
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    g = li.select(
        F.col("l_quantity").cast("long").alias("v"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("grp"),
    )
    c = g.groupBy("v").agg(
        F.count(F.when(F.col("grp") == 0, 1)).cast("long").alias("n0"),
        F.count(F.when(F.col("grp") == 1, 1)).cast("long").alias("n1"),
    )
    wb = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    wall = W.partitionBy(F.lit(1))
    t = F.col("n0") + F.col("n1")
    e = c.select(
        "n0",
        "n1",
        F.coalesce(F.sum("n1").over(wb), F.lit(0)).alias("c1_below"),
        F.sum("n0").over(wall).alias("na"),
        F.sum("n1").over(wall).alias("nb"),
        F.sum(t * t * t - t).over(wall).alias("tie3"),
    )
    u = e.agg(
        F.max("na").cast("long").alias("na"),
        F.max("nb").cast("long").alias("nb"),
        F.max("tie3").cast("long").alias("tie3"),
        F.sum(F.col("n0") * (2 * F.col("c1_below") + F.col("n1")))
        .cast("long")
        .alias("u2x"),
    )
    mean = F.col("na").cast("double") * F.col("nb") / 2.0
    var = (
        F.col("na").cast("double")
        * F.col("nb")
        / 12.0
        * (
            (F.col("na") + F.col("nb") + 1)
            - F.col("tie3").cast("double")
            / ((F.col("na") + F.col("nb")) * (F.col("na") + F.col("nb") - 1.0))
        )
    )
    z = (F.col("u2x") / 2.0 - mean) / F.sqrt(var)
    return u.select(
        "na",
        "nb",
        F.round(F.col("u2x") / 2.0, 1).alias("u_stat"),
        F.round(z, 6).alias("z"),
        (F.abs(z) > 1.96).cast("long").alias("reject_05"),
    )


@query(
    "q_grouped_bootstrap",
    oracle="""
    WITH ev AS (
        SELECT user_id, CAST(value AS DECIMAL(18,4)) AS v
        FROM events WHERE event_type = 'purchase'),
    reps AS (
        SELECT ev.user_id, ev.v, r.b,
               (('0x' || substr(md5(CAST(ev.user_id AS VARCHAR) || '#'
                    || CAST(r.b AS VARCHAR)), 1, 8))::BIGINT + 0.5)
                   / 4294967296.0 AS p
        FROM ev CROSS JOIN (SELECT unnest(range(100)) AS b) r),
    m AS (
        SELECT b,
               CASE WHEN p < 0.367879441 THEN 0
                    WHEN p < 0.735758882 THEN 1
                    WHEN p < 0.919698603 THEN 2
                    WHEN p < 0.981011843 THEN 3
                    WHEN p < 0.996340153 THEN 4 ELSE 5 END AS mult,
               v
        FROM reps),
    means AS (
        SELECT b,
               CAST(SUM(CAST(ROUND(mult * v, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) / SUM(mult) AS rep_mean
        FROM m GROUP BY b HAVING SUM(mult) > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
           ROUND(CAST(quantile_cont(rep_mean, 0.025) AS DOUBLE), 6)
               AS ci_lo,
           ROUND(CAST(quantile_cont(rep_mean, 0.5) AS DOUBLE), 6)
               AS ci_mid,
           ROUND(CAST(quantile_cont(rep_mean, 0.975) AS DOUBLE), 6)
               AS ci_hi
    FROM means
    """,
)
def q_grouped_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER (user-level) Poisson bootstrap CI for mean purchase
    value — the statistically honest variant when observations within
    a user are correlated: q_bootstrap resamples customer TOTALS, and
    an event-level bootstrap would treat a user's purchases as
    independent, understating the variance; here the multiplicity
    hashes ONLY the user id per replicate, so every purchase of a user
    rides the same draw and whole clusters resample together (the CI
    that survives a referee).  Same map-side-only cost shape: the
    multiplicity is a column expression, replicate means accumulate
    rounded products as DECIMAL, and the CI quantiles run on the
    100-row replicate frame."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    reps = ev.select(
        "user_id", F.col("value").cast("decimal(18,4)").alias("v")
    ).withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(99))))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("#"),
                    F.col("b").cast("string"),
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    p = (h + F.lit(0.5)) / F.lit(4294967296.0)
    mult = (
        F.when(p < 0.367879441, 0)
        .when(p < 0.735758882, 1)
        .when(p < 0.919698603, 2)
        .when(p < 0.981011843, 3)
        .when(p < 0.996340153, 4)
        .otherwise(5)
    )
    means = (
        reps.select("b", mult.alias("mult"), "v")
        .groupBy("b")
        .agg(
            F.sum(
                F.round(F.col("mult") * F.col("v"), 6).cast("decimal(28,6)")
            ).alias("_s"),
            F.sum("mult").alias("_n"),
        )
        .filter(F.col("_n") > 0)
        .select(
            (F.col("_s").cast("double") / F.col("_n")).alias("rep_mean")
        )
    )
    return means.agg(
        F.count("*").cast("long").alias("n_replicates"),
        F.round(F.percentile("rep_mean", 0.025), 6).alias("ci_lo"),
        F.round(F.percentile("rep_mean", 0.5), 6).alias("ci_mid"),
        F.round(F.percentile("rep_mean", 0.975), 6).alias("ci_hi"),
    )


def _bradley_terry_oracle(iters: int = 5) -> str:
    """Unrolled MM-iteration CTE chain (the q_pagerank discipline):
    DuckDB replays the exact fixed trajectory the Spark operator runs —
    per-iteration terms rounded to 12 decimals and summed as DECIMAL,
    so both engines' iterates are pinned bit-for-bit."""
    pis = []
    for k in range(1, iters + 1):
        pis.append(f"""
    pi{k} AS (
        SELECT w.i,
               CASE WHEN d.D > 0
                    THEN ROUND(w.W / CAST(d.D AS DOUBLE), 12)
                    ELSE CAST(0 AS DOUBLE) END AS pi
        FROM wins w JOIN (
            SELECT s.i,
                   SUM(CAST(ROUND(s.n / (pa.pi + pb.pi), 12)
                        AS DECIMAL(28,12))) AS D
            FROM sym s
            JOIN pi{k - 1} pa ON s.i = pa.i
            JOIN pi{k - 1} pb ON s.j = pb.i
            GROUP BY s.i) d ON w.i = d.i)""")
    return f"""
    WITH bq AS (
        SELECT l.l_orderkey AS o, p.p_brand AS b,
               SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS q
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2),
    duels AS (
        SELECT a.b AS i, bb.b AS j,
               CASE WHEN a.q > bb.q THEN 1 ELSE 0 END AS wi,
               CASE WHEN a.q < bb.q THEN 1 ELSE 0 END AS wj
        FROM bq a JOIN bq bb ON a.o = bb.o AND a.b < bb.b),
    m AS (
        SELECT i, j, CAST(SUM(wi + wj) AS DOUBLE) AS n,
               CAST(SUM(wi) AS DOUBLE) AS wi
        FROM duels GROUP BY i, j HAVING SUM(wi + wj) > 0),
    sym AS (
        SELECT i, j, n, wi AS w FROM m
        UNION ALL SELECT j, i, n, n - wi FROM m),
    wins AS (SELECT i, SUM(w) AS W FROM sym GROUP BY i),
    totals AS (SELECT i, SUM(n) AS T FROM sym GROUP BY i),
    pi0 AS (SELECT DISTINCT i, CAST(1 AS DOUBLE) AS pi FROM sym),
    {','.join(pis)}
    SELECT p.i AS brand,
           CAST(t.T AS BIGINT) AS n_matches,
           CAST(w.W AS BIGINT) AS wins,
           ROUND(p.pi, 6) AS strength
    FROM pi{iters} p JOIN wins w ON p.i = w.i
    JOIN totals t ON p.i = t.i
    """


@query("q_bradley_terry", oracle=_bradley_terry_oracle())
def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths over brand "duels" — the
    model behind chatbot-arena Elo boards and judge-vote aggregation,
    run here on purchase behavior: within each order, the brand with
    the larger total quantity beats the smaller (exact DECIMAL sums so
    the duel outcomes are engine-deterministic; ties are no-contests),
    then 5 MM iterations (Hunter 2004) fit the strengths.

    Scale shape: the corpus-sized work is one (order, brand) aggregate
    and a within-order pair join (orders hold few distinct brands, so
    pair volume is per-order-bounded, never corpus-quadratic); the MM
    loop then runs on the brand-pair table — bounded by the item
    vocabulary like the ALS item step — with a localCheckpoint barrier
    per iteration.  The oracle unrolls the identical 5-iteration
    trajectory in chained CTEs, hash-verifying the iterative fit end
    to end (q_pagerank's discipline)."""
    from clv_data_pipeline_spark.operators.recsys import bradley_terry

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bq = (
        li.join(F.broadcast(pt), li["l_partkey"] == pt["p_partkey"])
        .groupBy(
            F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q")
        )
    )
    # pair expansion via per-order collect_list (the q_market_basket
    # discipline): orders hold few distinct brands, so exploding the
    # in-order combination pairs costs one shuffle of bq and no
    # self-join — the bq x bq join formulation measured 2x slower at
    # sf0.1.  Pair SETS are list-order independent, and win indicators
    # derive from the (least, greatest) normalization, so the duel
    # table is deterministic under any collect_list order.
    per_order = bq.groupBy("o").agg(
        F.collect_list(F.struct(F.col("b"), F.col("q"))).alias("bs")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> "
                "transform(slice(bs, i + 2, size(bs) - i - 1), "
                "y -> struct(x.b AS ba, x.q AS qa, "
                "y.b AS bb, y.q AS qb))))"
            )
        ).alias("p")
    )
    qi = F.when(
        F.col("p.ba") < F.col("p.bb"), F.col("p.qa")
    ).otherwise(F.col("p.qb"))
    qj = F.when(
        F.col("p.ba") < F.col("p.bb"), F.col("p.qb")
    ).otherwise(F.col("p.qa"))
    duels = pairs.select(
        F.least("p.ba", "p.bb").alias("i"),
        F.greatest("p.ba", "p.bb").alias("j"),
        F.when(qi > qj, 1).otherwise(0).alias("wi"),
        F.when(qi < qj, 1).otherwise(0).alias("wj"),
    )
    m = (
        duels.groupBy("i", "j")
        .agg(
            F.sum(F.col("wi") + F.col("wj")).cast("double").alias("n"),
            F.sum("wi").cast("double").alias("wins_i"),
        )
        .filter(F.col("n") > 0)
        # two consumers (the MM fit-barrier collect and the stats
        # join) — checkpoint the 300-row frame so the corpus-sized
        # duel chain executes once, not per consumer
        .localCheckpoint(eager=True)
    )
    pi = bradley_terry(m, iters=5)
    sym = m.select("i", "n", F.col("wins_i").alias("w")).unionByName(
        m.select(
            F.col("j").alias("i"), "n", (F.col("n") - F.col("wins_i")).alias("w")
        )
    )
    stats = sym.groupBy("i").agg(
        F.sum("n").cast("long").alias("n_matches"),
        F.sum("w").cast("long").alias("wins"),
    )
    return pi.join(stats, "i").select(
        F.col("i").alias("brand"),
        "n_matches",
        "wins",
        F.round("pi", 6).alias("strength"),
    )


@query(
    "q_skyline",
    oracle="""
    WITH base AS (
        SELECT o_custkey AS customer_id,
               CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                              DATE '2002-01-01') AS BIGINT)
                   AS recency_days,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                          AS DOUBLE), 2) AS monetary
        FROM orders GROUP BY o_custkey)
    SELECT p.customer_id, p.recency_days, p.monetary
    FROM base p
    WHERE NOT EXISTS (
        SELECT 1 FROM base q
        WHERE q.recency_days <= p.recency_days
          AND q.monetary >= p.monetary
          AND (q.recency_days < p.recency_days
               OR q.monetary > p.monetary))
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of customers on recency-vs-spend: no
    other customer is both at least as recent AND at least as valuable
    (strictly better on one) — the "best tradeoffs" segmentation a CRM
    shortlist uses.  The oracle runs the textbook all-pairs NOT EXISTS
    domination; the engine runs the bucket-pruned distributed shape
    (operators/skyline.py): a 1-row (min,max) broadcast fixes 1024
    recency buckets, per-bucket spend maxima cumulate on a B-row frame
    and broadcast back to prune almost everything map-side, and exact
    domination resolves per bucket with running-max windows — never a
    global sort, never a pairwise join."""
    od = load_table(spark, sf_dir, "orders")
    base = od.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.datediff(
            F.lit("2002-01-01").cast("date"),
            F.to_date(F.max("o_orderdate")),
        )
        .cast("long")
        .alias("recency_days"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                "double"
            ),
            2,
        ).alias("monetary"),
    )
    from clv_data_pipeline_spark.operators.skyline import skyline_2d

    return skyline_2d(base, "recency_days", "monetary")


@query(
    "q_null_safe_join",
    oracle="""
    WITH d AS (
        SELECT doc_id, NULLIF(lang, 'de') AS lang_key FROM documents),
    g AS (
        SELECT lang_key, CAST(COUNT(*) AS BIGINT) AS group_size
        FROM d GROUP BY lang_key)
    SELECT d.doc_id, COALESCE(d.lang_key, '<null>') AS lang_key,
           g.group_size
    FROM d JOIN g ON d.lang_key IS NOT DISTINCT FROM g.lang_key
    """,
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM) — the join
    variant ETL needs when a key column legitimately carries NULL as a
    value ("unknown" buckets, optional dimensions): plain equality
    silently drops those rows, null-safe equality groups them.  Here
    'de' docs are nulled into an unknown bucket and each doc joins back
    its group size INCLUDING the null group.  Catalyst plans <=> as a
    hash join on a null-coalesced key (no BNLJ), so the shape scales
    exactly like a plain equi-join."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.nullif(F.col("lang"), F.lit("de")).alias("lang_key"),
    )
    g = d.groupBy("lang_key").agg(
        F.count("*").cast("long").alias("group_size")
    )
    gg = g.select(
        F.col("lang_key").alias("_gk"), "group_size"
    )
    return (
        d.join(gg, d["lang_key"].eqNullSafe(F.col("_gk")))
        .select(
            "doc_id",
            F.coalesce(F.col("lang_key"), F.lit("<null>")).alias(
                "lang_key"
            ),
            "group_size",
        )
    )


_DPQ_EPS = 1.0
_DPQ_BIN = 0.25


@query(
    "q_dp_histogram",
    oracle="""
    WITH c AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang, source),
    h AS (
        SELECT lang, source, n_docs,
               ('0x' || substr(md5(lang || '|' || source || '|dp'),
                               1, 8))::BIGINT AS h1,
               ('0x' || substr(md5(lang || '|' || source || '|dp'),
                               9, 8))::BIGINT AS h2
        FROM c),
    noised AS (
        SELECT lang, source, n_docs,
               LEAST(bit_count((h1 & -h1) - 1), 32)
               - LEAST(bit_count((h2 & -h2) - 1), 32) AS noise
        FROM h)
    SELECT lang, source, n_docs, CAST(noise AS BIGINT) AS noise,
           CAST(GREATEST(n_docs + noise, 0) AS BIGINT) AS noisy_count,
           ROUND(ln(2.0), 6) AS epsilon
    FROM noised
    """,
)
def q_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release (per-(lang, source)
    contingency cell counts — the per-source marginal is uniform by
    synthesis, so the cell grid is the release whose counts actually
    vary) under the two-sided GEOMETRIC mechanism — the discrete
    twin of Laplace noise, and the right one for counts because the
    release stays integral: noise = Geom(1/2) - Geom(1/2), a discrete
    Laplace with alpha = 1/2, giving epsilon = ln 2 per unit
    sensitivity.  Negative releases clamp to 0 (standard
    post-processing, privacy-free).

    Engine-portable by construction: the geometric draws are the
    TRAILING-ZERO counts of two md5-derived 32-bit integers
    (P(tz = k) = 2^-(k+1) exactly), so the whole mechanism is integer
    arithmetic — bit_count((h & -h) - 1) — with zero float ops to
    disagree on.  The fixed seed makes the release replayable for
    this audit (and hash-verifiable against DuckDB); a production
    release would draw the seed per publication.

    Scale shape: one partial-aggregable count shuffle; the noise is a
    per-group column expression — map-only after the agg, no driver
    involvement at any cardinality."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    seed = F.md5(
        F.concat(F.col("lang"), F.lit("|"), F.col("source"), F.lit("|dp"))
    )
    h = c.select(
        "lang",
        "source",
        "n_docs",
        F.conv(F.substring(seed, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(seed, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    tz = "least(bit_count(({0} & -{0}) - 1), 32)"
    noised = h.select(
        "lang",
        "source",
        "n_docs",
        (
            F.expr(tz.format("h1")) - F.expr(tz.format("h2"))
        ).cast("long").alias("noise"),
    )
    return noised.select(
        "lang",
        "source",
        "n_docs",
        "noise",
        F.greatest(F.col("n_docs") + F.col("noise"), F.lit(0))
        .cast("long")
        .alias("noisy_count"),
        F.round(F.log(F.lit(2.0)), 6).alias("epsilon"),
    )


@query(
    "q_dp_quantiles",
    oracle=f"""
    WITH b AS (
        SELECT LEAST(GREATEST(CAST(FLOOR(value / {_DPQ_BIN}) AS BIGINT),
                              0), 2047) AS bin
        FROM events),
    hist AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM b GROUP BY bin),
    cum AS (
        SELECT bin, SUM(cnt) OVER (ORDER BY bin
                    ROWS UNBOUNDED PRECEDING) AS c,
               SUM(cnt) OVER () AS n
        FROM hist),
    qs(q) AS (VALUES (0.5), (0.9)),
    scored AS (
        SELECT q, bin, c, n,
               ROUND(CAST({_DPQ_EPS} AS DOUBLE)
                       * (-ABS(c - q * n)) / 2
                     - ln(-ln((CAST(CAST('0x' ||
                         substr(md5(CAST(q AS VARCHAR) || '|'
                                    || CAST(bin AS VARCHAR)), 1, 8)
                         AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0)),
                     9) AS score
        FROM qs CROSS JOIN cum),
    pick AS (
        SELECT q, bin, c, n,
               ROW_NUMBER() OVER (PARTITION BY q
                   ORDER BY score DESC, bin) AS rn
        FROM scored),
    exact AS (
        SELECT q, MIN(bin) AS ebin
        FROM qs JOIN cum ON c >= q * n GROUP BY q)
    SELECT CAST(p.q AS DOUBLE) AS q,
           ROUND((p.bin + 1) * CAST({_DPQ_BIN} AS DOUBLE), 6)
               AS released_value,
           ROUND((e.ebin + 1) * CAST({_DPQ_BIN} AS DOUBLE), 6)
               AS exact_value,
           CAST(ABS(p.c - p.q * p.n) AS DOUBLE) AS rank_err,
           (ABS(p.c - p.q * p.n) <= 0.05 * p.n) AS within_tolerance
    FROM pick p JOIN exact e ON p.q = e.q
    WHERE p.rn = 1
    """,
)
def q_dp_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private quantile release via the EXPONENTIAL
    mechanism (McSherry-Talwar) — q_dp_counts' counting twin for order
    statistics, where Laplace-on-the-value doesn't work: each
    histogram bin competes with utility -|rank error| (sensitivity 1),
    Gumbel-max sampling realizes the exponential mechanism, and the
    released value is the winning bin's edge.  The rank-error audit
    column certifies calibration (the 5%-of-n tolerance is the
    eps=1 concentration bound at this n, NOT slack).

    Determinism: the Gumbel uniforms derive from md5 of (q, bin) — the
    q_dp_counts convention — so the release is engine-reproducible and
    re-running never burns extra budget for the same release id;
    production swaps a sealed per-release RNG.  Scale shape: one
    partial-aggregable histogram shuffle; scoring/argmax run on the
    2048-bin frame."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.least(
            F.greatest(
                F.floor(F.col("value") / _DPQ_BIN).cast("long"), F.lit(0)
            ),
            F.lit(2047),
        ).alias("bin")
    )
    hist = b.groupBy("bin").agg(F.count("*").alias("cnt"))
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy(F.lit(1))
    cum = hist.select(
        "bin",
        F.sum("cnt").over(wc).alias("c"),
        F.sum("cnt").over(wall).alias("n"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9))).alias("q")
    )
    j = qs.crossJoin(cum)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("q").cast("string"),
                    F.lit("|"),
                    F.col("bin").cast("string"),
                ).cast("binary")
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    score = F.round(
        F.lit(_DPQ_EPS)
        * (-F.abs(F.col("c") - F.col("q") * F.col("n")))
        / 2
        - F.log(-F.log(u)),
        9,
    )
    wpick = Window.partitionBy("q").orderBy(F.desc("score"), "bin")
    pick = (
        j.withColumn("score", score)
        .withColumn("rn", F.row_number().over(wpick))
        .filter(F.col("rn") == 1)
    )
    exact = (
        j.filter(F.col("c") >= F.col("q") * F.col("n"))
        .groupBy("q")
        .agg(F.min("bin").alias("ebin"))
    )
    return pick.join(exact, "q").select(
        F.col("q").cast("double").alias("q"),
        F.round((F.col("bin") + 1) * F.lit(_DPQ_BIN), 6).alias(
            "released_value"
        ),
        F.round((F.col("ebin") + 1) * F.lit(_DPQ_BIN), 6).alias(
            "exact_value"
        ),
        F.abs(F.col("c") - F.col("q") * F.col("n"))
        .cast("double")
        .alias("rank_err"),
        (
            F.abs(F.col("c") - F.col("q") * F.col("n"))
            <= 0.05 * F.col("n")
        ).alias("within_tolerance"),
    )


_MAHA_CHI2_999 = 16.266  # chi-square 0.999 quantile, 3 dof


@query(
    "q_mahalanobis",
    oracle=f"""
    WITH feats AS (
        SELECT o_custkey AS customer_id,
               CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                              DATE '2002-01-01') AS DOUBLE) AS x,
               CAST(COUNT(*) AS DOUBLE) AS y,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS z
        FROM orders GROUP BY o_custkey),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(28,6))) AS DOUBLE)
                   AS sx,
               CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6))) AS DOUBLE)
                   AS sy,
               CAST(SUM(CAST(ROUND(z, 6) AS DECIMAL(28,6))) AS DOUBLE)
                   AS sz,
               CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(ROUND(x * z, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS sxz,
               CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS syy,
               CAST(SUM(CAST(ROUND(y * z, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS syz,
               CAST(SUM(CAST(ROUND(z * z, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS szz
        FROM feats),
    m AS (
        SELECT n, sx / n AS mx, sy / n AS my, sz / n AS mz,
               (sxx - n * (sx / n) * (sx / n)) / (n - 1) AS c11,
               (sxy - n * (sx / n) * (sy / n)) / (n - 1) AS c12,
               (sxz - n * (sx / n) * (sz / n)) / (n - 1) AS c13,
               (syy - n * (sy / n) * (sy / n)) / (n - 1) AS c22,
               (syz - n * (sy / n) * (sz / n)) / (n - 1) AS c23,
               (szz - n * (sz / n) * (sz / n)) / (n - 1) AS c33
        FROM s),
    inv AS (
        SELECT mx, my, mz,
               (c22 * c33 - c23 * c23) / det AS a11,
               (c13 * c23 - c12 * c33) / det AS a12,
               (c12 * c23 - c13 * c22) / det AS a13,
               (c11 * c33 - c13 * c13) / det AS a22,
               (c13 * c12 - c11 * c23) / det AS a23,
               (c11 * c22 - c12 * c12) / det AS a33
        FROM (SELECT *,
                     c11 * (c22 * c33 - c23 * c23)
                     - c12 * (c12 * c33 - c23 * c13)
                     + c13 * (c12 * c23 - c22 * c13) AS det
              FROM m) d),
    scored AS (
        SELECT f.customer_id,
               ROUND(
                 (f.x - i.mx) * (f.x - i.mx) * i.a11
                 + (f.y - i.my) * (f.y - i.my) * i.a22
                 + (f.z - i.mz) * (f.z - i.mz) * i.a33
                 + 2 * (f.x - i.mx) * (f.y - i.my) * i.a12
                 + 2 * (f.x - i.mx) * (f.z - i.mz) * i.a13
                 + 2 * (f.y - i.my) * (f.z - i.mz) * i.a23, 6) AS d2
        FROM feats f CROSS JOIN inv i)
    SELECT customer_id, d2
    FROM scored
    WHERE d2 > CAST({_MAHA_CHI2_999} AS DOUBLE)
    """,
)
def q_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate customer-anomaly detection: Mahalanobis distance
    on the 3-D (recency, order count, total spend) feature vector,
    flagging customers beyond the chi-square(3) 99.9% contour — the
    covariance-aware outlier screen that per-feature z-scores
    (q_zscore / q_robust_z) cannot express (a customer can be normal
    on every marginal but impossible jointly).

    Fully oracle-checked BECAUSE d=3: the covariance inverse is the
    closed-form adjugate/determinant, written as the identical
    formula text in the Spark plan and the SQL oracle.  Sufficient
    stats accumulate as rounded-product DECIMAL sums (partition-order
    exact), the 1-row inverse broadcasts, and the quadratic form is
    map-side scalar math — one aggregate pass + one map pass at any
    scale.  For d~64 embeddings the same shape holds with the inverse
    computed at the fit barrier (operators/pca.py stats); the audit
    then rides tests instead of SQL."""
    od = load_table(spark, sf_dir, "orders")
    feats = od.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.datediff(
            F.lit("2002-01-01").cast("date"),
            F.to_date(F.max("o_orderdate")),
        )
        .cast("double")
        .alias("x"),
        F.count("*").cast("double").alias("y"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("z"),
    )

    def dsum(c):
        return F.sum(F.round(c, 6).cast("decimal(28,6)")).cast("double")

    s = feats.agg(
        F.count("*").cast("double").alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("z")).alias("sz"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("z")).alias("sxz"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        dsum(F.col("y") * F.col("z")).alias("syz"),
        dsum(F.col("z") * F.col("z")).alias("szz"),
    ).collect()[0]
    n = s["n"]
    mx, my, mz = s["sx"] / n, s["sy"] / n, s["sz"] / n
    c11 = (s["sxx"] - n * (s["sx"] / n) * (s["sx"] / n)) / (n - 1)
    c12 = (s["sxy"] - n * (s["sx"] / n) * (s["sy"] / n)) / (n - 1)
    c13 = (s["sxz"] - n * (s["sx"] / n) * (s["sz"] / n)) / (n - 1)
    c22 = (s["syy"] - n * (s["sy"] / n) * (s["sy"] / n)) / (n - 1)
    c23 = (s["syz"] - n * (s["sy"] / n) * (s["sz"] / n)) / (n - 1)
    c33 = (s["szz"] - n * (s["sz"] / n) * (s["sz"] / n)) / (n - 1)
    det = (
        c11 * (c22 * c33 - c23 * c23)
        - c12 * (c12 * c33 - c23 * c13)
        + c13 * (c12 * c23 - c22 * c13)
    )
    a11 = (c22 * c33 - c23 * c23) / det
    a12 = (c13 * c23 - c12 * c33) / det
    a13 = (c12 * c23 - c13 * c22) / det
    a22 = (c11 * c33 - c13 * c13) / det
    a23 = (c13 * c12 - c11 * c23) / det
    a33 = (c11 * c22 - c12 * c12) / det
    dx = F.col("x") - F.lit(mx)
    dy = F.col("y") - F.lit(my)
    dz = F.col("z") - F.lit(mz)
    d2 = F.round(
        dx * dx * F.lit(a11)
        + dy * dy * F.lit(a22)
        + dz * dz * F.lit(a33)
        + F.lit(2) * dx * dy * F.lit(a12)
        + F.lit(2) * dx * dz * F.lit(a13)
        + F.lit(2) * dy * dz * F.lit(a23),
        6,
    )
    return (
        feats.select("customer_id", d2.alias("d2"))
        .filter(F.col("d2") > F.lit(_MAHA_CHI2_999).cast("double"))
    )


_MSPRT_LOG_THRESH = 2.995732  # ln(20) 6dp: log-Lambda crossing <=> alpha = 0.05


@query(
    "q_msprt",
    oracle="""
    WITH daily AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                    THEN CAST(ROUND(value * CAST(1.05 AS DOUBLE), 6)
                              AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                   AS sa,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS na,
               CAST(SUM(CASE WHEN user_id % 2 = 1
                    THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                   AS sb,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS nb
        FROM events GROUP BY 1),
    diffs AS (
        SELECT day, ROUND(sa / na - sb / nb, 6) AS d
        FROM daily WHERE na > 0 AND nb > 0),
    var AS (
        SELECT GREATEST(
                 ROUND((CAST(SUM(CAST(ROUND(d * d, 9) AS DECIMAL(28,9)))
                             AS DOUBLE)
                        - COUNT(*) *
                          (CAST(SUM(CAST(ROUND(d, 9) AS DECIMAL(28,9)))
                                AS DOUBLE) / COUNT(*))
                          * (CAST(SUM(CAST(ROUND(d, 9)
                                           AS DECIMAL(28,9)))
                                  AS DOUBLE) / COUNT(*)))
                       / (COUNT(*) - 1), 9),
                 CAST(0.000001 AS DOUBLE)) AS s2
        FROM diffs),
    walk AS (
        SELECT day, d,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE) AS t,
               CAST(SUM(CAST(ROUND(d, 9) AS DECIMAL(28,9)))
                    OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS DOUBLE) AS cs
        FROM diffs),
    lam AS (
        SELECT w.day, w.t,
               ROUND(ROUND(0.5 * ln(v.s2 / (v.s2 + w.t * v.s2)), 9)
                     + ROUND((w.cs / w.t) * (w.cs / w.t) * w.t * w.t
                           * v.s2
                           / (2 * v.s2 * (v.s2 + w.t * v.s2)), 9), 6)
                   AS log_lambda
        FROM walk w CROSS JOIN var v)
    SELECT day, CAST(t AS BIGINT) AS t, log_lambda,
           (log_lambda >= CAST(2.995732 AS DOUBLE)) AS crossed
    FROM lam
    """,
)
def q_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B monitoring via the mixture SPRT
    (Robbins; Johari et al.'s "peeking problem" fix): the day-by-day
    LOG-likelihood-ratio trajectory for the A-vs-B difference in mean
    event value (deterministic user-parity assignment; variant A
    carries a planted +5% uplift — the raw split is null-true, so the
    crossing flag was constant-False and the trajectory vacuously
    flat: round-8 degeneracy audit), with mixture variance
    tau^2 = sigma^2 and the alpha = 0.05 crossing flag
    (log-Lambda >= ln 20) per day.  Log space keeps the output
    hash-stable once the planted effect sends Lambda past 1e9 —
    each libm term rounds at 9 dp before the sum.  Unlike q_ab_test's fixed-horizon t-test, this readout stays
    valid under continuous monitoring — the experimentation-platform
    primitive for early stopping.

    Scale shape: one corpus pass to the daily (variant-sum, count)
    grain; the trajectory is windows over the calendar-bounded daily
    frame.  Daily diffs round to 6 and cumulate as DECIMAL, the
    variance uses the exact-moments form, and every Lambda rounds to
    6 — the whole trajectory hash-verifies."""
    ev = load_table(spark, sf_dir, "events")
    isa = (F.col("user_id") % 2 == 0).cast("int")
    daily = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(
        F.sum(
            F.when(
                F.col("user_id") % 2 == 0,
                F.round(F.col("value") * F.lit(1.05), 6).cast(
                    "decimal(18,6)"
                ),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("sa"),
        F.sum(isa).cast("double").alias("na"),
        F.sum(
            F.when(
                F.col("user_id") % 2 == 1,
                F.round(F.col("value"), 6).cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("sb"),
        F.sum(F.lit(1) - isa).cast("double").alias("nb"),
    )
    diffs = daily.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "day",
        F.round(
            F.col("sa") / F.col("na") - F.col("sb") / F.col("nb"), 6
        ).alias("d"),
    )
    var = diffs.agg(
        F.greatest(
            F.round(
                (
                    F.sum(
                        F.round(F.col("d") * F.col("d"), 9).cast(
                            "decimal(28,9)"
                        )
                    ).cast("double")
                    - F.count("*")
                    * (
                        F.sum(
                            F.round(F.col("d"), 9).cast("decimal(28,9)")
                        ).cast("double")
                        / F.count("*")
                    )
                    * (
                        F.sum(
                            F.round(F.col("d"), 9).cast("decimal(28,9)")
                        ).cast("double")
                        / F.count("*")
                    )
                )
                / (F.count("*") - 1),
                9,
            ),
            F.lit(1e-6).cast("double"),
        ).alias("s2")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    walk = diffs.select(
        "day",
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("double")
        .alias("t"),
        F.sum(F.round(F.col("d"), 9).cast("decimal(28,9)"))
        .over(w)
        .cast("double")
        .alias("cs"),
    )
    lam = walk.crossJoin(F.broadcast(var)).select(
        "day",
        "t",
        F.round(
            F.round(
                0.5
                * F.log(
                    F.col("s2")
                    / (F.col("s2") + F.col("t") * F.col("s2"))
                ),
                9,
            )
            + F.round(
                (F.col("cs") / F.col("t"))
                * (F.col("cs") / F.col("t"))
                * F.col("t")
                * F.col("t")
                * F.col("s2")
                / (
                    F.lit(2)
                    * F.col("s2")
                    * (F.col("s2") + F.col("t") * F.col("s2"))
                ),
                9,
            ),
            6,
        ).alias("log_lambda"),
    )
    return lam.select(
        "day",
        F.col("t").cast("long").alias("t"),
        "log_lambda",
        (
            F.col("log_lambda")
            >= F.lit(_MSPRT_LOG_THRESH).cast("double")
        ).alias("crossed"),
    )


@query(
    "q_did",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND ts >= TIMESTAMP '2024-01-16'
                    THEN 1 ELSE 0 END) AS DOUBLE) AS n_tp,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND ts >= TIMESTAMP '2024-01-16'
                    THEN CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS s_tp,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND ts >= TIMESTAMP '2024-01-16'
                    THEN CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(36,8)) END) AS DOUBLE) AS ss_tp,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND ts < TIMESTAMP '2024-01-16'
                    THEN 1 ELSE 0 END) AS DOUBLE) AS n_t0,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND ts < TIMESTAMP '2024-01-16'
                    THEN CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS s_t0,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND ts < TIMESTAMP '2024-01-16'
                    THEN CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(36,8)) END) AS DOUBLE) AS ss_t0,
               CAST(SUM(CASE WHEN user_id % 2 = 1 AND ts >= TIMESTAMP '2024-01-16'
                    THEN 1 ELSE 0 END) AS DOUBLE) AS n_cp,
               CAST(SUM(CASE WHEN user_id % 2 = 1 AND ts >= TIMESTAMP '2024-01-16'
                    THEN CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS s_cp,
               CAST(SUM(CASE WHEN user_id % 2 = 1 AND ts >= TIMESTAMP '2024-01-16'
                    THEN CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(36,8)) END) AS DOUBLE) AS ss_cp,
               CAST(SUM(CASE WHEN user_id % 2 = 1 AND ts < TIMESTAMP '2024-01-16'
                    THEN 1 ELSE 0 END) AS DOUBLE) AS n_c0,
               CAST(SUM(CASE WHEN user_id % 2 = 1 AND ts < TIMESTAMP '2024-01-16'
                    THEN CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS s_c0,
               CAST(SUM(CASE WHEN user_id % 2 = 1 AND ts < TIMESTAMP '2024-01-16'
                    THEN CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(36,8)) END) AS DOUBLE) AS ss_c0
        FROM events GROUP BY event_type),
    m AS (
        SELECT event_type,
               CAST(n_tp AS BIGINT) + CAST(n_t0 AS BIGINT)
               + CAST(n_cp AS BIGINT) + CAST(n_c0 AS BIGINT) AS n,
               s_tp / n_tp AS mtp, s_t0 / n_t0 AS mt0,
               s_cp / n_cp AS mcp, s_c0 / n_c0 AS mc0,
               (ss_tp - s_tp * s_tp / n_tp) / (n_tp - 1) / n_tp
               + (ss_t0 - s_t0 * s_t0 / n_t0) / (n_t0 - 1) / n_t0
               + (ss_cp - s_cp * s_cp / n_cp) / (n_cp - 1) / n_cp
               + (ss_c0 - s_c0 * s_c0 / n_c0) / (n_c0 - 1) / n_c0
                   AS se2
        FROM cells)
    SELECT event_type, n,
           ROUND(mtp - mt0, 6) AS treat_delta,
           ROUND(mcp - mc0, 6) AS control_delta,
           ROUND((mtp - mt0) - (mcp - mc0), 6) AS did,
           ROUND(sqrt(se2), 6) AS se,
           ROUND(((mtp - mt0) - (mcp - mc0)) / sqrt(se2), 6) AS t_stat
    FROM m
    """,
)
def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the causal readout when treatment
    wasn't randomized per-unit but switched ON at a date (pricing
    change, rollout): per event type, the treated cohort's pre->post
    mean shift minus the control cohort's shift removes the shared
    time trend q_ab_test would confound.  Completes the
    experimentation shelf: q_ab_test (fixed horizon), q_cuped
    (variance reduction), q_msprt (sequential), this (quasi-
    experiments).

    ONE conditionally-aggregated scan computes all four cells'
    (n, sum, sum-of-squares) per group — no period/cohort self-join
    of the log, and the DECIMAL accumulators make the float inputs
    partition-order exact (q_ab_test discipline).  The DiD estimate,
    its large-sample SE (sum of four cell variances of the mean), and
    the t statistic are identical IEEE754 scalar expressions per
    5-row group."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2 == 0).alias("treat"),
        (F.col("ts") >= F.lit("2024-01-16")).alias("post"),
        F.col("value").cast("decimal(18,4)").alias("v"),
    )

    def cell(t, p):
        cond = (F.col("treat") == t) & (F.col("post") == p)
        z4 = F.lit(0).cast("decimal(18,4)")
        z8 = F.lit(0).cast("decimal(36,8)")
        return (
            F.sum(F.when(cond, 1).otherwise(0)).cast("double"),
            F.sum(F.when(cond, F.col("v")).otherwise(z4)).cast("double"),
            F.sum(
                F.when(cond, F.col("v") * F.col("v")).otherwise(z8)
            ).cast("double"),
        )

    n_tp, s_tp, ss_tp = cell(True, True)
    n_t0, s_t0, ss_t0 = cell(True, False)
    n_cp, s_cp, ss_cp = cell(False, True)
    n_c0, s_c0, ss_c0 = cell(False, False)
    cells = ev.groupBy("event_type").agg(
        n_tp.alias("n_tp"), s_tp.alias("s_tp"), ss_tp.alias("ss_tp"),
        n_t0.alias("n_t0"), s_t0.alias("s_t0"), ss_t0.alias("ss_t0"),
        n_cp.alias("n_cp"), s_cp.alias("s_cp"), ss_cp.alias("ss_cp"),
        n_c0.alias("n_c0"), s_c0.alias("s_c0"), ss_c0.alias("ss_c0"),
    )

    def mean(s, n):
        return F.col(s) / F.col(n)

    def varm(ss, s, n):
        return (
            (F.col(ss) - F.col(s) * F.col(s) / F.col(n))
            / (F.col(n) - 1)
            / F.col(n)
        )

    mtp, mt0 = mean("s_tp", "n_tp"), mean("s_t0", "n_t0")
    mcp, mc0 = mean("s_cp", "n_cp"), mean("s_c0", "n_c0")
    se2 = (
        varm("ss_tp", "s_tp", "n_tp")
        + varm("ss_t0", "s_t0", "n_t0")
        + varm("ss_cp", "s_cp", "n_cp")
        + varm("ss_c0", "s_c0", "n_c0")
    )
    did = (mtp - mt0) - (mcp - mc0)
    return cells.select(
        "event_type",
        (
            F.col("n_tp").cast("long")
            + F.col("n_t0").cast("long")
            + F.col("n_cp").cast("long")
            + F.col("n_c0").cast("long")
        ).alias("n"),
        F.round(mtp - mt0, 6).alias("treat_delta"),
        F.round(mcp - mc0, 6).alias("control_delta"),
        F.round(did, 6).alias("did"),
        F.round(F.sqrt(se2), 6).alias("se"),
        F.round(did / F.sqrt(se2), 6).alias("t_stat"),
    )


@query(
    "q_shapley_attribution",
    oracle="""
    WITH j AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS v,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS c,
               MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   AS s,
               MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS e,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY 1, 2),
    sets AS MATERIALIZED (
        SELECT v + 2 * c + 4 * s + 8 * e AS mask,
               CAST(SUM(conv) AS BIGINT) AS conv
        FROM j WHERE v + 2 * c + 4 * s + 8 * e > 0 GROUP BY 1),
    grid AS (SELECT UNNEST(generate_series(0, 15)) AS coal),
    vs AS MATERIALIZED (
        SELECT g.coal,
               COALESCE(CAST(SUM(t.conv) AS BIGINT), 0) AS v
        FROM grid g LEFT JOIN sets t ON (t.mask & g.coal) = t.mask
        GROUP BY g.coal),
    ch AS (SELECT * FROM (VALUES ('view', 1), ('click', 2),
                                 ('signup', 4), ('error', 8))
           AS t(channel, bit)),
    terms AS (
        SELECT ch.channel,
               ROUND((CASE bit_count(a.coal)
                      WHEN 0 THEN CAST(1 AS DOUBLE) / 4
                      WHEN 1 THEN CAST(1 AS DOUBLE) / 12
                      WHEN 2 THEN CAST(1 AS DOUBLE) / 12
                      ELSE CAST(1 AS DOUBLE) / 4 END)
                     * (b.v - a.v), 9) AS term
        FROM ch JOIN vs a ON (a.coal & ch.bit) = 0
        JOIN vs b ON b.coal = a.coal + ch.bit),
    tot AS (SELECT v AS vfull FROM vs WHERE coal = 15)
    SELECT channel,
           CAST(SUM(CAST(term AS DECIMAL(18,9))) AS DOUBLE)
               AS shapley,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(18,9))) AS DOUBLE)
                 / t.vfull, 6) AS share
    FROM terms CROSS JOIN tot t GROUP BY channel, t.vfull
    """,
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution — the game-theoretic
    credit model next to q_markov_attribution's removal effects: each
    (user, day) journey contributes its touched-channel SET and
    whether it converted; the worth of a channel coalition is the
    conversions of journeys it fully covers; each channel's credit is
    its exact Shapley value (axiomatic fair split — efficiency,
    symmetry, dummy all hold by construction, and the efficiency
    axiom Sum(shapley) = v(full) doubles as a built-in audit).

    Exact, not sampled, BECAUSE the channel set is bounded: 4
    channels -> 16 coalitions, so after ONE groupBy compressing the
    log to journeys and one more to <=15 (mask, conversions) rows,
    every remaining frame is a 16-row grid — subset-containment
    semi-sums, the 8-coalition-per-channel marginal sweep, and the
    factorial-weighted DECIMAL sum never touch row-level data.  At
    100 TB only the first groupBy scales (hash-partitioned on
    (user, day)); with k channels the grid is 2^k — exact to k~20,
    then sample permutations (Castro et al.) with this same frame as
    the estimator's input.  Weights s!(k-1-s)!/k! are written as the
    identical double division in plan and oracle; v(S) is integer."""
    ev = load_table(spark, sf_dir, "events")
    j = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("v"),
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("c"),
        F.max(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("s"),
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("e"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    mask = (
        F.col("v") + 2 * F.col("c") + 4 * F.col("s") + 8 * F.col("e")
    )
    sets = (
        j.select(mask.alias("mask"), "conv")
        .filter(F.col("mask") > 0)
        .groupBy("mask")
        .agg(F.sum("conv").cast("long").alias("conv"))
    )
    grid = spark.range(16).select(F.col("id").cast("int").alias("coal"))
    vs = (
        grid.join(
            F.broadcast(sets),
            (F.col("mask").bitwiseAND(F.col("coal")) == F.col("mask")),
            "left",
        )
        .groupBy("coal")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).cast("long").alias("v"))
    )
    ch = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4), ("error", 8)],
        "channel string, bit int",
    )
    a = vs.alias("a")
    b = vs.alias("b")
    one = F.lit(1).cast("double")
    w = (
        F.when(F.bit_count(F.col("a.coal")) == 0, one / 4)
        .when(F.bit_count(F.col("a.coal")) == 1, one / 12)
        .when(F.bit_count(F.col("a.coal")) == 2, one / 12)
        .otherwise(one / 4)
    )
    terms = (
        ch.join(
            F.broadcast(a),
            F.col("a.coal").bitwiseAND(F.col("bit")) == 0,
        )
        .join(
            F.broadcast(b),
            F.col("b.coal") == F.col("a.coal") + F.col("bit"),
        )
        .select(
            "channel",
            F.round(w * (F.col("b.v") - F.col("a.v")), 9).alias("term"),
        )
    )
    tot = vs.filter(F.col("coal") == 15).select(
        F.col("v").alias("vfull")
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .groupBy("channel", "vfull")
        .agg(
            F.sum(F.col("term").cast("decimal(18,9)"))
            .cast("double")
            .alias("shapley")
        )
        .select(
            "channel",
            "shapley",
            F.round(F.col("shapley") / F.col("vfull"), 6).alias("share"),
        )
    )


@query(
    "q_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS x,
               CAST(SUM(CAST(value AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS y
        FROM events GROUP BY 1, 2),
    cum AS (
        SELECT event_type, x,
               SUM(y) OVER (PARTITION BY event_type ORDER BY x
                            ROWS UNBOUNDED PRECEDING) AS cs,
               SUM(CAST(y * y AS DECIMAL(38,8)))
                   OVER (PARTITION BY event_type ORDER BY x
                         ROWS UNBOUNDED PRECEDING) AS css,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY x) AS BIGINT) AS k,
               CAST(COUNT(*) OVER (PARTITION BY event_type)
                    AS BIGINT) AS n,
               SUM(y) OVER (PARTITION BY event_type) AS ts,
               SUM(CAST(y * y AS DECIMAL(38,8)))
                   OVER (PARTITION BY event_type) AS tss
        FROM daily),
    scored AS (
        SELECT event_type, x, k, n,
               ROUND(CAST(cs AS DOUBLE) / k, 6) AS mean_before,
               ROUND((CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                     / (n - k), 6) AS mean_after,
               ROUND(CAST(tss AS DOUBLE)
                     - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) / n, 6)
                   AS sse_total,
               ROUND((CAST(css AS DOUBLE)
                      - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / k)
                     + ((CAST(tss AS DOUBLE) - CAST(css AS DOUBLE))
                        - (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                          * (CAST(ts AS DOUBLE) - CAST(cs AS DOUBLE))
                          / (n - k)), 6) AS sse_split
        FROM cum WHERE k < n),
    best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                      ORDER BY sse_split, x) AS rn
        FROM scored)
    SELECT event_type, x AS change_day, n AS n_days,
           mean_before, mean_after, sse_total, sse_split,
           ROUND(1 - sse_split / sse_total, 6) AS pct_reduction
    FROM best WHERE rn = 1
    """,
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint detection (binary segmentation, one split):
    per event type, the day boundary whose two-segment piecewise-mean
    fit most reduces SSE over the daily-revenue series — the batch
    twin of q_cusum's online drift alarm, and the first split of the
    full binary-segmentation recursion (re-run per segment to find
    more breaks).

    The log compresses to a days x types daily frame in one groupBy;
    prefix sums accumulate as exact DECIMAL inside deterministic-order
    windows (so both engines see bit-identical cumulative stats), and
    every candidate split's SSE is closed-form from (cum sum, cum
    sumsq, totals) — the O(n^2)-naive scan becomes O(n) window math
    on a bounded frame.  Scale: only the daily aggregation touches
    row-level data; a 100 TB log still reduces to days x types rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("y")
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wp = Window.partitionBy("event_type")
    yy = (F.col("y") * F.col("y")).cast("decimal(38,8)")
    cum = daily.select(
        "event_type",
        "x",
        F.sum("y").over(wo).alias("cs"),
        F.sum(yy).over(wo).alias("css"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x"))
        .cast("long")
        .alias("k"),
        F.count("*").over(wp).cast("long").alias("n"),
        F.sum("y").over(wp).alias("ts"),
        F.sum(yy).over(wp).alias("tss"),
    )
    cs, css = F.col("cs").cast("double"), F.col("css").cast("double")
    ts, tss = F.col("ts").cast("double"), F.col("tss").cast("double")
    k, n = F.col("k"), F.col("n")
    scored = cum.filter(k < n).select(
        "event_type",
        "x",
        "k",
        "n",
        F.round(cs / k, 6).alias("mean_before"),
        F.round((ts - cs) / (n - k), 6).alias("mean_after"),
        F.round(tss - ts * ts / n, 6).alias("sse_total"),
        F.round(
            (css - cs * cs / k)
            + ((tss - css) - (ts - cs) * (ts - cs) / (n - k)),
            6,
        ).alias("sse_split"),
    )
    best = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("sse_split", "x")
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.col("x").alias("change_day"),
        F.col("n").alias("n_days"),
        "mean_before",
        "mean_after",
        "sse_total",
        "sse_split",
        F.round(1 - F.col("sse_split") / F.col("sse_total"), 6).alias(
            "pct_reduction"
        ),
    )


@query(
    "q_srm",
    oracle="""
    WITH arms AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b
        FROM events GROUP BY event_type)
    SELECT event_type, n_a, n_b,
           ROUND(CAST(n_a AS DOUBLE) / (n_a + n_b), 6) AS share_a,
           ROUND((n_a - (n_a + n_b) / CAST(2 AS DOUBLE))
                 * (n_a - (n_a + n_b) / CAST(2 AS DOUBLE))
                 / ((n_a + n_b) / CAST(2 AS DOUBLE))
                 + (n_b - (n_a + n_b) / CAST(2 AS DOUBLE))
                 * (n_b - (n_a + n_b) / CAST(2 AS DOUBLE))
                 / ((n_a + n_b) / CAST(2 AS DOUBLE)), 6) AS chi2,
           (n_a - (n_a + n_b) / CAST(2 AS DOUBLE))
           * (n_a - (n_a + n_b) / CAST(2 AS DOUBLE))
           / ((n_a + n_b) / CAST(2 AS DOUBLE))
           + (n_b - (n_a + n_b) / CAST(2 AS DOUBLE))
           * (n_b - (n_a + n_b) / CAST(2 AS DOUBLE))
           / ((n_a + n_b) / CAST(2 AS DOUBLE))
           > CAST(3.841 AS DOUBLE) AS srm_flag
    FROM arms
    """,
)
def q_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the first thing every
    experimentation platform checks before reading any metric: does
    the realized arm split match the designed 50/50 allocation?  A
    chi-square goodness-of-fit per event type against the expected
    half-and-half; chi2 > 3.841 (p < 0.05, 1 dof) flags a broken
    randomizer, bot skew, or logging loss — conditions under which
    q_ab_test / q_did readouts are invalid no matter how significant.

    One conditionally-aggregated scan to a 5-row frame; all counts
    are integers so every downstream double is bit-deterministic
    (no rounding discipline needed beyond the display ROUND)."""
    ev = load_table(spark, sf_dir, "events")
    arms = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    e = (n_a + n_b) / F.lit(2).cast("double")
    chi2 = (n_a - e) * (n_a - e) / e + (n_b - e) * (n_b - e) / e
    return arms.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(n_a.cast("double") / (n_a + n_b), 6).alias("share_a"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(3.841).cast("double")).alias("srm_flag"),
    )


@query(
    "q_power_analysis",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
               CAST(SUM(CAST(value AS DECIMAL(18,4))
                        * CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                   AS ss
        FROM events GROUP BY event_type),
    m AS (
        SELECT event_type, n_a, n_b, s / n AS mean,
               (ss - s * s / n) / (n - 1) AS var,
               CASE WHEN n_a < n_b THEN n_a ELSE n_b END AS n_arm
        FROM stats)
    SELECT event_type, n_arm,
           ROUND(mean, 6) AS mean,
           ROUND(sqrt(var), 6) AS sd,
           ROUND((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                 * sqrt(2 * var / n_arm), 6) AS mde_abs,
           ROUND((CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                 * sqrt(2 * var / n_arm) / mean, 6) AS mde_rel,
           CAST(CEIL(ROUND(
               2 * var
               * (CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
               * (CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
               / ((CAST(0.01 AS DOUBLE) * mean)
                  * (CAST(0.01 AS DOUBLE) * mean)), 6))
               AS BIGINT) AS n_per_arm_for_1pct
    FROM m
    """,
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis from observed data — the planning
    step BEFORE q_ab_test: per event type, the minimum detectable
    effect at the current per-arm sample size (alpha=0.05 two-sided,
    80% power) and the per-arm n required to detect a 1% lift, both
    from the metric's measured variance.  Teams that skip this ship
    underpowered tests; this makes the cost of a 1%-lift readout a
    query away.

    One DECIMAL sufficient-stats scan to a 5-row frame; z-quantile
    constants (1.959964, 0.841621) are identical double literals on
    both engines, sqrt is IEEE-exact, and the required-n CEIL is
    taken after a 6 dp round so the integer boundary is engine-safe."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,4)")
    stats = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.count("*").cast("long").alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    n_arm = F.when(F.col("n_a") < F.col("n_b"), F.col("n_a")).otherwise(
        F.col("n_b")
    )
    z = F.lit(1.959964).cast("double") + F.lit(0.841621).cast("double")
    mde = z * F.sqrt(2 * var / n_arm)
    eps = F.lit(0.01).cast("double") * mean
    return stats.select(
        "event_type",
        n_arm.alias("n_arm"),
        F.round(mean, 6).alias("mean"),
        F.round(F.sqrt(var), 6).alias("sd"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / mean, 6).alias("mde_rel"),
        F.ceil(F.round(2 * var * z * z / (eps * eps), 6))
        .cast("long")
        .alias("n_per_arm_for_1pct"),
    )


@query(
    "q_stratified_ate",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CAST(user_id % 2 = 0 AS BIGINT) AS treat,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
               CAST(SUM(CAST(value AS DECIMAL(18,4))
                        * CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                   AS ss
        FROM events GROUP BY 1, 2),
    strata AS (
        SELECT t.event_type,
               t.n + c.n AS n_s,
               t.s / t.n - c.s / c.n AS delta,
               (t.ss - t.s * t.s / t.n) / (t.n - 1) / t.n
               + (c.ss - c.s * c.s / c.n) / (c.n - 1) / c.n AS var_s
        FROM cells t JOIN cells c ON t.event_type = c.event_type
        WHERE t.treat = 1 AND c.treat = 0),
    tot AS (SELECT CAST(SUM(n_s) AS DOUBLE) AS n FROM strata)
    SELECT CAST(SUM(s.n_s) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(s.n_s / t.n * s.delta, 9)
                    AS DECIMAL(18,9))) AS DOUBLE) AS ate,
           ROUND(sqrt(CAST(SUM(CAST(ROUND(
               (s.n_s / t.n) * (s.n_s / t.n) * s.var_s, 9)
               AS DECIMAL(18,9))) AS DOUBLE)), 6) AS se,
           ROUND(CAST(SUM(CAST(ROUND(s.n_s / t.n * s.delta, 9)
                         AS DECIMAL(18,9))) AS DOUBLE)
                 / sqrt(CAST(SUM(CAST(ROUND(
                     (s.n_s / t.n) * (s.n_s / t.n) * s.var_s, 9)
                     AS DECIMAL(18,9))) AS DOUBLE)), 6) AS t_stat
    FROM strata s CROSS JOIN tot t GROUP BY t.n
    """,
)
def q_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification average treatment effect — the adjustment
    that de-confounds a lopsided assignment: the per-stratum
    (event type) treated-vs-control mean gaps combine with
    stratum-size weights, so a treatment over-represented in
    high-value strata no longer fakes a lift (Simpson's-paradox-proof
    where the naive q_ab_test pooled difference is not).  With
    user_id%2 assignment the strata are balanced and this converges
    to the pooled estimate — the point is the estimator, verified
    end-to-end.

    One conditionally-grouped scan to 10 cells, a 5-row stratum
    self-join, weighted combination as 9 dp-rounded DECIMAL sums
    (order-free), and the stratified SE from within-cell variances —
    nothing after the first aggregate touches row-level data."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,4)")
    cells = ev.groupBy(
        "event_type",
        (F.col("user_id") % 2 == 0).cast("long").alias("treat"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("ss"),
    )
    t = cells.filter(F.col("treat") == 1).drop("treat")
    c = cells.filter(F.col("treat") == 0).drop("treat")
    strata = t.alias("t").join(c.alias("c"), "event_type").select(
        "event_type",
        (F.col("t.n") + F.col("c.n")).alias("n_s"),
        (
            F.col("t.s") / F.col("t.n") - F.col("c.s") / F.col("c.n")
        ).alias("delta"),
        (
            (
                F.col("t.ss")
                - F.col("t.s") * F.col("t.s") / F.col("t.n")
            )
            / (F.col("t.n") - 1)
            / F.col("t.n")
            + (
                F.col("c.ss")
                - F.col("c.s") * F.col("c.s") / F.col("c.n")
            )
            / (F.col("c.n") - 1)
            / F.col("c.n")
        ).alias("var_s"),
    )
    tot = strata.agg(F.sum("n_s").cast("double").alias("n"))
    w = F.col("n_s") / F.col("n")
    ate = F.sum(
        F.round(w * F.col("delta"), 9).cast("decimal(18,9)")
    ).cast("double")
    var = F.sum(
        F.round(w * w * F.col("var_s"), 9).cast("decimal(18,9)")
    ).cast("double")
    return (
        strata.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            F.sum("n_s").cast("long").alias("n_total"),
            ate.alias("ate"),
            F.round(F.sqrt(var), 6).alias("se"),
            F.round(ate / F.sqrt(var), 6).alias("t_stat"),
        )
        .select(
            F.col("n_total").alias("n"), "ate", "se", "t_stat"
        )
    )


_UCB_ARMS = ["click", "error", "purchase", "signup", "view"]
_UCB_DAYS = 30


def _ucb_oracle() -> str:
    """Unrolled UCB1 replay: 30 chained CTE steps, each picking the
    max-UCB arm (9 dp-rounded, tie on arm name) from the previous
    state and folding that day's DECIMAL reward back in — DuckDB
    replays the exact decision trajectory, hash-verifying the POLICY,
    not just per-arm stats."""
    arms_list = ", ".join(f"'{a}'" for a in _UCB_ARMS)
    steps = []
    for t in range(1, _UCB_DAYS + 1):
        if t <= len(_UCB_ARMS):
            pick = f"pick{t} AS (SELECT '{_UCB_ARMS[t - 1]}' AS arm)"
        else:
            pick = f"""pick{t} AS (
        SELECT arm FROM (
            SELECT arm,
                   ROUND(CAST(s AS DOUBLE) / n
                         + sqrt(2 * ln(CAST({t} AS DOUBLE)) / n), 9)
                       AS u
            FROM st{t - 1})
        ORDER BY u DESC, arm LIMIT 1)"""
        steps.append(f"""
    {pick},
    rew{t} AS MATERIALIZED (
        SELECT g.arm, g.r FROM grid g JOIN pick{t} p ON g.arm = p.arm
        WHERE g.day = {t}),
    st{t} AS MATERIALIZED (
        SELECT s.arm,
               s.n + CASE WHEN s.arm = c.arm THEN 1 ELSE 0 END AS n,
               CAST(s.s + CASE WHEN s.arm = c.arm THEN c.r
                           ELSE CAST(0 AS DECIMAL(18,6)) END
                    AS DECIMAL(18,6)) AS s
        FROM st{t - 1} s CROSS JOIN rew{t} c)""")
    traj_union = "\n        UNION ALL ".join(
        f"SELECT {t} AS day, arm, r FROM rew{t}"
        for t in range(1, _UCB_DAYS + 1)
    )
    return f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    + 1 AS BIGINT) AS day,
               event_type AS arm,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                     / COUNT(*), 6) AS r
        FROM events GROUP BY 1, 2),
    grid AS MATERIALIZED (
        SELECT d.day, a.arm,
               CAST(COALESCE(dd.r, 0) AS DECIMAL(18,6)) AS r
        FROM (SELECT UNNEST(generate_series(1, {_UCB_DAYS})) AS day) d
        CROSS JOIN (SELECT UNNEST([{arms_list}]) AS arm) a
        LEFT JOIN daily dd ON dd.day = d.day AND dd.arm = a.arm),
    st0 AS (SELECT arm, 0 AS n, CAST(0 AS DECIMAL(18,6)) AS s
            FROM (SELECT UNNEST([{arms_list}]) AS arm)),
    {','.join(steps)},
    traj AS ({traj_union}),
    cums AS (
        SELECT day, arm, CAST(r AS DOUBLE) AS reward,
               CAST(SUM(r) OVER (ORDER BY day) AS DOUBLE) AS cum_reward
        FROM traj),
    bestcum AS (
        SELECT day, MAX(cs) AS best
        FROM (SELECT day,
                     CAST(SUM(r) OVER (PARTITION BY arm ORDER BY day)
                          AS DECIMAL(18,6)) AS cs
              FROM grid) g
        GROUP BY day)
    SELECT c.day, c.arm, c.reward, c.cum_reward,
           CAST(b.best AS DOUBLE) AS cum_best,
           ROUND(CAST(b.best AS DOUBLE) - c.cum_reward, 6) AS regret
    FROM cums c JOIN bestcum b ON b.day = c.day
    """


@query("q_ucb_bandit", oracle=_ucb_oracle())
def q_ucb_bandit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline UCB1 bandit replay — the sequential-decisioning
    primitive (adaptive campaign/arm selection) the batch experiment
    shelf lacks: days are rounds, event types are arms, the day's
    mean value is the pulled arm's reward, and UCB1
    (mean + sqrt(2 ln t / n), each arm initialized once) balances
    exploration against exploitation.  The output trajectory carries
    realized cumulative reward against the best-fixed-arm-in-
    hindsight benchmark — regret, the quantity bandit deployments
    monitor.

    The log compresses to a days x arms reward frame in one scan;
    the 30-step replay is inherently sequential, so it runs at the
    driver over that BOUNDED frame (the ALS/q_lm_generate fit-barrier
    pattern: collect is days*arms rows, never the log), with rewards
    accumulated as exact Decimals.  The oracle unrolls all 30
    decisions as chained CTEs — the POLICY's every pick is
    hash-verified, the q_markov_attribution discipline.  UCB scores
    round to 9 dp before the argmax (libm ln); ties break on arm
    name."""
    import decimal
    import math

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        (
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            )
            + 1
        )
        .cast("long")
        .alias("day"),
        F.col("event_type").alias("arm"),
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count("*"),
            6,
        ).alias("r")
    )
    zero = decimal.Decimal(0)
    rew = {
        (row["day"], row["arm"]): decimal.Decimal(str(row["r"]))
        for row in daily.collect()
    }
    n = {a: 0 for a in _UCB_ARMS}
    s = {a: zero for a in _UCB_ARMS}
    cum = zero
    bc = {a: zero for a in _UCB_ARMS}
    out = []
    for t in range(1, _UCB_DAYS + 1):
        if t <= len(_UCB_ARMS):
            arm = _UCB_ARMS[t - 1]
        else:
            u = {
                a: round(
                    float(s[a]) / n[a]
                    + math.sqrt(2 * math.log(float(t)) / n[a]),
                    9,
                )
                for a in _UCB_ARMS
            }
            arm = min(_UCB_ARMS, key=lambda a: (-u[a], a))
        r = rew.get((t, arm), zero)
        n[arm] += 1
        s[arm] += r
        cum += r
        for a in _UCB_ARMS:
            bc[a] += rew.get((t, a), zero)
        best = max(bc.values())
        out.append(
            (
                t,
                arm,
                float(r),
                float(cum),
                float(best),
                round(float(best) - float(cum), 6),
            )
        )
    return spark.createDataFrame(
        out,
        "day long, arm string, reward double, cum_reward double, "
        "cum_best double, regret double",
    )


_IPF_ITERS = 4


def _ipf_oracle(iters: int = _IPF_ITERS) -> str:
    """Unrolled IPF/raking: alternating row (event_type) and column
    (weekday) scalings on the bounded cell grid, each weight rounded
    to 9 dp and each marginal a DECIMAL sum — DuckDB replays the
    whole calibration trajectory, hash-verifying the fitted weights."""
    steps = []
    prev = "w0"
    for t in range(1, iters + 1):
        steps.append(f"""
    rs{t} AS (
        SELECT e, CAST(SUM(CAST(ROUND(n * w, 6) AS DECIMAL(18,6)))
                       AS DOUBLE) AS cur
        FROM {prev} GROUP BY e),
    wr{t} AS MATERIALIZED (
        SELECT c.e, c.wd, c.n,
               ROUND(c.w * tr.t / rs.cur, 9) AS w
        FROM {prev} c JOIN rowt tr ON c.e = tr.e
        JOIN rs{t} rs ON c.e = rs.e),
    cs{t} AS (
        SELECT wd, CAST(SUM(CAST(ROUND(n * w, 6) AS DECIMAL(18,6)))
                        AS DOUBLE) AS cur
        FROM wr{t} GROUP BY wd),
    w{t} AS MATERIALIZED (
        SELECT c.e, c.wd, c.n,
               ROUND(c.w * tc.t / cs.cur, 9) AS w
        FROM wr{t} c JOIN colt tc ON c.wd = tc.wd
        JOIN cs{t} cs ON c.wd = cs.wd)""")
        prev = f"w{t}"
    return f"""
    WITH cells AS MATERIALIZED (
        SELECT event_type AS e,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    % 7 AS BIGINT) AS wd,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END) AS BIGINT) AS tgt
        FROM events GROUP BY 1, 2),
    w0 AS (SELECT e, wd, n, CAST(1 AS DOUBLE) AS w FROM cells),
    rowt AS (SELECT e, CAST(SUM(tgt) AS DOUBLE) AS t
             FROM cells GROUP BY e),
    colt AS (SELECT wd, CAST(SUM(tgt) AS DOUBLE) AS t
             FROM cells GROUP BY wd),
    {','.join(steps)}
    SELECT f.e AS event_type, f.wd AS weekday, f.n,
           ROUND(f.w, 6) AS weight,
           ROUND(f.n * f.w, 4) AS fitted
    FROM {prev} f
    """


@query("q_ipf_raking", oracle=_ipf_oracle())
def q_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking / iterative proportional fitting — the marginal
    calibration every panel-to-population adjustment runs: reweight
    the first half-month's (event_type x weekday) cells so BOTH
    weighted marginals match the second half's row and column totals,
    by alternately scaling rows and columns to their targets (4
    rounds).  The same primitive balances training-data mixtures to
    target marginals when only marginals — not joint cells — are
    specified (q_source_mix fixes one margin; this fixes two
    simultaneously).

    ONE conditionally-aggregated scan compresses the log to the 35
    observed/target cell grid; all 8 scaling steps are joins on 5- or
    7-key bounded frames.  Weights round to 9 dp per scaling and
    marginals accumulate as DECIMAL sums, so DuckDB replays the whole
    trajectory bit-for-bit (the q_logreg unrolled-training
    discipline)."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("e"),
        (
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            )
            % 7
        )
        .cast("long")
        .alias("wd"),
    ).agg(
        F.sum(
            F.when(F.col("ts") < F.lit("2024-01-16"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n"),
        F.sum(
            F.when(F.col("ts") >= F.lit("2024-01-16"), 1).otherwise(0)
        )
        .cast("long")
        .alias("tgt"),
    )
    import decimal

    # The 35-cell grid is bounded by construction, so the 8 scaling
    # steps replay at the driver (the q_ucb_bandit fit-barrier
    # pattern) — keeping the loop in-plan costs ~10 stages of pure
    # scheduler overhead for the same arithmetic.
    rows = [
        (r["e"], r["wd"], r["n"], r["tgt"]) for r in cells.collect()
    ]
    rowt = {}
    colt = {}
    for e, wd, _n, tgt in rows:
        rowt[e] = rowt.get(e, 0) + tgt
        colt[wd] = colt.get(wd, 0) + tgt
    w = {(e, wd): 1.0 for e, wd, _n, _t in rows}
    n_of = {(e, wd): n for e, wd, n, _t in rows}
    dz = decimal.Decimal(0)

    def marg(keyfn):
        cur: dict = {}
        for (e, wd), wv in w.items():
            k = keyfn(e, wd)
            cur[k] = cur.get(k, dz) + decimal.Decimal(
                str(round(n_of[(e, wd)] * wv, 6))
            )
        return {k: float(v) for k, v in cur.items()}

    for _ in range(_IPF_ITERS):
        cur = marg(lambda e, wd: e)
        w = {
            (e, wd): round(wv * float(rowt[e]) / cur[e], 9)
            for (e, wd), wv in w.items()
        }
        cur = marg(lambda e, wd: wd)
        w = {
            (e, wd): round(wv * float(colt[wd]) / cur[wd], 9)
            for (e, wd), wv in w.items()
        }
    out = [
        (e, wd, n, round(w[(e, wd)], 6), round(n * w[(e, wd)], 4))
        for e, wd, n, _t in rows
    ]
    return spark.createDataFrame(
        out,
        "event_type string, weekday long, n long, weight double, "
        "fitted double",
    )


@query(
    "q_spearman",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CASE WHEN event_type = 'view'
                    THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                   AS y
        FROM events GROUP BY 1),
    ranked AS MATERIALIZED (
        SELECT day,
               CAST(RANK() OVER (ORDER BY x, day) AS BIGINT) AS rx,
               CAST(RANK() OVER (ORDER BY y, day) AS BIGINT) AS ry
        FROM daily),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx) AS BIGINT) AS sx,
               CAST(SUM(ry) AS BIGINT) AS sy,
               CAST(SUM(rx * rx) AS BIGINT) AS sxx,
               CAST(SUM(ry * ry) AS BIGINT) AS syy,
               CAST(SUM(rx * ry) AS BIGINT) AS sxy
        FROM ranked),
    kt AS (
        SELECT CAST(SUM(CASE WHEN (a.rx - b.rx) * (a.ry - b.ry) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS conc,
               CAST(SUM(CASE WHEN (a.rx - b.rx) * (a.ry - b.ry) < 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS disc,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM ranked a JOIN ranked b ON a.day < b.day)
    SELECT s.n,
           ROUND((CAST(s.n AS DOUBLE) * s.sxy - CAST(s.sx AS DOUBLE) * s.sy)
                 / (sqrt(CAST(s.n AS DOUBLE) * s.sxx
                         - CAST(s.sx AS DOUBLE) * s.sx)
                    * sqrt(CAST(s.n AS DOUBLE) * s.syy
                           - CAST(s.sy AS DOUBLE) * s.sy)), 6)
               AS spearman_rho,
           kt.conc, kt.disc,
           ROUND((CAST(kt.conc AS DOUBLE) - kt.disc) / kt.n_pairs, 6)
               AS kendall_tau
    FROM s CROSS JOIN kt
    """,
)
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank correlation between daily view traffic and daily purchase
    revenue — Spearman's rho (Pearson on ranks, monotone-not-linear
    association) and Kendall's tau (concordant-pair fraction) side by
    side; the outlier-proof complements to q_corr's Pearson, which a
    single spike day can fake or destroy.

    The log compresses to one row per day in a single conditional
    scan; ranks, rank sufficient stats, and the all-pairs concordance
    count all live on that BOUNDED daily frame (the 435-pair grid is
    days^2, never events^2).  Rank stats are pure integers, so every
    double downstream is bit-deterministic; ties share RANK() with a
    day tie-break written identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value"), 6).cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("y"),
    )
    ranked = daily.select(
        "day",
        F.rank().over(Window.orderBy("x", "day")).cast("long").alias("rx"),
        F.rank().over(Window.orderBy("y", "day")).cast("long").alias("ry"),
    )
    s = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("long").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("long").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("long").alias("sxy"),
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    prod = (F.col("a.rx") - F.col("b.rx")) * (
        F.col("a.ry") - F.col("b.ry")
    )
    kt = a.join(b, F.col("a.day") < F.col("b.day")).agg(
        F.sum(F.when(prod > 0, 1).otherwise(0)).cast("long").alias("conc"),
        F.sum(F.when(prod < 0, 1).otherwise(0)).cast("long").alias("disc"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    rho = (n.cast("double") * F.col("sxy") - sx.cast("double") * sy) / (
        F.sqrt(n.cast("double") * F.col("sxx") - sx.cast("double") * sx)
        * F.sqrt(
            n.cast("double") * F.col("syy") - sy.cast("double") * sy
        )
    )
    return s.crossJoin(F.broadcast(kt)).select(
        "n",
        F.round(rho, 6).alias("spearman_rho"),
        "conc",
        "disc",
        F.round(
            (F.col("conc").cast("double") - F.col("disc"))
            / F.col("n_pairs"),
            6,
        ).alias("kendall_tau"),
    )


_HILL_K = 100  # order statistics in the Hill tail estimate


@query(
    "q_tail_index",
    oracle=f"""
    WITH ranked AS (
        SELECT o_custkey, spend,
               ROW_NUMBER() OVER (ORDER BY spend DESC, o_custkey)
                   AS rn
        FROM (SELECT o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                          AS DOUBLE) AS spend
              FROM orders GROUP BY o_custkey) s),
    topk AS MATERIALIZED (
        SELECT spend, rn FROM ranked WHERE rn <= {_HILL_K + 1}),
    xmin AS (
        SELECT spend AS x_k FROM topk WHERE rn = {_HILL_K + 1}),
    hill AS (
        SELECT CAST(SUM(CAST(ROUND(ln(t.spend / x.x_k), 9)
                    AS DECIMAL(18,9))) AS DOUBLE) AS s,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM topk t CROSS JOIN xmin x
        WHERE t.rn <= {_HILL_K})
    SELECT h.k,
           ROUND(x.x_k, 4) AS x_min,
           ROUND(h.s / h.k, 6) AS mean_log_excess,
           ROUND(h.k / h.s, 6) AS hill_alpha,
           h.k / h.s < CAST(2 AS DOUBLE) AS infinite_variance_flag
    FROM hill h CROSS JOIN xmin x
    """,
)
def q_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the customer-spend tail index — the
    heavy-tail diagnostic behind capacity planning and whale-risk
    monitoring: alpha from the top-{_HILL_K} order statistics
    (mean log-excess over the k+1-st largest spend, inverted).
    alpha < 2 means infinite variance — averages and A/B tests on
    this metric stop converging, exactly the regime q_ab_test's
    t-statistics silently break in; the flag says switch to
    median/trimmed readouts (q_robust_z / q_winsorize).

    The global top-(k+1) rides the rank-filter WindowGroupLimit
    (map-side top-n per partition, never a full sort of customers);
    everything after is a bounded {_HILL_K + 1}-row frame with
    9 dp-rounded log terms inside a DECIMAL sum and the 1-row x_min
    broadcast."""
    od = load_table(spark, sf_dir, "orders")
    spend = od.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("spend")
    )
    ranked = spend.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.desc("spend"), "o_custkey")
        ),
    ).filter(F.col("rn") <= _HILL_K + 1)
    xmin = ranked.filter(F.col("rn") == _HILL_K + 1).select(
        F.col("spend").alias("x_k")
    )
    hill = (
        ranked.filter(F.col("rn") <= _HILL_K)
        .crossJoin(F.broadcast(xmin))
        .agg(
            F.sum(
                F.round(F.log(F.col("spend") / F.col("x_k")), 9).cast(
                    "decimal(18,9)"
                )
            )
            .cast("double")
            .alias("s"),
            F.count("*").cast("long").alias("k"),
        )
    )
    return hill.crossJoin(F.broadcast(xmin)).select(
        "k",
        F.round("x_k", 4).alias("x_min"),
        F.round(F.col("s") / F.col("k"), 6).alias("mean_log_excess"),
        F.round(F.col("k") / F.col("s"), 6).alias("hill_alpha"),
        (F.col("k") / F.col("s") < F.lit(2).cast("double")).alias(
            "infinite_variance_flag"
        ),
    )


@query(
    "q_segment_migration",
    oracle="""
    WITH u AS MATERIALIZED (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND ts < TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END) AS BIGINT) AS p1,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END) AS BIGINT) AS p2
        FROM events GROUP BY user_id),
    cuts AS (
        SELECT (SELECT ROUND(CAST(quantile_cont(p1, 0.5) AS DOUBLE), 6)
                FROM u WHERE p1 > 0) AS m1,
               (SELECT ROUND(CAST(quantile_cont(p2, 0.5) AS DOUBLE), 6)
                FROM u WHERE p2 > 0) AS m2),
    tagged AS (
        SELECT CASE WHEN p1 = 0 THEN 'none'
                    WHEN p1 > m1 THEN 'high' ELSE 'low' END
                   AS from_segment,
               CASE WHEN p2 = 0 THEN 'none'
                    WHEN p2 > m2 THEN 'high' ELSE 'low' END
                   AS to_segment
        FROM u CROSS JOIN cuts),
    m AS (
        SELECT from_segment, to_segment,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM tagged GROUP BY 1, 2)
    SELECT from_segment, to_segment, n_users,
           ROUND(CAST(n_users AS DOUBLE)
                 / SUM(n_users) OVER (PARTITION BY from_segment), 6)
               AS row_share
    FROM m
    """,
)
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-migration matrix — the lifecycle view RFM
    snapshots miss: each user's purchase-activity tier (high / low /
    none, split at the active-user median) in the first half-month
    crossed with their tier in the second, as counts and row-share
    transition probabilities.  The high->none cell IS the churn rate
    of your best customers; none->high is reactivation — the numbers
    retention teams actually act on (and the empirical transition
    matrix a Markov LTV model consumes).

    One conditional scan builds both periods' per-user counts (no
    period self-join of the log); median cuts are exact interpolated
    percentiles over the active subset (q_percentiles parity),
    broadcast as a 1-row scalar; the matrix and its row-normalized
    shares live on the <=9-cell frame.  Integer counts keep every
    ratio bit-deterministic."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") < F.lit("2024-01-16")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("p1"),
        F.sum(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.lit("2024-01-16")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("p2"),
    )
    u = u.localCheckpoint()
    m1 = u.filter(F.col("p1") > 0).agg(
        F.round(F.percentile("p1", 0.5), 6).alias("m1")
    )
    m2 = u.filter(F.col("p2") > 0).agg(
        F.round(F.percentile("p2", 0.5), 6).alias("m2")
    )
    tagged = (
        u.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m2))
        .select(
            F.when(F.col("p1") == 0, "none")
            .when(F.col("p1") > F.col("m1"), "high")
            .otherwise("low")
            .alias("from_segment"),
            F.when(F.col("p2") == 0, "none")
            .when(F.col("p2") > F.col("m2"), "high")
            .otherwise("low")
            .alias("to_segment"),
        )
    )
    m = tagged.groupBy("from_segment", "to_segment").agg(
        F.count("*").cast("long").alias("n_users")
    )
    return m.select(
        "from_segment",
        "to_segment",
        "n_users",
        F.round(
            F.col("n_users").cast("double")
            / F.sum("n_users").over(
                Window.partitionBy("from_segment")
            ),
            6,
        ).alias("row_share"),
    )


@query(
    "q_price_elasticity",
    oracle="""
    WITH raw AS (
        SELECT p.p_brand AS brand,
               ROUND(ln(l.l_extendedprice / l.l_quantity), 9) AS x,
               ROUND(ln(CAST(l.l_quantity AS DOUBLE)), 9) AS y0
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity > 0 AND l.l_extendedprice > 0),
    obs AS (
        SELECT brand, x,
               CASE WHEN ('0x' || substr(md5(brand), 1, 8))::BIGINT
                         % 2 = 0
                    THEN ROUND(y0 - 1.5 * x, 9) ELSE y0 END AS y
        FROM raw),
    s AS (
        SELECT brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,9)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(ROUND(x * y, 9) AS DECIMAL(28,9)))
                    AS DOUBLE) AS sxy
        FROM obs GROUP BY brand)
    SELECT brand, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS elasticity,
           ROUND((sy - ((n * sxy - sx * sy)
                        / (n * sxx - sx * sx)) * sx) / n, 6)
               AS ln_q_at_unit_price,
           (n * sxy - sx * sy) / (n * sxx - sx * sx)
               < CAST(-1 AS DOUBLE) AS elastic_flag
    FROM s
    """,
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand — the log-log OLS
    (ln quantity on ln unit price) whose slope is THE pricing-team
    number: elasticity < -1 means revenue rises when price drops
    (flagged), > -1 means the brand tolerates increases; md5-even
    brands carry a planted -1.5 demand response so the flag is
    non-vacuous on the synthetic data.  The
    econometric twin of q_trend's time OLS, on economic axes.

    One join + one grouped sufficient-stats scan: per-observation ln
    terms round to 9 dp before DECIMAL sums (libm), the closed-form
    slope/intercept are identical IEEE expressions on the 25-row
    brand frame, and the part dimension broadcasts.  A 100 TB
    lineitem costs exactly one shuffle keyed on brand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    obs = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(
            (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.round(
                F.log(F.col("l_extendedprice") / F.col("l_quantity")),
                9,
            ).alias("x"),
            F.round(
                F.log(F.col("l_quantity").cast("double")), 9
            ).alias("y0"),
        )
    )
    # planted demand response: md5-even brands get y -= 1.5x, giving
    # them a true elasticity near -1.5.  TPC-H's l_extendedprice is
    # quantity * retailprice, so the raw slope is ~0 for every brand
    # and elastic_flag was constant-False (round-8 degeneracy audit).
    obs = obs.select(
        "brand",
        "x",
        F.when(
            F.conv(F.substring(F.md5("brand"), 1, 8), 16, 10).cast(
                "long"
            )
            % 2
            == 0,
            F.round(F.col("y0") - F.lit(1.5) * F.col("x"), 9),
        )
        .otherwise(F.col("y0"))
        .alias("y"),
    )

    def d9(c):
        return F.sum(c.cast("decimal(28,9)")).cast("double")

    s = obs.groupBy("brand").agg(
        F.count("*").cast("long").alias("n"),
        d9(F.col("x")).alias("sx"),
        d9(F.col("y")).alias("sy"),
        d9(F.round(F.col("x") * F.col("x"), 9)).alias("sxx"),
        d9(F.round(F.col("x") * F.col("y"), 9)).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (n * F.col("sxy") - sx * sy) / (
        n * F.col("sxx") - sx * sx
    )
    return s.select(
        "brand",
        "n",
        F.round(slope, 6).alias("elasticity"),
        F.round((sy - slope * sx) / n, 6).alias("ln_q_at_unit_price"),
        (slope < F.lit(-1).cast("double")).alias("elastic_flag"),
    )


@query(
    "q_offpolicy_eval",
    oracle="""
    WITH logged AS MATERIALIZED (
        SELECT CAST(date_diff('day', DATE '2024-01-01',
                    CAST(ts AS DATE)) + 1 AS BIGINT) AS day,
               event_type AS action,
               CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS r
        FROM events),
    prop AS (
        SELECT day, action,
               CAST(COUNT(*) AS DOUBLE)
               / SUM(COUNT(*)) OVER (PARTITION BY day) AS p
        FROM logged GROUP BY day, action),
    hist AS (
        SELECT day, action,
               ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mr
        FROM logged GROUP BY day, action),
    pi AS MATERIALIZED (
        SELECT day, action AS target
        FROM (SELECT h.day + 1 AS day, h.action,
                     ROW_NUMBER() OVER (PARTITION BY h.day
                         ORDER BY h.mr DESC, h.action) AS rn
              FROM hist h) x
        WHERE rn = 1),
    scored AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l.action = pi.target
                    THEN CAST(ROUND(CAST(l.r AS DOUBLE) / pr.p, 6)
                         AS DECIMAL(28,6))
                    ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                   AS sw_r,
               CAST(SUM(CASE WHEN l.action = pi.target
                    THEN CAST(ROUND(CAST(1 AS DOUBLE) / pr.p, 6)
                         AS DECIMAL(28,6))
                    ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                   AS sw,
               CAST(SUM(CASE WHEN l.action = pi.target
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
        FROM logged l
        JOIN pi ON l.day = pi.day
        JOIN prop pr ON l.day = pr.day AND l.action = pr.action),
    base AS (
        SELECT CAST(SUM(r) AS DOUBLE) / COUNT(*) AS avg_logged
        FROM logged WHERE day >= 2)
    SELECT s.n, s.n_matched,
           ROUND(s.sw_r / s.n, 6) AS ips_value,
           ROUND(s.sw_r / s.sw, 6) AS snips_value,
           ROUND(b.avg_logged, 6) AS logged_value
    FROM scored s CROSS JOIN base b
    """,
)
def q_offpolicy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation by inverse propensity scoring — the
    counterfactual question every recommender change starts with:
    WITHOUT deploying, what value would the greedy
    yesterday's-best-arm policy have earned on the logged traffic?
    IPS reweights logged rewards by 1/p(action|day) where the target
    agrees with the log; SNIPS (self-normalized) divides by realized
    weight mass to cut variance; both sit next to the logged
    average for the lift readout.  Pairs with q_ucb_bandit: that
    replays a LEARNING policy, this evaluates a FIXED one
    counterfactually.

    Empirical propensities and the target policy both come from
    bounded day x arm frames (the target uses day-1 means — leak-free
    by construction); the scoring scan joins the log against those
    two small broadcasts once.  Per-row IPS weights round to 6 dp
    before DECIMAL sums, so the estimate is partition-order exact."""
    ev = load_table(spark, sf_dir, "events")
    logged = ev.select(
        (
            F.datediff(
                F.to_date("ts"), F.lit("2024-01-01").cast("date")
            )
            + 1
        )
        .cast("long")
        .alias("day"),
        F.col("event_type").alias("action"),
        F.round(F.col("value"), 6).cast("decimal(18,6)").alias("r"),
    )
    logged = logged.localCheckpoint()
    prop = logged.groupBy("day", "action").agg(
        F.count("*").alias("c")
    )
    prop = prop.select(
        "day",
        "action",
        (
            F.col("c").cast("double")
            / F.sum("c").over(Window.partitionBy("day"))
        ).alias("p"),
    )
    hist = logged.groupBy("day", "action").agg(
        F.round(
            F.sum("r").cast("double") / F.count("*"), 6
        ).alias("mr")
    )
    pi = (
        hist.select(
            (F.col("day") + 1).alias("day"),
            "action",
            F.row_number()
            .over(
                Window.partitionBy("day").orderBy(
                    F.desc("mr"), "action"
                )
            )
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("day", F.col("action").alias("target"))
    )
    match = F.col("action") == F.col("target")
    z = F.lit(0).cast("decimal(28,6)")
    scored = (
        logged.join(F.broadcast(pi), "day")
        .join(F.broadcast(prop), ["day", "action"])
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(
                    match,
                    F.round(
                        F.col("r").cast("double") / F.col("p"), 6
                    ).cast("decimal(28,6)"),
                ).otherwise(z)
            )
            .cast("double")
            .alias("sw_r"),
            F.sum(
                F.when(
                    match,
                    F.round(
                        F.lit(1).cast("double") / F.col("p"), 6
                    ).cast("decimal(28,6)"),
                ).otherwise(z)
            )
            .cast("double")
            .alias("sw"),
            F.sum(F.when(match, 1).otherwise(0))
            .cast("long")
            .alias("n_matched"),
        )
    )
    base = logged.filter(F.col("day") >= 2).agg(
        (F.sum("r").cast("double") / F.count("*")).alias("avg_logged")
    )
    return scored.crossJoin(F.broadcast(base)).select(
        "n",
        "n_matched",
        F.round(F.col("sw_r") / F.col("n"), 6).alias("ips_value"),
        F.round(F.col("sw_r") / F.col("sw"), 6).alias("snips_value"),
        F.round("avg_logged", 6).alias("logged_value"),
    )


@query(
    "q_growth_accounting",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '2024-01-01',
                    CAST(ts AS DATE)) AS BIGINT) AS day
        FROM events),
    seq AS (
        SELECT user_id, day,
               LAG(day) OVER (PARTITION BY user_id ORDER BY day)
                   AS prev
        FROM ud),
    tagged AS (
        SELECT day,
               CASE WHEN prev IS NULL THEN 'new'
                    WHEN day - prev = 1 THEN 'retained'
                    ELSE 'resurrected' END AS kind
        FROM seq),
    daily AS (
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(SUM(CASE kind WHEN 'new' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE kind WHEN 'retained' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(SUM(CASE kind WHEN 'resurrected' THEN 1 ELSE 0
                    END) AS BIGINT) AS n_resurrected
        FROM tagged GROUP BY day),
    acc AS (
        SELECT *,
               LAG(n_active) OVER (ORDER BY day) - n_retained
                   AS n_churned
        FROM daily)
    SELECT day, n_active, n_new, n_retained, n_resurrected,
           n_churned,
           CASE WHEN n_churned > 0
                THEN ROUND(CAST(n_new + n_resurrected AS DOUBLE)
                           / n_churned, 6)
           END AS quick_ratio
    FROM acc
    """,
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting — the a16z/Social-Capital DAU decomposition
    every consumer dashboard leads with: each day's actives split
    into new (first-ever day), retained (also active yesterday), and
    resurrected (returning after a gap); churned = yesterday's
    actives who didn't return; quick ratio = (new + resurrected) /
    churned, the single number that says whether growth is
    acquisition or leakage.

    One DISTINCT shuffle to (user, day), one per-user LAG window
    (partitioned — never global), then everything lives on the
    30-row daily frame.  Pure integer counts: every ratio is
    bit-deterministic; days with zero churn yield NULL quick ratio
    identically on both engines."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day"),
    ).distinct()
    seq = ud.withColumn(
        "prev",
        F.lag("day").over(
            Window.partitionBy("user_id").orderBy("day")
        ),
    )
    kind = (
        F.when(F.col("prev").isNull(), "new")
        .when(F.col("day") - F.col("prev") == 1, "retained")
        .otherwise("resurrected")
    )
    daily = (
        seq.select("day", kind.alias("kind"))
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum(F.when(F.col("kind") == "new", 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(
                F.when(F.col("kind") == "retained", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_retained"),
            F.sum(
                F.when(F.col("kind") == "resurrected", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_resurrected"),
        )
    )
    acc = daily.withColumn(
        "n_churned",
        F.lag("n_active").over(Window.orderBy("day"))
        - F.col("n_retained"),
    )
    return acc.select(
        "day",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_churned",
        F.when(
            F.col("n_churned") > 0,
            F.round(
                (F.col("n_new") + F.col("n_resurrected")).cast(
                    "double"
                )
                / F.col("n_churned"),
                6,
            ),
        ).alias("quick_ratio"),
    )


@query(
    "q_threshold_tuning",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND ts < TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END) AS BIGINT) AS score,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '2024-01-16'
                        AND value >= 150 THEN 1 ELSE 0 END)
                    AS BIGINT) AS label
        FROM events GROUP BY user_id),
    bins AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(label) AS BIGINT) AS pos
        FROM u GROUP BY score),
    tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS p,
                   CAST(SUM(n) AS BIGINT) AS nn FROM bins),
    sweep AS (
        SELECT b.score AS threshold,
               SUM(b2.pos) AS tp,
               SUM(b2.n - b2.pos) AS fp
        FROM bins b JOIN bins b2 ON b2.score >= b.score
        GROUP BY b.score),
    scored AS (
        SELECT s.threshold,
               CAST(s.tp AS BIGINT) AS tp,
               CAST(s.fp AS BIGINT) AS fp,
               CAST(t.p - s.tp AS BIGINT) AS fn,
               ROUND(CAST(s.tp AS DOUBLE) / (s.tp + s.fp), 6)
                   AS precision,
               ROUND(CAST(s.tp AS DOUBLE) / t.p, 6) AS recall,
               ROUND(CAST(2 * s.tp AS DOUBLE)
                     / (2 * s.tp + s.fp + (t.p - s.tp)), 6) AS f1
        FROM sweep s CROSS JOIN tot t)
    SELECT *,
           CAST(ROW_NUMBER() OVER (ORDER BY f1 DESC, threshold DESC)
                AS BIGINT) = 1 AS is_best
    FROM scored
    """,
)
def q_threshold_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-threshold tuning — the step between a scored model
    and a shipped classifier that q_auc (ranking) and q_calibration
    (probability trust) don't answer: sweep every candidate cut of
    the score, report the confusion counts / precision / recall /
    F1 at each, and flag the F1-argmax (ties to the higher, more
    conservative threshold).  The positive label is a HIGH-VALUE
    (>=150) second-half purchase — an any-purchase label is
    constant-1 on the testdata, making fp/precision vacuous (round-8
    degeneracy audit).  F1 = 2TP/(2TP+FP+FN) written as one
    integer-ratio expression.

    Scores compress to a value-bounded bin frame in one scan; the
    sweep is a bins x bins containment join on that BOUNDED frame
    (distinct integer scores, never users^2), and all metrics are
    ratios of integers — bit-deterministic everywhere."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") < F.lit("2024-01-16")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.lit("2024-01-16"))
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("label"),
    )
    bins = u.groupBy("score").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("label").cast("long").alias("pos"),
    )
    bins = bins.localCheckpoint()
    tot = bins.agg(
        F.sum("pos").cast("long").alias("p"),
        F.sum("n").cast("long").alias("nn"),
    )
    b, b2 = bins.alias("b"), bins.alias("b2")
    sweep = (
        b.join(F.broadcast(b2), F.col("b2.score") >= F.col("b.score"))
        .groupBy(F.col("b.score").alias("threshold"))
        .agg(
            F.sum("b2.pos").cast("long").alias("tp"),
            F.sum(F.col("b2.n") - F.col("b2.pos"))
            .cast("long")
            .alias("fp"),
        )
    )
    scored = sweep.crossJoin(F.broadcast(tot)).select(
        "threshold",
        "tp",
        "fp",
        (F.col("p") - F.col("tp")).cast("long").alias("fn"),
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")),
            6,
        ).alias("precision"),
        F.round(F.col("tp").cast("double") / F.col("p"), 6).alias(
            "recall"
        ),
        F.round(
            (2 * F.col("tp")).cast("double")
            / (
                2 * F.col("tp")
                + F.col("fp")
                + (F.col("p") - F.col("tp"))
            ),
            6,
        ).alias("f1"),
    )
    return scored.withColumn(
        "is_best",
        F.row_number().over(
            Window.orderBy(F.desc("f1"), F.desc("threshold"))
        ).cast("long")
        == 1,
    )


_EMD_BIN = 2.0  # value-histogram bin width for the 1-D EMD


#: Shared 1-D EMD oracle (batch q_wasserstein and its streaming twin
#: q_stream_drift compute the identical result).
_EMD_ORACLE = f"""
    WITH b AS (
        SELECT event_type,
               CAST(FLOOR(value / CAST({_EMD_BIN} AS DOUBLE))
                    AS BIGINT) AS bin,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END) AS DOUBLE) AS c1,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END) AS DOUBLE) AS c2
        FROM events GROUP BY 1, 2),
    t AS (
        SELECT event_type,
               SUM(c1) AS n1, SUM(c2) AS n2
        FROM b GROUP BY event_type),
    cdf AS (
        SELECT b.event_type, b.bin,
               SUM(b.c1) OVER (PARTITION BY b.event_type
                   ORDER BY b.bin) / t.n1 AS f1,
               SUM(b.c2) OVER (PARTITION BY b.event_type
                   ORDER BY b.bin) / t.n2 AS f2
        FROM b JOIN t ON b.event_type = t.event_type)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(CAST(SUM(CAST(ROUND(
               ABS(f1 - f2) * CAST({_EMD_BIN} AS DOUBLE), 9)
               AS DECIMAL(18,9))) AS DOUBLE), 6) AS emd,
           ROUND(MAX(ABS(f1 - f2)), 6) AS ks_stat
    FROM cdf GROUP BY event_type
    """


@query("q_wasserstein", oracle=_EMD_ORACLE)
def q_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth mover's) distance between each event
    type's first- and second-half value distributions — completing
    the drift-metric trio with the one that carries UNITS: PSI
    (q_psi_drift) is scale-free, KS (q_ks_test) only sees the worst
    point, EMD integrates |CDF1 - CDF2| so it reports HOW MUCH value
    mass moved HOW FAR (in currency units) — the number a
    drift-triggered retraining policy can threshold meaningfully.
    The KS statistic rides along from the same CDFs for free.

    In 1-D the optimal transport has the closed-form CDF integral —
    no Sinkhorn iterations: one conditional scan to the bin histogram,
    deterministic-order cumulative windows per type (integer counts,
    so the CDFs are exact ratios), per-bin terms round to 9 dp before
    the DECIMAL sum.  Bin-boundary quantization biases EMD by at most
    one bin width — the bound a monitoring threshold absorbs."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / F.lit(_EMD_BIN).cast("double"))
        .cast("long")
        .alias("bin"),
    ).agg(
        F.sum(
            F.when(F.col("ts") < F.lit("2024-01-16"), 1).otherwise(0)
        )
        .cast("double")
        .alias("c1"),
        F.sum(
            F.when(F.col("ts") >= F.lit("2024-01-16"), 1).otherwise(
                0
            )
        )
        .cast("double")
        .alias("c2"),
    )
    t = b.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = b.join(t, "event_type").select(
        "event_type",
        "bin",
        (F.sum("c1").over(wc) / F.col("n1")).alias("f1"),
        (F.sum("c2").over(wc) / F.col("n2")).alias("f2"),
    )
    diff = F.abs(F.col("f1") - F.col("f2"))
    return cdf.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_bins"),
        F.round(
            F.sum(
                F.round(
                    diff * F.lit(_EMD_BIN).cast("double"), 9
                ).cast("decimal(18,9)")
            ).cast("double"),
            6,
        ).alias("emd"),
        F.round(F.max(diff), 6).alias("ks_stat"),
    )


@query(
    "q_covariate_balance",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(MAX(user_id % 2 = 0) AS BIGINT) AS treat,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS n_days,
               CAST(SUM(CASE WHEN event_type = 'error'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
        FROM events WHERE ts < TIMESTAMP '2024-01-16'
        GROUP BY user_id),
    long AS (
        SELECT treat, 'n_events' AS covariate,
               CAST(n_events AS DOUBLE) AS v FROM u
        UNION ALL
        SELECT treat, 'n_days', CAST(n_days AS DOUBLE) FROM u
        UNION ALL
        SELECT treat, 'n_errors', CAST(n_errors AS DOUBLE) FROM u),
    s AS (
        SELECT covariate, treat,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS sv,
               CAST(SUM(CAST(v AS DECIMAL(18,4))
                        * CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS svv
        FROM long GROUP BY covariate, treat),
    w AS (
        SELECT t.covariate,
               t.sv / t.n AS mt, c.sv / c.n AS mc,
               (t.svv - t.sv * t.sv / t.n) / (t.n - 1) AS vt,
               (c.svv - c.sv * c.sv / c.n) / (c.n - 1) AS vc
        FROM s t JOIN s c ON t.covariate = c.covariate
        WHERE t.treat = 1 AND c.treat = 0)
    SELECT covariate,
           ROUND(mt, 6) AS mean_treat,
           ROUND(mc, 6) AS mean_control,
           ROUND((mt - mc) / sqrt((vt + vc) / 2), 6) AS smd,
           ABS((mt - mc) / sqrt((vt + vc) / 2))
               <= CAST(0.1 AS DOUBLE) AS balanced
    FROM w
    """,
)
def q_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance table — the Table-1 check that must pass
    BEFORE any causal readout is trusted: standardized mean
    differences (SMD) of pre-period covariates between arms, flagged
    against the |SMD| <= 0.1 convention.  Unbalanced covariates mean
    the 'randomization' wasn't (or the observational arms need
    q_stratified_ate / matching); pairs with q_srm, which checks
    counts where this checks composition.

    One pre-period scan builds per-user covariates, an unpivot stacks
    them long-form in the same pass, and DECIMAL sufficient stats per
    (covariate, arm) feed the textbook pooled-SD SMD on a 3-row
    frame."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.filter(F.col("ts") < F.lit("2024-01-16"))
        .groupBy("user_id")
        .agg(
            F.max((F.col("user_id") % 2 == 0).cast("long")).alias(
                "treat"
            ),
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct(F.to_date("ts")).cast("long").alias(
                "n_days"
            ),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_errors"),
        )
    )
    long = u.select(
        "treat",
        F.expr(
            "stack(3, 'n_events', CAST(n_events AS DOUBLE), "
            "'n_days', CAST(n_days AS DOUBLE), "
            "'n_errors', CAST(n_errors AS DOUBLE))"
        ).alias("covariate", "v"),
    )
    dv = F.col("v").cast("decimal(18,4)")
    s = long.groupBy("covariate", "treat").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dv).cast("double").alias("sv"),
        F.sum(dv * dv).cast("double").alias("svv"),
    )
    t = s.filter(F.col("treat") == 1).drop("treat")
    c = s.filter(F.col("treat") == 0).drop("treat")
    w = t.alias("t").join(c.alias("c"), "covariate").select(
        "covariate",
        (F.col("t.sv") / F.col("t.n")).alias("mt"),
        (F.col("c.sv") / F.col("c.n")).alias("mc"),
        (
            (F.col("t.svv") - F.col("t.sv") * F.col("t.sv") / F.col("t.n"))
            / (F.col("t.n") - 1)
        ).alias("vt"),
        (
            (F.col("c.svv") - F.col("c.sv") * F.col("c.sv") / F.col("c.n"))
            / (F.col("c.n") - 1)
        ).alias("vc"),
    )
    smd = (F.col("mt") - F.col("mc")) / F.sqrt(
        (F.col("vt") + F.col("vc")) / 2
    )
    return w.select(
        "covariate",
        F.round("mt", 6).alias("mean_treat"),
        F.round("mc", 6).alias("mean_control"),
        F.round(smd, 6).alias("smd"),
        (F.abs(smd) <= F.lit(0.1).cast("double")).alias("balanced"),
    )


@query(
    "q_qte",
    oracle="""
    WITH v AS (
        SELECT CAST(user_id % 2 = 0 AS BIGINT) AS treat,
               value
        FROM events WHERE event_type = 'purchase'),
    t AS (SELECT
            ROUND(CAST(quantile_cont(value, 0.25) AS DOUBLE), 6) AS t0,
            ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS t1,
            ROUND(CAST(quantile_cont(value, 0.75) AS DOUBLE), 6) AS t2,
            ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 6) AS t3
          FROM v WHERE treat = 1),
    c AS (SELECT
            ROUND(CAST(quantile_cont(value, 0.25) AS DOUBLE), 6) AS c0,
            ROUND(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS c1,
            ROUND(CAST(quantile_cont(value, 0.75) AS DOUBLE), 6) AS c2,
            ROUND(CAST(quantile_cont(value, 0.9) AS DOUBLE), 6) AS c3
          FROM v WHERE treat = 0)
    SELECT CAST(0.25 AS DOUBLE) AS q, t0 AS q_treat, c0 AS q_control,
           ROUND(t0 - c0, 6) AS qte FROM t, c
    UNION ALL
    SELECT CAST(0.5 AS DOUBLE), t1, c1, ROUND(t1 - c1, 6) FROM t, c
    UNION ALL
    SELECT CAST(0.75 AS DOUBLE), t2, c2, ROUND(t2 - c2, 6) FROM t, c
    UNION ALL
    SELECT CAST(0.9 AS DOUBLE), t3, c3, ROUND(t3 - c3, 6) FROM t, c
    """,
)
def q_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects — where the mean (q_ab_test) hides
    the story: the arm difference at the 25th/50th/75th/90th
    percentiles of purchase value shows WHERE in the distribution a
    treatment acts (a promo that lifts the median but shrinks the
    tail nets to zero mean effect and two wrong decisions).  The
    distributional shelf-mate of q_wasserstein: EMD integrates the
    gap, this localizes it.

    Exact interpolated per-arm quantiles (q_percentiles'
    quantile_cont parity, one aggregate per arm), crossed with the
    4-row quantile grid — at extreme scale swap percentile_approx
    per q_percentiles' note; the comparison shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2 == 0).cast("long").alias("treat"),
        "value",
    )
    qs = [0.25, 0.5, 0.75, 0.9]
    t = v.filter(F.col("treat") == 1).agg(
        *[
            F.round(F.percentile("value", q), 6).alias(f"t{i}")
            for i, q in enumerate(qs)
        ]
    )
    c = v.filter(F.col("treat") == 0).agg(
        *[
            F.round(F.percentile("value", q), 6).alias(f"c{i}")
            for i, q in enumerate(qs)
        ]
    )
    grid = spark.createDataFrame(
        [(i, q) for i, q in enumerate(qs)], "i int, q double"
    )
    joined = grid.crossJoin(F.broadcast(t)).crossJoin(F.broadcast(c))
    qt = F.coalesce(
        *[
            F.when(F.col("i") == i, F.col(f"t{i}"))
            for i in range(len(qs))
        ]
    )
    qc = F.coalesce(
        *[
            F.when(F.col("i") == i, F.col(f"c{i}"))
            for i in range(len(qs))
        ]
    )
    return joined.select(
        "q",
        qt.alias("q_treat"),
        qc.alias("q_control"),
        F.round(qt - qc, 6).alias("qte"),
    )


@query(
    "q_experiment_readout",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                    THEN CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS sa,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                    THEN CAST(value AS DECIMAL(18,4))
                         * CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(36,8)) END) AS DOUBLE)
                   AS ssa,
               CAST(SUM(CASE WHEN user_id % 2 = 1
                    THEN CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   AS sb,
               CAST(SUM(CASE WHEN user_id % 2 = 1
                    THEN CAST(value AS DECIMAL(18,4))
                         * CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(36,8)) END) AS DOUBLE)
                   AS ssb
        FROM events GROUP BY event_type),
    m AS (
        SELECT event_type, n_a, n_b,
               (n_a - (n_a + n_b) / CAST(2 AS DOUBLE))
               * (n_a - (n_a + n_b) / CAST(2 AS DOUBLE))
               / ((n_a + n_b) / CAST(2 AS DOUBLE))
               + (n_b - (n_a + n_b) / CAST(2 AS DOUBLE))
               * (n_b - (n_a + n_b) / CAST(2 AS DOUBLE))
               / ((n_a + n_b) / CAST(2 AS DOUBLE)) AS chi2,
               sa / n_a - sb / n_b AS diff,
               (sa / n_a - sb / n_b)
               / sqrt((ssa - sa * sa / n_a) / (n_a - 1) / n_a
                      + (ssb - sb * sb / n_b) / (n_b - 1) / n_b)
                   AS t
        FROM s)
    SELECT event_type, n_a, n_b,
           ROUND(chi2, 6) AS srm_chi2,
           chi2 > CAST(3.841 AS DOUBLE) AS srm_flag,
           ROUND(diff, 6) AS mean_diff,
           ROUND(t, 6) AS t_stat,
           CASE WHEN chi2 > CAST(3.841 AS DOUBLE)
                THEN 'invalid_srm'
                WHEN ABS(t) >= CAST(1.96 AS DOUBLE) AND diff > 0
                THEN 'ship'
                WHEN ABS(t) >= CAST(1.96 AS DOUBLE)
                THEN 'regress'
                ELSE 'inconclusive' END AS verdict
    FROM m
    """,
)
def q_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed experiment-decision DAG — q_corpus_curate's role
    for the experimentation shelf: per metric (event type), ONE
    conditionally-aggregated scan feeds the SRM validity gate
    (q_srm's chi-square), the Welch effect readout (q_ab_test's
    sufficient-stats t), and the shipping verdict — invalid_srm
    trumps everything (a significant effect on a broken randomizer
    is still invalid), then ship / regress / inconclusive at the
    two-sided 5% level.  This is the artifact an experimentation
    platform renders per metric; the deeper diagnostics (q_cuped
    variance reduction, q_qte distributional effects, q_msprt
    always-valid monitoring, q_covariate_balance composition) hang
    off the same sufficient-stats scan shape.

    All gates and verdict branches are integer/DECIMAL-exact inputs
    into identical IEEE expressions, so the DECISION STRING itself
    is hash-verified — not just the statistics."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,4)")
    a = F.col("user_id") % 2 == 0
    z4, z8 = (
        F.lit(0).cast("decimal(18,4)"),
        F.lit(0).cast("decimal(36,8)"),
    )
    s = ev.groupBy("event_type").agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(a, v).otherwise(z4)).cast("double").alias("sa"),
        F.sum(F.when(a, v * v).otherwise(z8))
        .cast("double")
        .alias("ssa"),
        F.sum(F.when(~a, v).otherwise(z4)).cast("double").alias("sb"),
        F.sum(F.when(~a, v * v).otherwise(z8))
        .cast("double")
        .alias("ssb"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    e = (n_a + n_b) / F.lit(2).cast("double")
    chi2 = (n_a - e) * (n_a - e) / e + (n_b - e) * (n_b - e) / e
    diff = F.col("sa") / n_a - F.col("sb") / n_b
    t = diff / F.sqrt(
        (F.col("ssa") - F.col("sa") * F.col("sa") / n_a)
        / (n_a - 1)
        / n_a
        + (F.col("ssb") - F.col("sb") * F.col("sb") / n_b)
        / (n_b - 1)
        / n_b
    )
    thr = F.lit(3.841).cast("double")
    verdict = (
        F.when(chi2 > thr, "invalid_srm")
        .when(
            (F.abs(t) >= F.lit(1.96).cast("double")) & (diff > 0),
            "ship",
        )
        .when(F.abs(t) >= F.lit(1.96).cast("double"), "regress")
        .otherwise("inconclusive")
    )
    return s.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("srm_chi2"),
        (chi2 > thr).alias("srm_flag"),
        F.round(diff, 6).alias("mean_diff"),
        F.round(t, 6).alias("t_stat"),
        verdict.alias("verdict"),
    )


@query("q_stream_drift", oracle=_EMD_ORACLE)
def q_stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EMD drift monitor computed by the REAL Structured
    Streaming engine — q_wasserstein's streaming twin and the shape a
    production drift alarm actually runs: the event stream folds into
    per-(type, period, bin) histogram counts incrementally (histogram
    aggregation is mergeable, so the streaming state is bins x types,
    never rows), and the bounded CDF/EMD finish runs on the completed
    histogram.  Same oracle as the batch twin: streaming and batch
    must agree bit-for-bit.

    In production the period split is a sliding reference-vs-current
    window and the finish runs per trigger; availableNow + a fixed
    cut keeps the parity proof deterministic here."""
    import tempfile
    import uuid

    path_dir = sf_dir
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(
        f"{sf_dir}/events.parquet"
    ).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(path_dir)
    )
    if dict(
        (f.name, f.dataType.simpleString()) for f in raw_schema
    ).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    hist = (
        stream.groupBy(
            "event_type",
            F.floor(
                F.col("value") / F.lit(_EMD_BIN).cast("double")
            )
            .cast("long")
            .alias("bin"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("ts") < F.lit("2024-01-16"), 1
                ).otherwise(0)
            )
            .cast("double")
            .alias("c1"),
            F.sum(
                F.when(
                    F.col("ts") >= F.lit("2024-01-16"), 1
                ).otherwise(0)
            )
            .cast("double")
            .alias("c2"),
        )
    )
    sink = f"stream_drift_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="q_stream_drift_")
    q = (
        hist.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    b = spark.table(sink)
    t = (
        spark.table(sink)
        .groupBy(F.col("event_type").alias("et"))
        .agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    )
    t = t.withColumnRenamed("et", "event_type")
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = b.join(t, "event_type").select(
        "event_type",
        "bin",
        (F.sum("c1").over(wc) / F.col("n1")).alias("f1"),
        (F.sum("c2").over(wc) / F.col("n2")).alias("f2"),
    )
    diff = F.abs(F.col("f1") - F.col("f2"))
    return cdf.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_bins"),
        F.round(
            F.sum(
                F.round(
                    diff * F.lit(_EMD_BIN).cast("double"), 9
                ).cast("decimal(18,9)")
            ).cast("double"),
            6,
        ).alias("emd"),
        F.round(F.max(diff), 6).alias("ks_stat"),
    )


@query(
    "q_abc_analysis",
    oracle="""
    WITH rev AS (
        SELECT p.p_partkey,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_partkey),
    tot AS (SELECT SUM(revenue) AS t FROM rev),
    ranked AS (
        SELECT p_partkey, revenue,
               SUM(revenue) OVER (
                   ORDER BY revenue DESC, p_partkey) AS cum
        FROM rev),
    tagged AS (
        SELECT r.p_partkey,
               CAST(r.revenue AS DOUBLE) AS revenue,
               ROUND(CAST(r.cum AS DOUBLE) / CAST(t.t AS DOUBLE), 9)
                   AS cum_share
        FROM ranked r CROSS JOIN tot t)
    SELECT CASE WHEN cum_share <= CAST(0.7 AS DOUBLE) THEN 'A'
                WHEN cum_share <= CAST(0.9 AS DOUBLE) THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(CAST(revenue AS DECIMAL(18,4)))
                 AS DOUBLE), 2) AS class_revenue,
           ROUND(MIN(cum_share), 9) AS min_cum_share,
           ROUND(MAX(cum_share), 9) AS max_cum_share
    FROM tagged GROUP BY 1
    """,
)
def q_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification — the Pareto workhorse of supply
    chains: parts ranked by revenue, class A = the head covering 70%
    of cumulative revenue, B to 90%, C the long tail (each class gets
    its own stocking/audit policy).  The named business op on top of
    q_lorenz_gini's raw concentration curve.

    The cumulative share runs WITHOUT a global sort: parts bucket by
    a revenue-band coarse key, per-bucket DECIMAL subtotals cumulate
    on the bounded bucket frame (the q_prefix_sum / Blelloch shape),
    and each part adds its within-bucket running sum to its bucket's
    offset — one dimension-sized shuffle, windows only over bucket
    partitions.  All sums are exact DECIMAL, so the class boundaries
    are engine-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("revenue")
        )
    )
    rev = rev.localCheckpoint()
    tot = rev.agg(F.sum("revenue").alias("t"))
    # coarse revenue bands keep cumulation distributed: global order =
    # (band asc == revenue desc band, then revenue desc, partkey)
    band = (-F.floor(F.col("revenue") / 10000)).cast("long")
    banded = rev.withColumn("band", band)
    offsets = (
        banded.groupBy("band")
        .agg(F.sum("revenue").alias("bsum"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("bsum").over(
                    Window.orderBy("band").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("decimal(18,4)"),
            ),
        )
        .select("band", "offset")
    )
    wb = (
        Window.partitionBy("band")
        .orderBy(F.desc("revenue"), "p_partkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = (
        banded.join(F.broadcast(offsets), "band")
        .withColumn("cum", F.col("offset") + F.sum("revenue").over(wb))
    )
    tagged = ranked.crossJoin(F.broadcast(tot)).select(
        F.col("revenue").cast("double").alias("revenue"),
        F.round(
            F.col("cum").cast("double") / F.col("t").cast("double"), 9
        ).alias("cum_share"),
    )
    cls = (
        F.when(F.col("cum_share") <= F.lit(0.7).cast("double"), "A")
        .when(F.col("cum_share") <= F.lit(0.9).cast("double"), "B")
        .otherwise("C")
    )
    return tagged.groupBy(cls.alias("abc_class")).agg(
        F.count("*").cast("long").alias("n_parts"),
        F.round(
            F.sum(F.col("revenue").cast("decimal(18,4)")).cast(
                "double"
            ),
            2,
        ).alias("class_revenue"),
        F.round(F.min("cum_share"), 9).alias("min_cum_share"),
        F.round(F.max("cum_share"), 9).alias("max_cum_share"),
    )


@query(
    "q_causal_impact",
    oracle="""
    WITH daily AS MATERIALIZED (
        SELECT CAST(date_diff('day', DATE '2024-01-01',
                    CAST(ts AS DATE)) AS BIGINT) AS day,
               ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 6)
                   AS y,
               ROUND(CAST(SUM(CASE WHEN event_type = 'view'
                    THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 6)
                   AS x1,
               ROUND(CAST(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE), 6)
                   AS x2
        FROM events GROUP BY 1),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(ROUND(x1, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS sx1,
               CAST(SUM(CAST(ROUND(x2, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS sx2,
               CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS sy,
               CAST(SUM(CAST(ROUND(x1 * x1, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS s11,
               CAST(SUM(CAST(ROUND(x1 * x2, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS s12,
               CAST(SUM(CAST(ROUND(x2 * x2, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS s22,
               CAST(SUM(CAST(ROUND(x1 * y, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS s1y,
               CAST(SUM(CAST(ROUND(x2 * y, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS s2y
        FROM daily WHERE day < 15),
    inv AS (
        SELECT sy, s1y, s2y,
               (m22 * m33 - m23 * m23) / det AS a11,
               (m13 * m23 - m12 * m33) / det AS a12,
               (m12 * m23 - m13 * m22) / det AS a13,
               (m11 * m33 - m13 * m13) / det AS a22,
               (m13 * m12 - m11 * m23) / det AS a23,
               (m11 * m22 - m12 * m12) / det AS a33
        FROM (SELECT *,
                     m11 * (m22 * m33 - m23 * m23)
                     - m12 * (m12 * m33 - m23 * m13)
                     + m13 * (m12 * m23 - m22 * m13) AS det
              FROM (SELECT n AS m11, sx1 AS m12, sx2 AS m13,
                           s11 AS m22, s12 AS m23, s22 AS m33,
                           sy, s1y, s2y
                    FROM s) m) d),
    beta AS MATERIALIZED (
        SELECT ROUND(a11 * sy + a12 * s1y + a13 * s2y, 9) AS b0,
               ROUND(a12 * sy + a22 * s1y + a23 * s2y, 9) AS b1,
               ROUND(a13 * sy + a23 * s1y + a33 * s2y, 9) AS b2
        FROM inv),
    post AS (
        SELECT d.day, d.y AS actual,
               ROUND(b.b0 + b.b1 * d.x1 + b.b2 * d.x2, 6)
                   AS predicted
        FROM daily d CROSS JOIN beta b WHERE d.day >= 15)
    SELECT day, actual, predicted,
           ROUND(actual - predicted, 6) AS effect,
           CAST(SUM(CAST(ROUND(actual - predicted, 6)
                    AS DECIMAL(18,6))) OVER (ORDER BY day)
                AS DOUBLE) AS cum_effect
    FROM post
    """,
)
def q_causal_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic-control incrementality (CausalImpact-lite) — the
    counterfactual readout when there is NO holdout: fit the treated
    series (daily purchase revenue) on control series (view / click
    revenue, channels the intervention shouldn't touch) over the
    PRE-period, project the counterfactual through the post-period,
    and read pointwise + cumulative effects off the gap.  Completes
    the quasi-experimental pair with q_did (DiD needs a control
    COHORT; this needs only control SERIES).

    The pre-period OLS is the q_ridge/q_mahalanobis adjugate solve
    (3x3 normal equations from DECIMAL sufficient stats over the
    bounded daily frame, identical formula text both engines, betas
    rounded to 9 dp); post-period prediction is scalar math and the
    cumulative effect a DECIMAL running window over 15 rows.  One
    scan of the log, everything after is days-sized."""
    ev = load_table(spark, sf_dir, "events")

    def series(t):
        return F.round(
            F.sum(
                F.when(
                    F.col("event_type") == t,
                    F.round(F.col("value"), 6).cast("decimal(18,6)"),
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ).cast("double"),
            6,
        )

    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("day")
    ).agg(
        series("purchase").alias("y"),
        series("view").alias("x1"),
        series("click").alias("x2"),
    )
    daily = daily.localCheckpoint()

    def dsum(c):
        return F.sum(F.round(c, 6).cast("decimal(28,6)")).cast(
            "double"
        )

    s = (
        daily.filter(F.col("day") < 15)
        .agg(
            F.count("*").cast("double").alias("n"),
            dsum(F.col("x1")).alias("sx1"),
            dsum(F.col("x2")).alias("sx2"),
            dsum(F.col("y")).alias("sy"),
            dsum(F.col("x1") * F.col("x1")).alias("s11"),
            dsum(F.col("x1") * F.col("x2")).alias("s12"),
            dsum(F.col("x2") * F.col("x2")).alias("s22"),
            dsum(F.col("x1") * F.col("y")).alias("s1y"),
            dsum(F.col("x2") * F.col("y")).alias("s2y"),
        )
        .collect()[0]
    )
    m11, m12, m13 = s["n"], s["sx1"], s["sx2"]
    m22, m23, m33 = s["s11"], s["s12"], s["s22"]
    sy, s1y, s2y = s["sy"], s["s1y"], s["s2y"]
    det = (
        m11 * (m22 * m33 - m23 * m23)
        - m12 * (m12 * m33 - m23 * m13)
        + m13 * (m12 * m23 - m22 * m13)
    )
    a11 = (m22 * m33 - m23 * m23) / det
    a12 = (m13 * m23 - m12 * m33) / det
    a13 = (m12 * m23 - m13 * m22) / det
    a22 = (m11 * m33 - m13 * m13) / det
    a23 = (m13 * m12 - m11 * m23) / det
    a33 = (m11 * m22 - m12 * m12) / det
    b0 = round(a11 * sy + a12 * s1y + a13 * s2y, 9)
    b1 = round(a12 * sy + a22 * s1y + a23 * s2y, 9)
    b2 = round(a13 * sy + a23 * s1y + a33 * s2y, 9)
    pred = F.round(
        F.lit(b0) + F.lit(b1) * F.col("x1") + F.lit(b2) * F.col("x2"),
        6,
    )
    post = daily.filter(F.col("day") >= 15).select(
        "day",
        F.col("y").alias("actual"),
        pred.alias("predicted"),
    )
    eff = F.round(F.col("actual") - F.col("predicted"), 6)
    return post.select(
        "day",
        "actual",
        "predicted",
        eff.alias("effect"),
        F.sum(eff.cast("decimal(18,6)"))
        .over(
            Window.orderBy("day").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("double")
        .alias("cum_effect"),
    )


@query(
    "q_iv_2sls",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS BIGINT) AS z,
               CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               SUM(CAST(value AS DECIMAL(18,4))) AS y
        FROM events GROUP BY user_id),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(z) AS DOUBLE) AS sz,
               CAST(SUM(x) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(z * x) AS DOUBLE) AS szx,
               CAST(SUM(z * y) AS DOUBLE) AS szy
        FROM per_user)
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND((n * szx - sz * sx) / (n * sz - sz * sz), 6)
               AS first_stage,
           ROUND((n * szy - sz * sy) / (n * sz - sz * sz), 6)
               AS reduced_form,
           ROUND((n * szy - sz * sy) / (n * szx - sz * sx), 6)
               AS beta_iv
    FROM s
    """,
)
def q_iv_2sls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable effect estimation (Wald / single-
    instrument 2SLS): when exposure is self-selected (how many
    high-value events a user generates) but an ENCOURAGEMENT was
    randomized (the user_id parity assignment the experiment shelf
    uses throughout), beta_IV = cov(z, y) / cov(z, x) recovers the
    causal effect of one extra exposure on the outcome — the
    noncompliance-robust estimator q_ab_test (ITT) and
    q_stratified_ate (observational) both lack.  Also reports the
    first stage (instrument strength — a weak instrument makes the
    ratio explode) and the reduced form (ITT).

    Scale shape: one user-keyed aggregation compresses the event log
    to per-user (z, x, y) triples, then ONE global sufficient-stats
    aggregate (all sums exact: z, x are integers, y a DECIMAL) feeds
    closed-form ratios of identical IEEE expressions — no joins, no
    iteration, two shuffles total regardless of log size."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("y"),
    ).select(
        (F.col("user_id") % 2).cast("long").alias("z"), "x", "y"
    )
    s = per_user.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("z").cast("double").alias("sz"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("z") * F.col("x")).cast("double").alias("szx"),
        # z is 0/1, so z*y == conditional sum — avoids the DECIMAL
        # precision blow-up of an actual decimal product
        F.sum(F.when(F.col("z") == 1, F.col("y")).otherwise(F.lit(0)))
        .cast("double")
        .alias("szy"),
    )
    n, sz, sx, sy = F.col("n"), F.col("sz"), F.col("sx"), F.col("sy")
    szx, szy = F.col("szx"), F.col("szy")
    return s.select(
        n.cast("long").alias("n_users"),
        F.round((n * szx - sz * sx) / (n * sz - sz * sz), 6).alias(
            "first_stage"
        ),
        F.round((n * szy - sz * sy) / (n * sz - sz * sz), 6).alias(
            "reduced_form"
        ),
        F.round((n * szy - sz * sy) / (n * szx - sz * sx), 6).alias(
            "beta_iv"
        ),
    )


@query(
    "q_rdd",
    oracle="""
    WITH cust AS (
        SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS r
        FROM customer
        WHERE c_acctbal >= -1000.0 AND c_acctbal < 1000.0),
    y AS (
        SELECT o_custkey AS c_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders GROUP BY o_custkey),
    pts AS (
        SELECT cust.r,
               COALESCE(y.y, CAST(0 AS DECIMAL(18,2))) AS y,
               CASE WHEN cust.r >= 0 THEN 1 ELSE 0 END AS side
        FROM cust LEFT JOIN y USING (c_custkey)),
    s AS (
        SELECT side,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(r) AS DOUBLE) AS sr,
               CAST(SUM(CAST(r AS DECIMAL(36,4))
                        * CAST(r AS DECIMAL(36,4))) AS DOUBLE) AS srr,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(r AS DECIMAL(36,4))
                        * CAST(y AS DECIMAL(36,4))) AS DOUBLE) AS sry
        FROM pts GROUP BY side),
    fit AS (
        SELECT side, n,
               (n * sry - sr * sy) / (n * srr - sr * sr) AS slope,
               (sy - (n * sry - sr * sy) / (n * srr - sr * sr) * sr) / n
                   AS icpt
        FROM s),
    l AS (SELECT * FROM fit WHERE side = 0),
    rt AS (SELECT * FROM fit WHERE side = 1)
    SELECT CAST(l.n AS BIGINT) AS n_left,
           CAST(rt.n AS BIGINT) AS n_right,
           ROUND(l.icpt, 6) AS intercept_left,
           ROUND(rt.icpt, 6) AS intercept_right,
           ROUND(l.slope, 6) AS slope_left,
           ROUND(rt.slope, 6) AS slope_right,
           ROUND(rt.icpt - l.icpt, 6) AS rdd_effect
    FROM l CROSS JOIN rt
    """,
)
def q_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity: customers cross a policy
    cutoff at account balance 0 (credit hold lifts), so the jump in
    expected order revenue AT the cutoff identifies the policy effect
    — fit a local linear regression on each side of the cutoff within
    a +-1000 bandwidth and difference the intercepts (Imbens &
    Lemieux 2008's workhorse estimator).  Completes the
    quasi-experimental shelf next to q_did (parallel trends) and
    q_causal_impact (synthetic control): RDD needs neither a pre
    period nor a control market, only local randomization at the
    threshold.

    Scale shape: the bandwidth filter pushes to the customer scan,
    the outcome join is one key-partitioned hash join, and each
    side's OLS collapses to a 2-row sufficient-stats aggregate (all
    sums exact DECIMAL — balances and prices are 2 dp), so the
    closed-form slopes/intercepts are identical IEEE expressions.
    The final 1x1 cross join attaches two 1-row fits."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(
            (F.col("c_acctbal") >= -1000.0) & (F.col("c_acctbal") < 1000.0)
        )
        .select(
            "c_custkey", F.col("c_acctbal").cast("decimal(18,2)").alias("r")
        )
    )
    y = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
    )
    pts = cust.join(y, "c_custkey", "left").select(
        "r",
        F.coalesce(F.col("y"), F.lit(0).cast("decimal(18,2)")).alias("y"),
        F.when(F.col("r") >= 0, 1).otherwise(0).alias("side"),
    )
    # tight DECIMAL widths keep every product under Spark's 38-digit
    # cap WITHOUT precision-loss scale reduction: r fits (9,2) inside
    # the +-1000 bandwidth, r*r is (19,4), r*y is (38,4) — all exact
    rn = F.col("r").cast("decimal(9,2)")
    s = pts.groupBy("side").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("r").cast("double").alias("sr"),
        F.sum(rn * rn).cast("double").alias("srr"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(rn * F.col("y")).cast("double").alias("sry"),
    )
    n, sr, srr, sy, sry = (
        F.col("n"), F.col("sr"), F.col("srr"), F.col("sy"), F.col("sry"),
    )
    slope = (n * sry - sr * sy) / (n * srr - sr * sr)
    icpt = (sy - slope * sr) / n
    fit = s.select("side", "n", slope.alias("slope"), icpt.alias("icpt"))
    lf = fit.filter(F.col("side") == 0).select(
        F.col("n").alias("nl"),
        F.col("icpt").alias("il"),
        F.col("slope").alias("sl"),
    )
    rf = fit.filter(F.col("side") == 1).select(
        F.col("n").alias("nr"),
        F.col("icpt").alias("ir"),
        F.col("slope").alias("sr2"),
    )
    return lf.crossJoin(rf).select(
        F.col("nl").cast("long").alias("n_left"),
        F.col("nr").cast("long").alias("n_right"),
        F.round("il", 6).alias("intercept_left"),
        F.round("ir", 6).alias("intercept_right"),
        F.round("sl", 6).alias("slope_left"),
        F.round("sr2", 6).alias("slope_right"),
        F.round(F.col("ir") - F.col("il"), 6).alias("rdd_effect"),
    )


@query(
    "q_propensity_matching",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 = 0 AS INT) AS treat,
               CAST(COUNT(*) AS BIGINT) AS score,
               SUM(CAST(value AS DECIMAL(18,4))) AS y
        FROM events GROUP BY user_id),
    cgrp AS (
        SELECT score, SUM(y) AS cy, CAST(COUNT(*) AS BIGINT) AS cn
        FROM per_user WHERE treat = 0 GROUP BY score),
    tset AS (
        SELECT DISTINCT score FROM per_user WHERE treat = 1),
    frame AS (
        SELECT score, 0 AS ic, CAST(NULL AS BIGINT) AS cs FROM tset
        UNION ALL
        SELECT score, 1 AS ic, score AS cs FROM cgrp),
    nn AS (
        SELECT score, ic,
               last_value(cs IGNORE NULLS) OVER (
                   ORDER BY score, ic DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev_c,
               first_value(cs IGNORE NULLS) OVER (
                   ORDER BY score, ic DESC
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS next_c
        FROM frame),
    match AS (
        SELECT score,
               CASE WHEN prev_c IS NULL THEN next_c
                    WHEN next_c IS NULL THEN prev_c
                    WHEN score - prev_c <= next_c - score THEN prev_c
                    ELSE next_c END AS m
        FROM nn WHERE ic = 0),
    diffs AS (
        SELECT t.user_id, t.score, m.m,
               CAST(t.y AS DOUBLE)
                   - CAST(c.cy AS DOUBLE) / c.cn AS diff
        FROM per_user t
        JOIN match m ON m.score = t.score
        JOIN cgrp c ON c.score = m.m
        WHERE t.treat = 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM per_user
            WHERE treat = 0) AS n_controls,
           ROUND(CAST(SUM(CAST(ROUND(diff, 9) AS DECIMAL(28,9)))
                      AS DOUBLE) / COUNT(*), 6) AS att,
           ROUND(CAST(SUM(ABS(score - m)) AS DOUBLE) / COUNT(*), 6)
               AS mean_score_gap
    FROM diffs
    """,
)
def q_propensity_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor matching on a balancing score — the third leg
    of the observational-causal shelf (q_stratified_ate coarsens into
    strata, q_iv_2sls needs an instrument; matching needs neither):
    each treated user matches the control SCORE GROUP nearest to its
    own activity score (1-NN with replacement, distance ties prefer
    the lower score), and ATT = mean(y_treated - mean y of matched
    controls).  Also reports the mean matched-score gap — the balance
    diagnostic that says whether the estimate is trustworthy.

    Scale shape: the corpus-sized work is ONE user-keyed aggregation;
    matching then runs on the DISTINCT-SCORE frame (bounded by the
    max per-user activity, hundreds of rows at any corpus size) via
    two IGNORE-NULLS running windows over the interleaved
    treated/control score sets — the sort-merge formulation of 1-NN
    on a scalar, never a pairwise distance join.  Per-treated diffs
    round to 9 dp and accumulate in DECIMAL (order-free)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("score"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("y"),
    ).select(
        "user_id",
        (F.col("user_id") % 2 == 0).cast("int").alias("treat"),
        "score",
        "y",
    )
    cgrp = (
        per_user.filter(F.col("treat") == 0)
        .groupBy("score")
        .agg(F.sum("y").alias("cy"), F.count("*").cast("long").alias("cn"))
    )
    tset = (
        per_user.filter(F.col("treat") == 1).select("score").distinct()
    )
    frame = tset.select(
        "score", F.lit(0).alias("ic"), F.lit(None).cast("long").alias("cs")
    ).unionAll(
        cgrp.select("score", F.lit(1).alias("ic"), F.col("score").alias("cs"))
    )
    wp = (
        Window.orderBy(F.col("score"), F.desc("ic"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.orderBy(F.col("score"), F.desc("ic"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    nn = frame.select(
        "score",
        "ic",
        F.last("cs", ignorenulls=True).over(wp).alias("prev_c"),
        F.first("cs", ignorenulls=True).over(wn).alias("next_c"),
    )
    match = nn.filter(F.col("ic") == 0).select(
        "score",
        F.when(F.col("prev_c").isNull(), F.col("next_c"))
        .when(F.col("next_c").isNull(), F.col("prev_c"))
        .when(
            F.col("score") - F.col("prev_c")
            <= F.col("next_c") - F.col("score"),
            F.col("prev_c"),
        )
        .otherwise(F.col("next_c"))
        .alias("m"),
    )
    diffs = (
        per_user.filter(F.col("treat") == 1)
        .join(F.broadcast(match), "score")
        .join(
            F.broadcast(cgrp.select(F.col("score").alias("m"), "cy", "cn")),
            "m",
        )
        .select(
            "score",
            "m",
            (
                F.col("y").cast("double")
                - F.col("cy").cast("double") / F.col("cn")
            ).alias("diff"),
        )
    )
    n_controls = per_user.filter(F.col("treat") == 0).agg(
        F.count("*").cast("long").alias("n_controls")
    )
    agg = diffs.agg(
        F.count("*").cast("long").alias("n_treated"),
        F.round(
            F.sum(F.round(F.col("diff"), 9).cast("decimal(28,9)"))
            .cast("double")
            / F.count("*"),
            6,
        ).alias("att"),
        F.round(
            F.sum(F.abs(F.col("score") - F.col("m"))).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_score_gap"),
    )
    return agg.crossJoin(F.broadcast(n_controls)).select(
        "n_treated", "n_controls", "att", "mean_score_gap"
    )


def _bayes_ab_oracle() -> str:
    from clv_data_pipeline_spark.functions.stats import std_normal_cdf_sql

    z = (
        "((mu_b - mu_a) / sqrt("
        "(CAST(1 AS DOUBLE) + s_a) * (CAST(1 AS DOUBLE) + n_a - s_a)"
        " / ((2 + n_a) * (2 + n_a) * (3 + n_a))"
        " + (CAST(1 AS DOUBLE) + s_b) * (CAST(1 AS DOUBLE) + n_b - s_b)"
        " / ((2 + n_b) * (2 + n_b) * (3 + n_b))))"
    )
    return f"""
    WITH arms AS (
        SELECT CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS n_a,
               CAST(SUM(CASE WHEN user_id % 2 = 1 AND value > 50
                    THEN 1 ELSE 0 END) AS DOUBLE) AS s_a,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS n_b,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND value > 50
                    THEN 1 ELSE 0 END) AS DOUBLE) AS s_b
        FROM events),
    post AS (
        SELECT n_a, s_a, n_b, s_b,
               (CAST(1 AS DOUBLE) + s_a) / (2 + n_a) AS mu_a,
               (CAST(1 AS DOUBLE) + s_b) / (2 + n_b) AS mu_b
        FROM arms)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(s_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(s_b AS BIGINT) AS conv_b,
           ROUND(mu_b - mu_a, 6) AS expected_lift,
           ROUND({std_normal_cdf_sql(z)}, 6) AS p_b_beats_a,
           CASE WHEN ROUND({std_normal_cdf_sql(z)}, 6) > 0.95
                    THEN 'ship_b'
                WHEN ROUND({std_normal_cdf_sql(z)}, 6) < 0.05
                    THEN 'ship_a'
                ELSE 'continue' END AS decision
    FROM post
    """


@query("q_bayes_ab", oracle=_bayes_ab_oracle())
def q_bayes_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B readout: Beta(1+s, 1+f) posteriors per arm and
    P(B beats A) — the decision-facing number stakeholders actually
    ask for, complementing the frequentist shelf (q_ab_test's t,
    q_srm's guard, q_msprt's sequential boundary).  The posterior
    probability uses the moment-matched normal approximation of the
    Beta difference, with Φ from the Abramowitz-Stegun 7.1.26
    rational erf (functions/stats.py: |error| < 1.5e-7, the one exp()
    rounded to 12 dp on both engines) — so the DuckDB oracle
    reproduces the probability bit-for-bit at 6 dp.

    Scale shape: ONE conditionally-aggregated scan of the event log
    produces four integers; everything downstream is 1-row scalar
    algebra."""
    from clv_data_pipeline_spark.functions.stats import std_normal_cdf

    ev = load_table(spark, sf_dir, "events")
    arms = ev.agg(
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("double")
        .alias("n_a"),
        F.sum(
            F.when((F.col("user_id") % 2 == 1) & (F.col("value") > 50), 1)
            .otherwise(0)
        )
        .cast("double")
        .alias("s_a"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("double")
        .alias("n_b"),
        F.sum(
            F.when((F.col("user_id") % 2 == 0) & (F.col("value") > 50), 1)
            .otherwise(0)
        )
        .cast("double")
        .alias("s_b"),
    )
    one = F.lit(1.0)
    mu_a = (one + F.col("s_a")) / (2 + F.col("n_a"))
    mu_b = (one + F.col("s_b")) / (2 + F.col("n_b"))
    var_a = (
        (one + F.col("s_a"))
        * (one + F.col("n_a") - F.col("s_a"))
        / ((2 + F.col("n_a")) * (2 + F.col("n_a")) * (3 + F.col("n_a")))
    )
    var_b = (
        (one + F.col("s_b"))
        * (one + F.col("n_b") - F.col("s_b"))
        / ((2 + F.col("n_b")) * (2 + F.col("n_b")) * (3 + F.col("n_b")))
    )
    p = F.round(
        std_normal_cdf((mu_b - mu_a) / F.sqrt(var_a + var_b)), 6
    )
    return arms.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("s_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("s_b").cast("long").alias("conv_b"),
        F.round(mu_b - mu_a, 6).alias("expected_lift"),
        p.alias("p_b_beats_a"),
        F.when(p > 0.95, F.lit("ship_b"))
        .when(p < 0.05, F.lit("ship_a"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


def _bh_fdr_oracle() -> str:
    from clv_data_pipeline_spark.functions.stats import std_normal_cdf_sql

    z = "(zval)"
    phi = std_normal_cdf_sql("(ABS(zval))")
    return f"""
    WITH y0 AS (
        SELECT c.c_nationkey AS nk,
               CAST(ROUND(o.o_totalprice
                          * CASE WHEN c.c_nationkey < 5
                                 THEN CAST(1.10 AS DOUBLE)
                                 ELSE CAST(1.0 AS DOUBLE) END, 2)
                    AS DECIMAL(18,2)) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    s AS (
        SELECT nk,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(y * y) AS DOUBLE) AS syy
        FROM y0
        GROUP BY nk),
    g AS (
        SELECT s.*,
               SUM(sy) OVER () / SUM(n) OVER () AS mu0,
               CAST(COUNT(*) OVER () AS DOUBLE) AS m
        FROM s),
    zt AS (
        SELECT nk, CAST(n AS BIGINT) AS n_orders, m,
               (sy / n - mu0)
                   / sqrt((syy - sy * sy / n) / (n - 1) / n) AS zval
        FROM g WHERE n >= 2),
    pv AS (
        SELECT nk, n_orders, m, ROUND(zval, 6) AS z,
               ROUND(2 * (CAST(1.0 AS DOUBLE) - {phi}), 9) AS p
        FROM zt),
    rk AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p, nk) AS BIGINT)
                   AS rnk
        FROM pv),
    cut AS (
        SELECT *, MAX(CASE WHEN p <= CAST('0.1' AS DOUBLE) * rnk / m
                           THEN rnk END) OVER () AS kstar
        FROM rk)
    SELECT CAST(nk AS BIGINT) AS nationkey, n_orders, z,
           ROUND(p, 6) AS p_value, rnk AS p_rank,
           COALESCE(rnk <= kstar, FALSE) AS rejected
    FROM cut
    """


@query("q_bh_fdr", oracle=_bh_fdr_oracle())
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over a family of z-tests — the
    multiple-testing correction every metrics platform needs the
    moment it tests 25 segments at once (uncorrected, ~2.5 false
    "significant" nations per sweep at alpha=0.1): per nation, test
    whether mean order value differs from the global mean, rank
    p-values ascending, and reject exactly the prefix whose p stays
    under alpha*rank/m.  p-values via the deterministic Φ of
    functions/stats.py; rounded to 9 dp BEFORE ranking so the ranking
    — and therefore the rejection set — is engine-exact.

    Scale shape: one broadcast join + one nation-keyed aggregation
    compress the fact table to 25 sufficient-stat rows; the global
    mean, ranks, and the BH cutoff all run as windows over that
    25-row frame."""
    from clv_data_pipeline_spark.functions.stats import std_normal_cdf

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    # planted-effect validation: nations 0-4 carry a deterministic
    # +10% uplift on the tested metric, so the family has TRUE
    # positives and the BH rejection prefix actually fires — on the
    # raw null-true testdata every p > alpha/m and `rejected` was
    # constant-False (round-8 degeneracy audit).
    yd = F.round(
        F.col("o_totalprice")
        * F.when(F.col("c_nationkey") < 5, F.lit(1.10)).otherwise(
            F.lit(1.0)
        ),
        2,
    ).cast("decimal(18,2)")
    s = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(yd).cast("double").alias("sy"),
            F.sum(yd * yd).cast("double").alias("syy"),
        )
    )
    wall = Window.partitionBy(F.lit(1))
    g = s.select(
        "*",
        (F.sum("sy").over(wall) / F.sum("n").over(wall)).alias("mu0"),
        F.count("*").over(wall).cast("double").alias("m"),
    )
    n, sy, syy = F.col("n"), F.col("sy"), F.col("syy")
    zval = (sy / n - F.col("mu0")) / F.sqrt(
        (syy - sy * sy / n) / (n - 1) / n
    )
    zt = g.filter(n >= 2).select(
        "nk",
        n.cast("long").alias("n_orders"),
        "m",
        zval.alias("zval"),
    )
    pv = zt.select(
        "nk",
        "n_orders",
        "m",
        F.round("zval", 6).alias("z"),
        F.round(
            2 * (F.lit(1.0) - std_normal_cdf(F.abs(F.col("zval")))), 9
        ).alias("p"),
    )
    rk = pv.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy("p", "nk")).cast("long"),
    )
    cut = rk.withColumn(
        "kstar",
        F.max(
            F.when(
                F.col("p") <= F.lit(0.1) * F.col("rnk") / F.col("m"),
                F.col("rnk"),
            )
        ).over(wall),
    )
    return cut.select(
        F.col("nk").cast("long").alias("nationkey"),
        "n_orders",
        "z",
        F.round("p", 6).alias("p_value"),
        F.col("rnk").alias("p_rank"),
        F.coalesce(
            F.col("rnk") <= F.col("kstar"), F.lit(False)
        ).alias("rejected"),
    )


@query(
    "q_simpson",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS nt,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                    THEN CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS st,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS nc,
               CAST(SUM(CASE WHEN user_id % 2 = 1
                    THEN CAST(value AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS sc
        FROM events GROUP BY event_type),
    g AS (
        SELECT event_type, nt, st, nc, sc,
               SUM(st) OVER () / SUM(nt) OVER ()
               - SUM(sc) OVER () / SUM(nc) OVER () AS pooled
        FROM cells)
    SELECT event_type,
           CAST(nt + nc AS BIGINT) AS n,
           ROUND(st / nt, 6) AS treat_mean,
           ROUND(sc / nc, 6) AS ctrl_mean,
           ROUND(st / nt - sc / nc, 6) AS seg_diff,
           ROUND(pooled, 6) AS pooled_diff,
           CAST(SIGN(st / nt - sc / nc) <> SIGN(pooled) AS BOOLEAN)
               AS sign_flip
    FROM g
    """,
)
def q_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: per segment, the treated-vs-control
    mean difference NEXT TO the pooled difference, with a flag where
    the segment-level effect sign contradicts the pooled sign — the
    aggregation trap every self-serve metrics dashboard eventually
    springs (q_stratified_ate fixes the estimate; this SURFACES where
    pooling lies).  ONE conditionally-aggregated scan produces the
    per-segment sufficient stats; the pooled difference derives from
    window sums over the 5-row segment frame, so no second scan.  All
    means divide exact DECIMAL sums — the sign comparison is
    engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    z4 = F.lit(0).cast("decimal(18,4)")
    v = F.col("value").cast("decimal(18,4)")
    treat = F.col("user_id") % 2 == 0
    cells = ev.groupBy("event_type").agg(
        F.sum(F.when(treat, 1).otherwise(0)).cast("double").alias("nt"),
        F.sum(F.when(treat, v).otherwise(z4)).cast("double").alias("st"),
        F.sum(F.when(~treat, 1).otherwise(0)).cast("double").alias("nc"),
        F.sum(F.when(~treat, v).otherwise(z4)).cast("double").alias("sc"),
    )
    wall = Window.partitionBy(F.lit(1))
    g = cells.select(
        "*",
        (
            F.sum("st").over(wall) / F.sum("nt").over(wall)
            - F.sum("sc").over(wall) / F.sum("nc").over(wall)
        ).alias("pooled"),
    )
    seg = F.col("st") / F.col("nt") - F.col("sc") / F.col("nc")
    return g.select(
        "event_type",
        (F.col("nt") + F.col("nc")).cast("long").alias("n"),
        F.round(F.col("st") / F.col("nt"), 6).alias("treat_mean"),
        F.round(F.col("sc") / F.col("nc"), 6).alias("ctrl_mean"),
        F.round(seg, 6).alias("seg_diff"),
        F.round("pooled", 6).alias("pooled_diff"),
        (F.signum(seg) != F.signum(F.col("pooled"))).alias("sign_flip"),
    )


@query(
    "q_mediation",
    oracle="""
    WITH per_user AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS z,
               CAST(COUNT(*) AS BIGINT) AS m,
               SUM(CAST(value AS DECIMAL(18,4))) AS y
        FROM events GROUP BY user_id),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(z) AS DOUBLE) AS sz,
               CAST(SUM(m) AS DOUBLE) AS sm,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(z * m) AS DOUBLE) AS szm,
               CAST(SUM(CASE WHEN z = 1 THEN y
                        ELSE CAST(0 AS DECIMAL(38,4)) END) AS DOUBLE)
                   AS szy,
               CAST(SUM(m * m) AS DOUBLE) AS smm,
               CAST(SUM(m * y) AS DOUBLE) AS smy
        FROM per_user),
    c AS (
        SELECT n,
               n * sz - sz * sz AS czz,
               n * szm - sz * sm AS czm,
               n * smm - sm * sm AS cmm,
               n * szy - sz * sy AS czy,
               n * smy - sm * sy AS cmy
        FROM s),
    fit AS (
        SELECT n,
               czm / czz AS a_path,
               (czz * cmy - czm * czy) / (czz * cmm - czm * czm)
                   AS b_path,
               czy / czz AS c_total,
               (cmm * czy - czm * cmy) / (czz * cmm - czm * czm)
                   AS c_direct
        FROM c)
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(a_path, 6) AS a_path,
           ROUND(b_path, 6) AS b_path,
           ROUND(c_total, 6) AS total_effect,
           ROUND(c_direct, 6) AS direct_effect,
           ROUND(a_path * b_path, 6) AS indirect_effect,
           ROUND(a_path * b_path / c_total, 6) AS prop_mediated
    FROM fit
    """,
)
def q_mediation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal mediation analysis (Baron-Kenny product-of-coefficients):
    does the randomized assignment move the outcome THROUGH the
    mediator (activity volume) or directly?  a = effect of z on the
    mediator, (b, c') = the mediator and direct coefficients from the
    two-regressor OLS of y on (z, m), indirect = a*b, and the
    proportion mediated — the decomposition that says whether an
    engagement lift is the mechanism behind a revenue lift.  Completes
    the causal shelf's mechanism axis (q_iv_2sls handles
    noncompliance, q_rdd thresholds, this one pathways).

    Scale shape: one user-keyed compression, one exact sufficient-
    stats aggregate (z 0/1, m integer counts, y DECIMAL — the z*y
    cross-sum is a conditional sum, dodging DECIMAL-product widening),
    then closed-form 2x2 normal equations as identical IEEE
    expressions on a 1-row frame."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("y"),
    ).select((F.col("user_id") % 2).cast("long").alias("z"), "m", "y")
    s = per_user.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("z").cast("double").alias("sz"),
        F.sum("m").cast("double").alias("sm"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("z") * F.col("m")).cast("double").alias("szm"),
        F.sum(F.when(F.col("z") == 1, F.col("y")).otherwise(F.lit(0)))
        .cast("double")
        .alias("szy"),
        F.sum(F.col("m") * F.col("m")).cast("double").alias("smm"),
        # m fits (9,0); (9,0) x y's (28,4) = (38,4) — exact at the cap,
        # no precision-loss scale reduction
        F.sum(F.col("m").cast("decimal(9,0)") * F.col("y"))
        .cast("double")
        .alias("smy"),
    )
    n, sz, sm, sy = F.col("n"), F.col("sz"), F.col("sm"), F.col("sy")
    szm, szy, smm, smy = (
        F.col("szm"), F.col("szy"), F.col("smm"), F.col("smy"),
    )
    czz = n * sz - sz * sz
    czm = n * szm - sz * sm
    cmm = n * smm - sm * sm
    czy = n * szy - sz * sy
    cmy = n * smy - sm * sy
    a = czm / czz
    det = czz * cmm - czm * czm
    b = (czz * cmy - czm * czy) / det
    c_tot = czy / czz
    c_dir = (cmm * czy - czm * cmy) / det
    return s.select(
        n.cast("long").alias("n_users"),
        F.round(a, 6).alias("a_path"),
        F.round(b, 6).alias("b_path"),
        F.round(c_tot, 6).alias("total_effect"),
        F.round(c_dir, 6).alias("direct_effect"),
        F.round(a * b, 6).alias("indirect_effect"),
        F.round(a * b / c_tot, 6).alias("prop_mediated"),
    )


@query(
    "q_anova",
    oracle="""
    WITH g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(value AS DECIMAL(18,4))) AS s,
               SUM(CAST(value AS DECIMAL(18,4))
                   * CAST(value AS DECIMAL(18,4))) AS ss
        FROM events GROUP BY event_type),
    t AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS k,
               CAST(SUM(n) AS DOUBLE) AS n,
               CAST(SUM(s) AS DOUBLE) AS s,
               CAST(SUM(ss) AS DOUBLE) AS ss,
               CAST(SUM(CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                   / n, 9) AS DECIMAL(38,9)))
                    AS DOUBLE) AS sgm
        FROM g),
    f AS (
        SELECT k, n,
               sgm - s * s / n AS ssb,
               ss - sgm AS ssw,
               ss - s * s / n AS sst
        FROM t)
    SELECT CAST(k AS BIGINT) AS k_groups,
           CAST(n AS BIGINT) AS n_rows,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(n - k AS BIGINT) AS df_within,
           ROUND((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_stat,
           ROUND(ssb / sst, 6) AS eta_sq
    FROM f
    """,
)
def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across event types — does the
    metric differ across MORE than two groups at once, the question
    the pairwise shelf (q_ab_test Welch t, q_mannwhitney U) answers
    only one pair at a time.  Reports the F statistic and eta-squared
    effect size (share of variance the grouping explains) with both
    degrees of freedom for table lookup.

    Scale shape: ONE group-keyed aggregation compresses the log to
    k sufficient-stat rows (exact DECIMAL sums), one 1-row fold
    computes SSB/SSW/SST in identical IEEE expressions — the textbook
    partition of variance, no second scan."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,4)")
    # group sums stay DECIMAL through the second fold (exact in any
    # order); the one per-group double ratio rounds to 9 before its
    # DECIMAL sum — no accumulation-order exposure anywhere
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
    )
    t = g.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("n").cast("double").alias("n"),
        F.sum("s").cast("double").alias("s"),
        F.sum("ss").cast("double").alias("ss"),
        F.sum(
            F.round(
                F.col("s").cast("double")
                * F.col("s").cast("double")
                / F.col("n"),
                9,
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("sgm"),
    )
    k, n, s, ss, sgm = (
        F.col("k"), F.col("n"), F.col("s"), F.col("ss"), F.col("sgm"),
    )
    ssb = sgm - s * s / n
    ssw = ss - sgm
    sst = ss - s * s / n
    return t.select(
        k.cast("long").alias("k_groups"),
        n.cast("long").alias("n_rows"),
        (k - 1).cast("long").alias("df_between"),
        (n - k).cast("long").alias("df_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
    )


@query(
    "q_overdispersion",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id),
    s AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(c) AS DOUBLE) AS sc,
               CAST(SUM(c * c) AS DOUBLE) AS scc
        FROM per_user),
    m AS (
        SELECT n, sc / n AS mu,
               (scc - sc * sc / n) / (n - 1) AS v
        FROM s)
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(mu, 6) AS mean_events,
           ROUND(v, 6) AS var_events,
           ROUND(v / mu, 6) AS dispersion_index,
           CAST(v / mu > 1.5 AS BOOLEAN) AS overdispersed,
           ROUND(CASE WHEN v > mu THEN mu * mu / (v - mu) END, 6)
               AS nb_r,
           ROUND(CASE WHEN v > mu THEN mu / v END, 6) AS nb_p
    FROM m
    """,
)
def q_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-model diagnostics for per-user event counts: the
    variance-to-mean dispersion index (Poisson says 1; real behavior
    almost never does) and, when overdispersed, the method-of-moments
    Negative Binomial (r, p) — the distributional check that decides
    whether a Poisson rate model (and every SE derived from it) is
    lying, and the same mean/variance compression the BG/NBD frequency
    margin builds on.  One user-keyed compression, one exact
    integer-sum fold, closed-form moments."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("c")
    )
    s = per_user.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("c").cast("double").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("scc"),
    )
    n, sc, scc = F.col("n"), F.col("sc"), F.col("scc")
    mu = sc / n
    v = (scc - sc * sc / n) / (n - 1)
    return s.select(
        n.cast("long").alias("n_users"),
        F.round(mu, 6).alias("mean_events"),
        F.round(v, 6).alias("var_events"),
        F.round(v / mu, 6).alias("dispersion_index"),
        (v / mu > 1.5).alias("overdispersed"),
        F.round(
            F.when(v > mu, mu * mu / (v - mu)), 6
        ).alias("nb_r"),
        F.round(F.when(v > mu, mu / v), 6).alias("nb_p"),
    )


@query(
    "q_price_index",
    oracle="""
    WITH li AS (
        SELECT l.l_partkey AS pk,
               CASE WHEN o.o_orderdate <  TIMESTAMP '1998-07-01'
                    THEN 0 ELSE 1 END AS period,
               CAST(l.l_quantity AS DECIMAL(18,2)) AS q,
               CAST(l.l_extendedprice AS DOUBLE)
                   / CAST(l.l_quantity AS DOUBLE) AS unit
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey),
    pp AS (
        SELECT pk, period,
               CAST(SUM(q) AS DOUBLE) AS qty,
               ROUND(CAST(SUM(CAST(ROUND(unit * CAST(q AS DOUBLE), 6)
                                   AS DECIMAL(28,6))) AS DOUBLE)
                     / CAST(SUM(q) AS DOUBLE), 6) AS price
        FROM li GROUP BY pk, period),
    b AS (
        SELECT p0.pk, p0.qty AS q0, p0.price AS pr0,
               p1.qty AS q1, p1.price AS pr1
        FROM pp p0 JOIN pp p1
          ON p0.pk = p1.pk AND p0.period = 0 AND p1.period = 1),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(CAST(ROUND(pr1 * q0, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS l_num,
               CAST(SUM(CAST(ROUND(pr0 * q0, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS l_den,
               CAST(SUM(CAST(ROUND(pr1 * q1, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS p_num,
               CAST(SUM(CAST(ROUND(pr0 * q1, 6) AS DECIMAL(28,6)))
                    AS DOUBLE) AS p_den
        FROM b)
    SELECT n_parts,
           ROUND(l_num / l_den, 6) AS laspeyres,
           ROUND(p_num / p_den, 6) AS paasche,
           ROUND(sqrt((l_num / l_den) * (p_num / p_den)), 6) AS fisher
    FROM s
    """,
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-index construction over the order book: Laspeyres
    (base-period basket), Paasche (current basket), and the Fisher
    ideal (their geometric mean) comparing per-part unit prices
    between the two halves of the window — the inflation-tracking op
    of revenue analytics, answering "did prices move or did the MIX
    move" where a raw revenue ratio confounds both.

    Scale shape: one fact-fact hash join (orders dates onto lineitem),
    one (part, period)-keyed aggregation to per-part quantities and
    quantity-weighted mean unit prices, a part-keyed self-join of the
    two-period frame (dimension-sized), and a 1-row index fold.
    Unit-price x quantity terms round to 6 dp before DECIMAL sums, so
    every index is engine- and partition-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("period"),
    )
    q = F.col("l_quantity").cast("decimal(18,2)")
    # unit price divides as DOUBLE on both engines (DECIMAL division
    # scale/rounding rules differ between Spark and DuckDB)
    unit = (
        F.col("l_extendedprice").cast("double")
        / F.col("l_quantity").cast("double")
    )
    base = li.join(o, "l_orderkey").select(
        F.col("l_partkey").alias("pk"),
        "period",
        q.alias("q"),
        unit.alias("unit"),
    )
    pp = base.groupBy("pk", "period").agg(
        F.sum("q").cast("double").alias("qty"),
        F.round(
            F.sum(
                F.round(
                    F.col("unit") * F.col("q").cast("double"), 6
                ).cast("decimal(28,6)")
            ).cast("double")
            / F.sum("q").cast("double"),
            6,
        ).alias("price"),
    )
    p0 = pp.filter(F.col("period") == 0).select(
        "pk", F.col("qty").alias("q0"), F.col("price").alias("pr0")
    )
    p1 = pp.filter(F.col("period") == 1).select(
        "pk", F.col("qty").alias("q1"), F.col("price").alias("pr1")
    )
    b = p0.join(p1, "pk")

    def term(a, c):
        return F.sum(
            F.round(F.col(a) * F.col(c), 6).cast("decimal(28,6)")
        ).cast("double")

    s = b.agg(
        F.count("*").cast("long").alias("n_parts"),
        term("pr1", "q0").alias("l_num"),
        term("pr0", "q0").alias("l_den"),
        term("pr1", "q1").alias("p_num"),
        term("pr0", "q1").alias("p_den"),
    )
    return s.select(
        "n_parts",
        F.round(F.col("l_num") / F.col("l_den"), 6).alias("laspeyres"),
        F.round(F.col("p_num") / F.col("p_den"), 6).alias("paasche"),
        F.round(
            F.sqrt(
                (F.col("l_num") / F.col("l_den"))
                * (F.col("p_num") / F.col("p_den"))
            ),
            6,
        ).alias("fisher"),
    )


@query(
    "q_icc_deff",
    oracle="""
    WITH g AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS m,
               SUM(CAST(value AS DECIMAL(18,4))) AS s,
               SUM(CAST(value AS DECIMAL(18,4))
                   * CAST(value AS DECIMAL(18,4))) AS ss
        FROM events GROUP BY user_id),
    t AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS k,
               CAST(SUM(m) AS DOUBLE) AS n,
               CAST(SUM(s) AS DOUBLE) AS s,
               CAST(SUM(ss) AS DOUBLE) AS ss,
               CAST(SUM(CAST(ROUND(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                   / m, 9) AS DECIMAL(38,9)))
                    AS DOUBLE) AS sgm,
               CAST(SUM(m * m) AS DOUBLE) AS smm
        FROM g),
    ms AS (
        SELECT k, n,
               (sgm - s * s / n) / (k - 1) AS msb,
               (ss - sgm) / (n - k) AS msw,
               (n - smm / n) / (k - 1) AS m0
        FROM t),
    icc AS (
        SELECT k, n, msb, msw, m0,
               (msb - msw) / (msb + (m0 - 1) * msw) AS rho
        FROM ms)
    SELECT CAST(k AS BIGINT) AS n_clusters,
           CAST(n AS BIGINT) AS n_rows,
           ROUND(msb, 6) AS ms_between,
           ROUND(msw, 6) AS ms_within,
           ROUND(rho, 6) AS icc,
           ROUND(1 + (n / k - 1) * rho, 6) AS design_effect,
           ROUND(n / (1 + (n / k - 1) * rho), 6) AS effective_n
    FROM icc
    """,
)
def q_icc_deff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation + design effect for user-clustered
    observations (one-way random-effects ANOVA estimator, ANOVA
    method-of-moments): events from the same user are correlated, so
    every per-EVENT test (q_ab_test on raw events) overstates its
    effective sample size by DEFF = 1 + (m-1)*ICC — this query
    measures by HOW MUCH, and reports the honest effective n.  The
    experiment-design companion to q_grouped_bootstrap's empirical
    fix and q_power_analysis's planning step.

    Scale shape: one user-keyed compression (exact DECIMAL sums), one
    fold with the q_anova discipline (group sums stay DECIMAL; the
    one per-group double ratio rounds to 9 dp before its DECIMAL
    sum); everything after is 1-row scalar algebra."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,4)")
    g = ev.groupBy("user_id").agg(
        F.count("*").cast("long").alias("m"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
    )
    t = g.agg(
        F.count("*").cast("double").alias("k"),
        F.sum("m").cast("double").alias("n"),
        F.sum("s").cast("double").alias("s"),
        F.sum("ss").cast("double").alias("ss"),
        F.sum(
            F.round(
                F.col("s").cast("double")
                * F.col("s").cast("double")
                / F.col("m"),
                9,
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("sgm"),
        F.sum(F.col("m") * F.col("m")).cast("double").alias("smm"),
    )
    k, n, s, ss = F.col("k"), F.col("n"), F.col("s"), F.col("ss")
    sgm, smm = F.col("sgm"), F.col("smm")
    msb = (sgm - s * s / n) / (k - 1)
    msw = (ss - sgm) / (n - k)
    m0 = (n - smm / n) / (k - 1)
    rho = (msb - msw) / (msb + (m0 - 1) * msw)
    deff = 1 + (n / k - 1) * rho
    return t.select(
        k.cast("long").alias("n_clusters"),
        n.cast("long").alias("n_rows"),
        F.round(msb, 6).alias("ms_between"),
        F.round(msw, 6).alias("ms_within"),
        F.round(rho, 6).alias("icc"),
        F.round(deff, 6).alias("design_effect"),
        F.round(n / deff, 6).alias("effective_n"),
    )


_GMM_ITERS = 4


def _gmm_oracle(iters: int = _GMM_ITERS) -> str:
    """Unrolled binned EM for the 2-component Gaussian mixture: each
    iteration's responsibilities (libm exp rounded to 12 dp; the
    shared 1/sqrt(2*pi) factor cancels), weighted-sum updates (terms
    rounded to 9 dp into DECIMAL sums), and variance floors are
    replayed as CTEs — the fitted mixture's whole trajectory is
    hash-verified."""
    steps = []
    prev = "g0"
    for t in range(1, iters + 1):
        steps.append(f"""
    r{t} AS MATERIALIZED (
        SELECT b, x, cnt,
               CASE WHEN p1 + p2 > 0 THEN ROUND(p1 / (p1 + p2), 12)
                    ELSE CAST(0.5 AS DOUBLE) END AS r
        FROM (SELECT h.b, h.x, h.cnt,
                     g.pi1 * ROUND(exp(-(h.x - g.mu1) * (h.x - g.mu1)
                                       / (2 * g.v1)), 12)
                         / sqrt(g.v1) AS p1,
                     (1 - g.pi1)
                         * ROUND(exp(-(h.x - g.mu2) * (h.x - g.mu2)
                                     / (2 * g.v2)), 12)
                         / sqrt(g.v2) AS p2
              FROM hist h CROSS JOIN {prev} g) z),
    g{t} AS MATERIALIZED (
        SELECT ROUND(w1 / n, 12) AS pi1,
               mu1, GREATEST(ROUND(sxx1 / w1 - mu1 * mu1, 9),
                             CAST(0.01 AS DOUBLE)) AS v1,
               mu2, GREATEST(ROUND(sxx2 / w2 - mu2 * mu2, 9),
                             CAST(0.01 AS DOUBLE)) AS v2
        FROM (SELECT
                 CAST(SUM(cnt) AS DOUBLE) AS n,
                 CAST(SUM(CAST(ROUND(cnt * r, 9) AS DECIMAL(28,9)))
                      AS DOUBLE) AS w1,
                 CAST(SUM(CAST(ROUND(cnt * (1 - r), 9)
                      AS DECIMAL(28,9))) AS DOUBLE) AS w2,
                 ROUND(CAST(SUM(CAST(ROUND(cnt * r * x, 9)
                       AS DECIMAL(28,9))) AS DOUBLE)
                       / CAST(SUM(CAST(ROUND(cnt * r, 9)
                       AS DECIMAL(28,9))) AS DOUBLE), 9) AS mu1,
                 CAST(SUM(CAST(ROUND(cnt * r * x * x, 9)
                      AS DECIMAL(38,9))) AS DOUBLE) AS sxx1,
                 ROUND(CAST(SUM(CAST(ROUND(cnt * (1 - r) * x, 9)
                       AS DECIMAL(28,9))) AS DOUBLE)
                       / CAST(SUM(CAST(ROUND(cnt * (1 - r), 9)
                       AS DECIMAL(28,9))) AS DOUBLE), 9) AS mu2,
                 CAST(SUM(CAST(ROUND(cnt * (1 - r) * x * x, 9)
                      AS DECIMAL(38,9))) AS DOUBLE) AS sxx2
              FROM r{t}) u)""")
        prev = f"g{t}"
    return f"""
    WITH hist AS MATERIALIZED (
        SELECT b, (b + CAST(0.5 AS DOUBLE)) * 2.0 AS x,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT LEAST(GREATEST(CAST(FLOOR(value / 2.0) AS BIGINT),
                                    0), 255) AS b
              FROM events) e
        GROUP BY b),
    g0 AS (
        SELECT CAST(0.5 AS DOUBLE) AS pi1,
               CAST(25 AS DOUBLE) AS mu1, CAST(2500 AS DOUBLE) AS v1,
               CAST(100 AS DOUBLE) AS mu2, CAST(2500 AS DOUBLE) AS v2),
    {','.join(steps)},
    n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_events FROM hist)
    SELECT n.n_events,
           ROUND(g.pi1, 6) AS pi1,
           ROUND(g.mu1, 6) AS mu1,
           ROUND(sqrt(g.v1), 6) AS sd1,
           ROUND(1 - g.pi1, 6) AS pi2,
           ROUND(g.mu2, 6) AS mu2,
           ROUND(sqrt(g.v2), 6) AS sd2
    FROM {prev} g CROSS JOIN n
    """



def _fit_gmm_from_bins(bins, n):
    """Driver-side binned EM shared by q_gaussian_mixture and
    q_stream_mixture — every weighted sum accumulates in exact integer
    nano-units so the replay is partition- and engine-exact (mirrors
    the unrolled oracle token-for-token)."""
    import math as _math

    pi1, mu1, v1, mu2, v2 = 0.5, 25.0, 2500.0, 100.0, 2500.0

    def nano(v: float) -> int:
        return int(round(round(v, 9) * 1e9))

    for _ in range(_GMM_ITERS):
        w1 = w2 = sx1 = sx2 = sxx1 = sxx2 = 0
        for x, cnt in bins:
            p1 = pi1 * round(
                _math.exp(-(x - mu1) * (x - mu1) / (2 * v1)), 12
            ) / _math.sqrt(v1)
            p2 = (1 - pi1) * round(
                _math.exp(-(x - mu2) * (x - mu2) / (2 * v2)), 12
            ) / _math.sqrt(v2)
            r = round(p1 / (p1 + p2), 12) if p1 + p2 > 0 else 0.5
            w1 += nano(cnt * r)
            w2 += nano(cnt * (1 - r))
            sx1 += nano(cnt * r * x)
            sx2 += nano(cnt * (1 - r) * x)
            sxx1 += nano(cnt * r * x * x)
            sxx2 += nano(cnt * (1 - r) * x * x)
        w1f, w2f = w1 / 1e9, w2 / 1e9
        mu1 = round((sx1 / 1e9) / w1f, 9)
        mu2 = round((sx2 / 1e9) / w2f, 9)
        v1 = max(round((sxx1 / 1e9) / w1f - mu1 * mu1, 9), 0.01)
        v2 = max(round((sxx2 / 1e9) / w2f - mu2 * mu2, 9), 0.01)
        pi1 = round(w1f / n, 12)
    return [
        (
            n,
            round(pi1, 6),
            round(mu1, 6),
            round(_math.sqrt(v1), 6),
            round(1 - pi1, 6),
            round(mu2, 6),
            round(_math.sqrt(v2), 6),
        )
    ]


_GMM_SCHEMA = (
    "n_events long, pi1 double, mu1 double, sd1 double, "
    "pi2 double, mu2 double, sd2 double"
)


@query("q_gaussian_mixture", oracle=_gmm_oracle())
def q_gaussian_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component Gaussian mixture over event values, fit by
    binned EM ({_GMM_ITERS} iterations) — the unsupervised density
    decomposition behind "is this metric one population or two"
    (organic vs bot traffic, retail vs wholesale order sizes), and
    the continuous-data sibling of q_fellegi_sunter's discrete EM.

    Scale shape: the corpus folds ONCE into a 256-bin fixed-boundary
    histogram (the q_stream_quantiles sketch); EM then runs at the
    driver over the bounded bin frame (the model-fit barrier:
    BG/NBD / Bradley-Terry / Fellegi-Sunter discipline) with every
    responsibility and weighted sum mirrored in exact integer
    nano-units, and the DuckDB oracle replays the ENTIRE trajectory
    (libm exp rounds to 12 dp; the shared normalizing constant
    cancels inside responsibilities)."""
    ev = load_table(spark, sf_dir, "events")
    hist = (
        ev.select(
            F.least(
                F.greatest(
                    F.floor(F.col("value") / 2.0).cast("long"), F.lit(0)
                ),
                F.lit(255),
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").cast("long").alias("cnt"))
        .collect()
    )
    bins = [((r["b"] + 0.5) * 2.0, int(r["cnt"])) for r in hist]
    n = sum(c for _, c in bins)
    return spark.createDataFrame(_fit_gmm_from_bins(bins, n), _GMM_SCHEMA)


@query("q_stream_mixture", oracle=_gmm_oracle())
def q_stream_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming model training — the FIFTEENTH streaming/batch parity
    proof, and the first that trains a MODEL off streaming state:
    three chronological triggers fold micro-batch histograms into the
    stored 256-bin summary by addition (histogram_merge_sink, the
    q_stream_quantiles state), then the SAME binned-EM Gaussian
    mixture fit as q_gaussian_mixture runs off the merged state.
    Because the fit consumes only the histogram — a mergeable
    sufficient statistic for the binned likelihood — train-on-stream
    equals train-at-once BIT FOR BIT, which is exactly the claim a
    nightly incremental training pipeline rests on.  Shares
    q_gaussian_mixture's oracle."""
    import shutil
    import tempfile
    import uuid

    from clv_data_pipeline_spark.streaming.ingest import (
        histogram_merge_sink,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    src_root = tempfile.mkdtemp(prefix="q_stream_gmm_")
    src = src_root + "/arrivals"
    cuts = ("2024-01-11", "2024-01-21")
    slices = (
        ev.filter(F.col("ts") < cuts[0]),
        ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.filter(F.col("ts") >= cuts[1]),
    )
    for s in slices:
        s.coalesce(1).write.mode("append").parquet(src)
    target_table = f"gmm_stream_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(ev.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ckpt = tempfile.mkdtemp(prefix="q_stream_gmm_ckpt_")
    q = (
        stream.writeStream.foreachBatch(
            histogram_merge_sink(
                target_table, lo=0.0, hi=512.0, n_bins=256
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(src_root, ignore_errors=True)
    hist = spark.table(target_table).collect()
    spark.sql(f"DROP TABLE IF EXISTS {target_table}")
    bins = [((r["bin"] + 0.5) * 2.0, int(r["cnt"])) for r in hist]
    n = sum(c for _, c in bins)
    return spark.createDataFrame(_fit_gmm_from_bins(bins, n), _GMM_SCHEMA)


@query(
    "q_uplift",
    oracle="""
    WITH base AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END
                   AS period,
               CAST(user_id % 2 = 0 AS INT) AS treat,
               CASE WHEN value > 50 THEN 1 ELSE 0 END AS conv
        FROM events),
    cells AS (
        SELECT event_type, period, treat,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(conv) AS BIGINT) AS s
        FROM base GROUP BY event_type, period, treat),
    seg AS (
        SELECT event_type,
               MAX(CASE WHEN period = 0 AND treat = 1
                   THEN CAST(s AS DOUBLE) / n END) AS p_t0,
               MAX(CASE WHEN period = 0 AND treat = 0
                   THEN CAST(s AS DOUBLE) / n END) AS p_c0,
               MAX(CASE WHEN period = 1 AND treat = 1 THEN n END) AS nt,
               MAX(CASE WHEN period = 1 AND treat = 1 THEN s END) AS st,
               MAX(CASE WHEN period = 1 AND treat = 0 THEN n END) AS nc,
               MAX(CASE WHEN period = 1 AND treat = 0 THEN s END) AS sc
        FROM cells GROUP BY event_type),
    ranked AS (
        SELECT event_type,
               ROUND(p_t0 - p_c0, 9) AS uplift_hat,
               nt, st, nc, sc,
               ROW_NUMBER() OVER (
                   ORDER BY ROUND(p_t0 - p_c0, 9) DESC, event_type)
                   AS rnk
        FROM seg),
    cum AS (
        SELECT event_type, rnk, uplift_hat, nt, st, nc, sc,
               SUM(st) OVER w AS cst, SUM(nt) OVER w AS cnt_t,
               SUM(sc) OVER w AS csc, SUM(nc) OVER w AS cnt_c
        FROM ranked
        WINDOW w AS (ORDER BY rnk ROWS UNBOUNDED PRECEDING))
    SELECT event_type,
           CAST(rnk AS BIGINT) AS rnk,
           ROUND(uplift_hat, 6) AS uplift_hat,
           ROUND(CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc, 6)
               AS uplift_actual,
           ROUND(cst - CAST(csc AS DOUBLE) * cnt_t / cnt_c, 6)
               AS cum_incremental
    FROM cum
    """,
)
def q_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift (incremental-response) evaluation — the targeting
    question the ATE cannot answer: WHICH segments should get the
    treatment?  Segment-level uplift estimates train on the first
    half of the window (treated-minus-control conversion per event
    type), segments rank by predicted uplift, and the SECOND half
    scores them: realized uplift per segment plus the cumulative
    incremental-conversions curve (the Qini numerator — treated
    conversions minus exposure-scaled control conversions in rank
    order).  Leak-free by the time split; a decreasing realized-uplift
    sequence validates the targeting.

    Scale shape: ONE conditionally-aggregated scan produces every
    (segment, period, arm) cell; ranking and the cumulative curve are
    windows over the 5-row segment frame.  All rates divide exact
    integers — rank, curve, and flags are engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("period"),
        (F.col("user_id") % 2 == 0).cast("int").alias("treat"),
        F.when(F.col("value") > 50, 1).otherwise(0).alias("conv"),
    )
    cells = base.groupBy("event_type", "period", "treat").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("conv").cast("long").alias("s"),
    )

    def cell(p, t, col):
        return F.max(
            F.when(
                (F.col("period") == p) & (F.col("treat") == t), F.col(col)
            )
        )

    seg = cells.groupBy("event_type").agg(
        (
            cell(0, 1, "s").cast("double") / cell(0, 1, "n")
        ).alias("p_t0"),
        (
            cell(0, 0, "s").cast("double") / cell(0, 0, "n")
        ).alias("p_c0"),
        cell(1, 1, "n").alias("nt"),
        cell(1, 1, "s").alias("st"),
        cell(1, 0, "n").alias("nc"),
        cell(1, 0, "s").alias("sc"),
    )
    ranked = seg.select(
        "event_type",
        F.round(F.col("p_t0") - F.col("p_c0"), 9).alias("uplift_hat"),
        "nt", "st", "nc", "sc",
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.desc("uplift_hat"), "event_type")
        ),
    )
    w = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    cum = ranked.select(
        "*",
        F.sum("st").over(w).alias("cst"),
        F.sum("nt").over(w).alias("cnt_t"),
        F.sum("sc").over(w).alias("csc"),
        F.sum("nc").over(w).alias("cnt_c"),
    )
    return cum.select(
        "event_type",
        F.col("rnk").cast("long").alias("rnk"),
        F.round("uplift_hat", 6).alias("uplift_hat"),
        F.round(
            F.col("st").cast("double") / F.col("nt")
            - F.col("sc").cast("double") / F.col("nc"),
            6,
        ).alias("uplift_actual"),
        F.round(
            F.col("cst")
            - F.col("csc").cast("double") * F.col("cnt_t") / F.col("cnt_c"),
            6,
        ).alias("cum_incremental"),
    )


@query(
    "q_metric_decomposition",
    oracle="""
    WITH halves AS (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END
                   AS period,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(value AS DECIMAL(18,4))) AS s
        FROM events GROUP BY event_type, period),
    seg AS (
        SELECT event_type,
               MAX(CASE WHEN period = 0 THEN n END) AS n0,
               MAX(CASE WHEN period = 1 THEN n END) AS n1,
               CAST(MAX(CASE WHEN period = 0 THEN s END) AS DOUBLE)
                   AS s0,
               CAST(MAX(CASE WHEN period = 1 THEN s END) AS DOUBLE)
                   AS s1
        FROM halves GROUP BY event_type),
    dec AS (
        SELECT event_type, n0, n1, s0, s1,
               s0 / n0 AS a0, s1 / n1 AS a1,
               (n1 - n0) * (s0 / n0) AS volume_effect,
               n1 * (s1 / n1 - s0 / n0) AS rate_effect
        FROM seg),
    tot AS (
        SELECT SUM(CAST(ROUND(s1 - s0, 6) AS DECIMAL(28,6))) AS td
        FROM dec)
    SELECT event_type,
           ROUND(s1 - s0, 6) AS delta,
           ROUND(volume_effect, 6) AS volume_effect,
           ROUND(rate_effect, 6) AS rate_effect,
           ROUND((s1 - s0) / CAST(tot.td AS DOUBLE), 6)
               AS share_of_total_delta
    FROM dec CROSS JOIN tot
    """,
)
def q_metric_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-delta root-cause decomposition: the period-over-period
    revenue change per segment split into a VOLUME effect (event-count
    change at the old per-event rate) and a RATE effect (per-event
    value change at the new volume) — the "why did the metric move"
    drill every metrics platform runs before anyone gets paged, with
    each segment's share of the total delta.  volume + rate = delta
    exactly (the standard two-factor decomposition identity).

    Scale shape: ONE conditionally-aggregated scan to (segment,
    period) cells; the decomposition and the 1-row total are scalar
    algebra over the segment frame.  DECIMAL sums make every effect
    engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    halves = ev.groupBy(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 0)
        .otherwise(1)
        .alias("period"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
    )

    def cell(p, col):
        return F.max(F.when(F.col("period") == p, F.col(col)))

    seg = halves.groupBy("event_type").agg(
        cell(0, "n").alias("n0"),
        cell(1, "n").alias("n1"),
        cell(0, "s").cast("double").alias("s0"),
        cell(1, "s").cast("double").alias("s1"),
    )
    n0, n1, s0, s1 = (
        F.col("n0"), F.col("n1"), F.col("s0"), F.col("s1"),
    )
    dec = seg.select(
        "event_type",
        "n0", "n1", "s0", "s1",
        ((n1 - n0) * (s0 / n0)).alias("volume_effect"),
        (n1 * (s1 / n1 - s0 / n0)).alias("rate_effect"),
    )
    wall = Window.partitionBy(F.lit(1))
    tot = F.sum(
        F.round(s1 - s0, 6).cast("decimal(28,6)")
    ).over(wall)
    return dec.select(
        "event_type",
        F.round(s1 - s0, 6).alias("delta"),
        F.round("volume_effect", 6).alias("volume_effect"),
        F.round("rate_effect", 6).alias("rate_effect"),
        F.round((s1 - s0) / tot.cast("double"), 6).alias(
            "share_of_total_delta"
        ),
    )


@query(
    "q_capture_recapture",
    oracle="""
    WITH caps AS (
        SELECT user_id,
               MAX(CASE WHEN ts < TIMESTAMP '2024-01-16'
                   THEN 1 ELSE 0 END) AS c1,
               MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                   THEN 1 ELSE 0 END) AS c2
        FROM events GROUP BY user_id),
    s AS (
        SELECT CAST(SUM(c1) AS DOUBLE) AS n1,
               CAST(SUM(c2) AS DOUBLE) AS n2,
               CAST(SUM(c1 * c2) AS DOUBLE) AS m,
               CAST(COUNT(*) AS BIGINT) AS observed
        FROM caps)
    SELECT CAST(n1 AS BIGINT) AS n_first_half,
           CAST(n2 AS BIGINT) AS n_second_half,
           CAST(m AS BIGINT) AS n_both,
           observed,
           ROUND((n1 + 1) * (n2 + 1) / (m + 1) - 1, 6)
               AS chapman_estimate,
           ROUND(CAST(observed AS DOUBLE)
                 / ((n1 + 1) * (n2 + 1) / (m + 1) - 1), 6)
               AS coverage
    FROM s
    """,
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture population estimation (Chapman's
    bias-corrected Lincoln-Petersen): the two halves of the window are
    two 'captures' of the user population; the overlap estimates how
    many users EXIST that the log never saw — the coverage question
    behind "is our event pipeline dropping users" and dedup-corpus
    population sizing, answered without any external census.  Reports
    the Chapman estimate and observed/estimated coverage.

    Scale shape: ONE user-keyed fold to per-user capture flags, one
    1-row sufficient-stats aggregate — exact integers divided once."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    caps = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("ts") < cut, 1).otherwise(0)).alias("c1"),
        F.max(F.when(F.col("ts") >= cut, 1).otherwise(0)).alias("c2"),
    )
    s = caps.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).cast("double").alias("m"),
        F.count("*").cast("long").alias("observed"),
    )
    n1, n2, m = F.col("n1"), F.col("n2"), F.col("m")
    chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    return s.select(
        n1.cast("long").alias("n_first_half"),
        n2.cast("long").alias("n_second_half"),
        m.cast("long").alias("n_both"),
        "observed",
        F.round(chapman, 6).alias("chapman_estimate"),
        F.round(
            F.col("observed").cast("double") / chapman, 6
        ).alias("coverage"),
    )


_MLTV_PERIODS = 3
_MLTV_GAMMA = "0.9"  # per-period discount, literal on both engines


@query(
    "q_markov_ltv",
    oracle=f"""
    WITH u AS MATERIALIZED (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND ts < TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END) AS BIGINT) AS p1,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '2024-01-16'
                        THEN 1 ELSE 0 END) AS BIGINT) AS p2,
               SUM(CASE WHEN event_type = 'purchase'
                   AND ts >= TIMESTAMP '2024-01-16'
                   THEN CAST(value AS DECIMAL(18,4))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS r2
        FROM events GROUP BY user_id),
    cuts AS (
        SELECT (SELECT ROUND(CAST(quantile_cont(p1, 0.5) AS DOUBLE), 6)
                FROM u WHERE p1 > 0) AS m1,
               (SELECT ROUND(CAST(quantile_cont(p2, 0.5) AS DOUBLE), 6)
                FROM u WHERE p2 > 0) AS m2),
    tagged AS MATERIALIZED (
        SELECT CASE WHEN p1 = 0 THEN 'none'
                    WHEN p1 > m1 THEN 'high' ELSE 'low' END
                   AS from_segment,
               CASE WHEN p2 = 0 THEN 'none'
                    WHEN p2 > m2 THEN 'high' ELSE 'low' END
                   AS to_segment,
               r2
        FROM u CROSS JOIN cuts),
    p AS MATERIALIZED (
        SELECT from_segment, to_segment,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / SUM(COUNT(*)) OVER (PARTITION BY from_segment),
                     9) AS share
        FROM tagged GROUP BY from_segment, to_segment),
    rev AS MATERIALIZED (
        SELECT to_segment AS seg,
               ROUND(CAST(SUM(r2) AS DOUBLE) / COUNT(*), 9) AS rev
        FROM tagged GROUP BY to_segment),
    v1 AS MATERIALIZED (
        SELECT p.from_segment AS seg,
               ROUND(CAST(SUM(CAST(ROUND(p.share * r.rev, 9)
                    AS DECIMAL(28,9))) AS DOUBLE), 9) AS v
        FROM p JOIN rev r ON r.seg = p.to_segment
        GROUP BY p.from_segment),
    v2 AS MATERIALIZED (
        SELECT p.from_segment AS seg,
               ROUND(CAST(SUM(CAST(ROUND(p.share * r.v, 9)
                    AS DECIMAL(28,9))) AS DOUBLE), 9) AS v
        FROM p JOIN v1 r ON r.seg = p.to_segment
        GROUP BY p.from_segment),
    v3 AS MATERIALIZED (
        SELECT p.from_segment AS seg,
               ROUND(CAST(SUM(CAST(ROUND(p.share * r.v, 9)
                    AS DECIMAL(28,9))) AS DOUBLE), 9) AS v
        FROM p JOIN v2 r ON r.seg = p.to_segment
        GROUP BY p.from_segment),
    n AS (
        SELECT from_segment AS seg, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM tagged GROUP BY from_segment)
    SELECT n.seg AS segment, n.n_users,
           ROUND(v1.v, 6) AS rev_p1,
           ROUND(v2.v, 6) AS rev_p2,
           ROUND(v3.v, 6) AS rev_p3,
           ROUND(v1.v + CAST('{_MLTV_GAMMA}' AS DOUBLE) * v2.v
                 + CAST('{_MLTV_GAMMA}' AS DOUBLE)
                   * CAST('{_MLTV_GAMMA}' AS DOUBLE) * v3.v, 6)
               AS ltv_3p
    FROM n
    JOIN v1 ON v1.seg = n.seg
    JOIN v2 ON v2.seg = n.seg
    JOIN v3 ON v3.seg = n.seg
    """,
)
def q_markov_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain LTV projection — the model q_segment_migration's
    empirical transition matrix exists to feed: per current activity
    tier (high/low/none), expected revenue one, two, and three
    periods out under the observed migration dynamics (v_k = P^k *
    rev), plus the {_MLTV_GAMMA}-discounted 3-period LTV.  The
    discrete-state complement to the parametric BG/NBD lifetime model
    — no distributional assumption, just the chain the data already
    exhibits (Pfeifer & Carraway 2000's customer-relationship Markov
    model).

    Scale shape: one user-keyed conditional scan builds both periods'
    counts AND second-half revenue; the transition matrix, reward
    vector, and all three propagation steps live on <=9-cell frames
    (matrix-vector products as join+group-by with 9 dp-rounded terms
    in DECIMAL sums) — the whole projection trajectory is
    hash-verified."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    is_p = F.col("event_type") == "purchase"
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(is_p & (F.col("ts") < cut), 1).otherwise(0))
        .cast("long")
        .alias("p1"),
        F.sum(F.when(is_p & (F.col("ts") >= cut), 1).otherwise(0))
        .cast("long")
        .alias("p2"),
        F.sum(
            F.when(
                is_p & (F.col("ts") >= cut),
                F.col("value").cast("decimal(18,4)"),
            ).otherwise(F.lit(0).cast("decimal(18,4)"))
        ).alias("r2"),
    ).localCheckpoint()
    m1 = u.filter(F.col("p1") > 0).agg(
        F.round(F.percentile("p1", 0.5), 6).alias("m1")
    )
    m2 = u.filter(F.col("p2") > 0).agg(
        F.round(F.percentile("p2", 0.5), 6).alias("m2")
    )
    tagged = (
        u.crossJoin(F.broadcast(m1))
        .crossJoin(F.broadcast(m2))
        .select(
            F.when(F.col("p1") == 0, "none")
            .when(F.col("p1") > F.col("m1"), "high")
            .otherwise("low")
            .alias("from_segment"),
            F.when(F.col("p2") == 0, "none")
            .when(F.col("p2") > F.col("m2"), "high")
            .otherwise("low")
            .alias("to_segment"),
            "r2",
        )
        .localCheckpoint()
    )
    wfrom = Window.partitionBy("from_segment")
    p_rows = (
        tagged.groupBy("from_segment", "to_segment")
        .agg(F.count("*").alias("n"))
        .select(
            "from_segment",
            "to_segment",
            F.round(
                F.col("n").cast("double") / F.sum("n").over(wfrom), 9
            ).alias("share"),
        )
        .collect()
    )
    rev_rows = (
        tagged.groupBy("to_segment")
        .agg(
            F.round(
                F.sum("r2").cast("double") / F.count("*"), 9
            ).alias("rev")
        )
        .collect()
    )
    n_rows = (
        tagged.groupBy("from_segment")
        .agg(F.count("*").cast("long").alias("n_users"))
        .collect()
    )
    P = {(r["from_segment"], r["to_segment"]): r["share"] for r in p_rows}
    segs = sorted({a for a, _ in P})
    v = {r["to_segment"]: r["rev"] for r in rev_rows}
    gamma = float(_MLTV_GAMMA)

    def step(vec):
        out = {}
        for a in segs:
            units = sum(
                int(round(round(P[(a, b)] * vec.get(b, 0.0), 9) * 1e9))
                for b in sorted(
                    bb for (aa, bb) in P if aa == a
                )
            )
            out[a] = round(units / 1e9, 9)
        return out

    v1 = step(v)
    v2 = step(v1)
    v3 = step(v2)
    nmap = {r["from_segment"]: int(r["n_users"]) for r in n_rows}
    rows = [
        (
            s,
            nmap[s],
            round(v1[s], 6),
            round(v2[s], 6),
            round(v3[s], 6),
            round(v1[s] + gamma * v2[s] + gamma * gamma * v3[s], 6),
        )
        for s in segs
    ]
    return spark.createDataFrame(
        rows,
        "segment string, n_users long, rev_p1 double, rev_p2 double, "
        "rev_p3 double, ltv_3p double",
    )


@query(
    "q_hhi",
    oracle="""
    WITH li AS (
        SELECT p.p_brand AS brand,
               CASE WHEN o.o_orderdate < TIMESTAMP '1998-07-01'
                    THEN 0 ELSE 1 END AS period,
               CAST(l.l_extendedprice AS DECIMAL(18,2)) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey),
    b AS (
        SELECT period, brand, SUM(rev) AS rev
        FROM li GROUP BY period, brand),
    s AS (
        SELECT period, brand,
               ROUND(CAST(rev AS DOUBLE)
                     / CAST(SUM(rev) OVER (PARTITION BY period)
                            AS DOUBLE), 9) AS share
        FROM b),
    h AS (
        SELECT period,
               CAST(COUNT(*) AS BIGINT) AS n_brands,
               ROUND(CAST(SUM(CAST(ROUND(share * share * 10000, 9)
                    AS DECIMAL(28,9))) AS DOUBLE), 6) AS hhi
        FROM s GROUP BY period)
    SELECT period, n_brands, hhi,
           CASE WHEN hhi < 1500 THEN 'competitive'
                WHEN hhi < 2500 THEN 'moderate'
                ELSE 'concentrated' END AS regime
    FROM h
    """,
)
def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman revenue concentration per period — the
    antitrust-grade market-structure number (sum of squared shares,
    scaled to the conventional 0-10000 points, with the DOJ regime
    bands): is brand revenue diversifying or concentrating between
    the window's halves?  The distribution-shape complement to
    q_lorenz_gini's customer-side concentration.

    Scale shape: one fact-fact join + one (period, brand)-keyed
    DECIMAL aggregation; shares and the squared-share sums live on
    the brand-bounded frame (terms round to 9 dp before DECIMAL
    sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.when(
            F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("period"),
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_brand").alias("brand"),
    )
    b = (
        li.join(o, "l_orderkey")
        .join(F.broadcast(p), "l_partkey")
        .groupBy("period", "brand")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "rev"
            )
        )
    )
    wp = Window.partitionBy("period")
    s = b.select(
        "period",
        "brand",
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(wp).cast("double"),
            9,
        ).alias("share"),
    )
    h = s.groupBy("period").agg(
        F.count("*").cast("long").alias("n_brands"),
        F.round(
            F.sum(
                F.round(
                    F.col("share") * F.col("share") * 10000, 9
                ).cast("decimal(28,9)")
            ).cast("double"),
            6,
        ).alias("hhi"),
    )
    return h.select(
        "period",
        "n_brands",
        "hhi",
        F.when(F.col("hhi") < 1500, "competitive")
        .when(F.col("hhi") < 2500, "moderate")
        .otherwise("concentrated")
        .alias("regime"),
    )


@query(
    "q_evalue",
    oracle="""
    WITH arms AS (
        SELECT CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS nt,
               CAST(SUM(CASE WHEN user_id % 2 = 0 AND value > 50
                    THEN 1 ELSE 0 END) AS DOUBLE) AS st,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS DOUBLE) AS nc,
               CAST(SUM(CASE WHEN user_id % 2 = 1 AND value > 50
                    THEN 1 ELSE 0 END) AS DOUBLE) AS sc
        FROM events),
    rrr AS (
        SELECT CAST(nt AS BIGINT) AS n_treat,
               CAST(nc AS BIGINT) AS n_ctrl,
               ROUND(st / nt, 6) AS rate_treat,
               ROUND(sc / nc, 6) AS rate_ctrl,
               CASE WHEN st / nt >= sc / nc
                    THEN (st / nt) / (sc / nc)
                    ELSE (sc / nc) / (st / nt) END AS rr
        FROM arms)
    SELECT n_treat, n_ctrl, rate_treat, rate_ctrl,
           ROUND(rr, 6) AS risk_ratio,
           ROUND(rr + sqrt(rr * (rr - 1)), 6) AS e_value
    FROM rrr
    """,
)
def q_evalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-value sensitivity analysis (VanderWeele & Ding 2017): how
    strong would an UNMEASURED confounder have to be — on the
    risk-ratio scale, with both the treatment and the outcome — to
    explain away the observed effect entirely?  E = RR + sqrt(RR(RR-1))
    on the effect direction's risk ratio.  The robustness stamp every
    observational estimate on the causal shelf (q_stratified_ate,
    q_propensity_matching, q_iv_2sls's reduced form) should carry:
    an E-value near 1 means a whisper of confounding kills the
    finding.

    Scale shape: ONE conditionally-aggregated scan to four integers,
    then 1-row closed-form scalar algebra (sqrt is IEEE-exact)."""
    ev = load_table(spark, sf_dir, "events")
    treat = F.col("user_id") % 2 == 0
    conv = F.col("value") > 50
    arms = ev.agg(
        F.sum(F.when(treat, 1).otherwise(0)).cast("double").alias("nt"),
        F.sum(F.when(treat & conv, 1).otherwise(0))
        .cast("double")
        .alias("st"),
        F.sum(F.when(~treat, 1).otherwise(0)).cast("double").alias("nc"),
        F.sum(F.when((~treat) & conv, 1).otherwise(0))
        .cast("double")
        .alias("sc"),
    )
    nt, st, nc, sc = F.col("nt"), F.col("st"), F.col("nc"), F.col("sc")
    rt, rc = st / nt, sc / nc
    rr = F.when(rt >= rc, rt / rc).otherwise(rc / rt)
    return arms.select(
        nt.cast("long").alias("n_treat"),
        nc.cast("long").alias("n_ctrl"),
        F.round(rt, 6).alias("rate_treat"),
        F.round(rc, 6).alias("rate_ctrl"),
        F.round(rr, 6).alias("risk_ratio"),
        F.round(rr + F.sqrt(rr * (rr - 1)), 6).alias("e_value"),
    )
