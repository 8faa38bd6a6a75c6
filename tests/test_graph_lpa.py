"""Label propagation (operators/graph.py): planted-partition recovery,
determinism across partitionings, and the attribution query's window
semantics on a hand-built timeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from clv_data_pipeline_spark.operators.graph import label_propagation


def _labels(df):
    return {r["node"]: r["lab"] for r in df.collect()}


def test_lpa_recovers_planted_cliques(spark):
    # two 4-cliques joined by a single bridge edge
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(c1 + c2 + [(3, 10)], "src long, dst long")
    got = _labels(label_propagation(edges, iters=3))
    # every clique collapses to one label; min-tie-break makes it the
    # smallest member
    assert len({got[n] for n in range(4)}) == 1
    assert len({got[n] for n in range(10, 14)}) == 1
    assert got[0] != got[12]


def test_lpa_partition_invariant(spark):
    edges = spark.createDataFrame(
        [(a, b) for a in range(8) for b in range(8) if a < b and (a + b) % 3],
        "src long, dst long",
    )
    one = _labels(label_propagation(edges.coalesce(1), iters=3))
    many = _labels(label_propagation(edges.repartition(7), iters=3))
    assert one == many


def test_attribution_window_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> purchase (credit: click), then a
        # bare purchase later still credits click (last non-purchase)
        (1, 1, base, "view", 0.0),
        (2, 1, base + dt.timedelta(minutes=1), "click", 0.0),
        (3, 1, base + dt.timedelta(minutes=2), "purchase", 10.0),
        (4, 1, base + dt.timedelta(minutes=3), "purchase", 5.0),
        # user 2: purchase with no prior events -> direct
        (5, 2, base, "purchase", 7.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double"
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    got = {
        (r["channel"], r["n"]): r["rev"]
        for r in e.withColumn(
            "channel", F.coalesce(last_touch, F.lit("direct"))
        )
        .filter(F.col("event_type") == "purchase")
        .groupBy("channel")
        .agg(F.count("*").alias("n"), F.sum("value").alias("rev"))
        .collect()
    }
    assert got == {("click", 2): 15.0, ("direct", 1): 7.0}


def test_ancestor_paths_chain_and_forest(spark):
    from clv_data_pipeline_spark.operators.graph import ancestor_paths

    # chain 3->2->1->0 plus a second root 10 with one child 11
    edges = spark.createDataFrame(
        [(0, None), (1, 0), (2, 1), (3, 2), (10, None), (11, 10)],
        "node long, parent long",
    )
    got = {r["node"]: r for r in ancestor_paths(edges, max_depth=6).collect()}
    assert got[3]["path"] == "0/1/2/3" and got[3]["depth"] == 3
    assert got[3]["root"] == 0
    assert got[0]["path"] == "0" and got[0]["depth"] == 0
    assert got[11]["path"] == "10/11" and got[11]["root"] == 10


def test_doubling_matches_linear_on_deep_chain(spark):
    from clv_data_pipeline_spark.operators.graph import (
        ancestor_depths_doubling,
        ancestor_paths,
    )

    # a 20-deep chain: doubling needs 5 rounds, linear needs 20 hops
    edges = spark.createDataFrame(
        [(i, i - 1 if i else None) for i in range(21)],
        "node long, parent long",
    )
    lin = {
        (r["node"], r["depth"], r["root"])
        for r in ancestor_paths(edges, max_depth=21)
        .select("node", "depth", "root").collect()
    }
    dbl = {
        (r["node"], r["depth"], r["root"])
        for r in ancestor_depths_doubling(edges, rounds=5).collect()
    }
    assert lin == dbl
    assert (20, 20, 0) in dbl


def test_communities_ann_agrees_with_exact(spark):
    """The LSH-kernel variant must reproduce the exact variant's
    community structure on the fixture: same schema, full node
    coverage, and high pairwise same-community agreement."""
    from itertools import combinations
    from random import Random

    from clv_data_pipeline_spark import registry
    from tests.conftest import SF_SMOKE

    exact = {
        r["vec_id"]: r["community"]
        for r in registry.all_queries()["q_communities"](
            spark, SF_SMOKE
        ).collect()
    }
    ann = {
        r["vec_id"]: r["community"]
        for r in registry.all_queries()["q_communities_ann"](
            spark, SF_SMOKE
        ).collect()
    }
    assert set(ann) == set(exact)
    # pairwise same-community agreement over a fixed sample of pairs
    ids = sorted(exact)
    rng = Random(7)
    pairs = [tuple(rng.sample(ids, 2)) for _ in range(2000)]
    agree = sum(
        (exact[a] == exact[b]) == (ann[a] == ann[b]) for a, b in pairs
    )
    assert agree / len(pairs) >= 0.8, agree / len(pairs)
