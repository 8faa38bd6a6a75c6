"""The six TPC-H queries the driver testdata cannot host (Q2 Q9 Q11
Q16 Q20 Q21): they need the ``partsupp`` table or lineitem's
``l_commitdate``/``l_receiptdate``, absent from ``/root/testdata``
(TESTDATA.md).  Implemented here as full-schema operators over a
``tables: dict[str, DataFrame]`` so a user with complete TPC-H data
runs them as-is; ``tests/test_tpch_full.py`` verifies each against
DuckDB executing the official SQL on synthetic full-schema fixtures.

Scale notes (the same playbook as queries/tpch.py):

- dimension chains (region -> nation -> supplier) broadcast — no
  shuffle of the big fact side for selective dims;
- per-group minima/thresholds computed as aggregates joined back by
  key, never correlated per-row subqueries;
- Q21's EXISTS / NOT EXISTS pair collapses to ONE per-order aggregate
  (distinct supplier count + distinct late-supplier count) joined back
  to the late rows — two shuffles total, where the literal SQL shape
  would self-join lineitem three times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tpch_q2(
    tables: dict[str, DataFrame],
    size: int = 15,
    type_suffix: str = "BRASS",
    region: str = "EUROPE",
    limit: int = 100,
) -> DataFrame:
    """Q2 minimum-cost supplier: for each qualifying part, the supplier
    with the region-wide minimum ps_supplycost."""
    part, partsupp, supplier, nation, reg = (
        tables["part"], tables["partsupp"], tables["supplier"],
        tables["nation"], tables["region"],
    )
    # regional suppliers: dim chain broadcasts into partsupp
    rsupp = (
        partsupp
        .join(
            F.broadcast(
                supplier.join(
                    F.broadcast(
                        nation.join(
                            F.broadcast(reg.filter(F.col("r_name") == region)),
                            nation["n_regionkey"] == reg["r_regionkey"],
                        ).select("n_nationkey", "n_name")
                    ),
                    supplier["s_nationkey"] == F.col("n_nationkey"),
                ).select(
                    "s_suppkey", "s_acctbal", "s_name", "s_address",
                    "s_phone", "s_comment", "n_name",
                )
            ),
            partsupp["ps_suppkey"] == F.col("s_suppkey"),
        )
    )
    # min_cost derives FROM rsupp: rename its key so the join condition
    # references two distinct attributes (a raw self-column reference
    # would be trivially true — same trap as operators/merge.py)
    min_cost = rsupp.groupBy(
        F.col("ps_partkey").alias("_mc_partkey")
    ).agg(F.min("ps_supplycost").alias("_min_cost"))
    qual_parts = part.filter(
        (F.col("p_size") == size) & F.col("p_type").endswith(type_suffix)
    ).select("p_partkey", "p_mfgr")
    return (
        rsupp.join(
            min_cost,
            (F.col("ps_partkey") == F.col("_mc_partkey"))
            & (F.col("ps_supplycost") == F.col("_min_cost")),
        )
        .join(qual_parts, F.col("ps_partkey") == qual_parts["p_partkey"])
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
            "s_address", "s_phone", "s_comment",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(limit)
    )


def tpch_q9(
    tables: dict[str, DataFrame], color: str = "green"
) -> DataFrame:
    """Q9 product-type profit by nation and order year."""
    part, partsupp, supplier, nation, orders, lineitem = (
        tables["part"], tables["partsupp"], tables["supplier"],
        tables["nation"], tables["orders"], tables["lineitem"],
    )
    colored = part.filter(F.col("p_name").contains(color)).select("p_partkey")
    sn = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    profit = (
        lineitem
        .join(F.broadcast(colored), lineitem["l_partkey"] == colored["p_partkey"])
        .join(
            partsupp,
            (lineitem["l_suppkey"] == partsupp["ps_suppkey"])
            & (lineitem["l_partkey"] == partsupp["ps_partkey"]),
        )
        .join(F.broadcast(sn), lineitem["l_suppkey"] == sn["s_suppkey"])
        .join(orders.select("o_orderkey", "o_orderdate"), lineitem["l_orderkey"] == F.col("o_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            (
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
                - F.col("ps_supplycost") * F.col("l_quantity")
            ).alias("amount"),
        )
    )
    return (
        profit.groupBy("nation", "o_year")
        .agg(
            F.round(
                F.sum(F.col("amount").cast("decimal(25,6)")).cast("double"), 2
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


def tpch_q11(
    tables: dict[str, DataFrame],
    nation: str = "GERMANY",
    fraction: float = 0.0001,
) -> DataFrame:
    """Q11 important stock: part values above a share of the nation's
    total inventory value.  The threshold is a 1-row broadcast, not a
    correlated subquery."""
    partsupp, supplier, nat = (
        tables["partsupp"], tables["supplier"], tables["nation"],
    )
    nsupp = supplier.join(
        F.broadcast(nat.filter(F.col("n_name") == nation)),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey")
    ps = partsupp.join(
        F.broadcast(nsupp), partsupp["ps_suppkey"] == nsupp["s_suppkey"]
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty"))
        .cast("decimal(25,6)")
        .alias("_v"),
    )
    per_part = ps.groupBy("ps_partkey").agg(F.sum("_v").alias("_pv"))
    total = ps.agg((F.sum("_v") * F.lit(fraction)).alias("_threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("_pv") > F.col("_threshold"))
        .select(
            "ps_partkey",
            F.round(F.col("_pv").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "ps_partkey")
    )


def tpch_q16(
    tables: dict[str, DataFrame],
    brand: str = "Brand#45",
    type_prefix: str = "MEDIUM POLISHED",
    sizes: tuple[int, ...] = (49, 14, 23, 45, 19, 3, 36, 9),
) -> DataFrame:
    """Q16 parts/supplier relationship: distinct suppliers per
    (brand, type, size), excluding complaint suppliers via anti-join."""
    part, partsupp, supplier = (
        tables["part"], tables["partsupp"], tables["supplier"],
    )
    complaints = supplier.filter(
        F.col("s_comment").rlike("Customer.*Complaints")
    ).select(F.col("s_suppkey").alias("_bad"))
    qual = part.filter(
        (F.col("p_brand") != brand)
        & ~F.col("p_type").startswith(type_prefix)
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        partsupp.join(
            F.broadcast(complaints),
            partsupp["ps_suppkey"] == F.col("_bad"),
            "left_anti",
        )
        .join(qual, partsupp["ps_partkey"] == qual["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def tpch_q20(
    tables: dict[str, DataFrame],
    color_prefix: str = "forest",
    date_lo: str = "1994-01-01",
    date_hi: str = "1995-01-01",
    nation: str = "CANADA",
) -> DataFrame:
    """Q20 potential part promotion: suppliers holding excess stock
    (availqty > half the year's shipped quantity) of qualifying parts."""
    part, partsupp, supplier, nat, lineitem = (
        tables["part"], tables["partsupp"], tables["supplier"],
        tables["nation"], tables["lineitem"],
    )
    qual_parts = part.filter(F.col("p_name").startswith(color_prefix)).select(
        "p_partkey"
    )
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_lo))
            & (F.col("l_shipdate") < F.lit(date_hi))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.lit(0.5)
                * F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double")
            ).alias("_half_qty")
        )
    )
    excess = (
        partsupp.join(
            F.broadcast(qual_parts),
            partsupp["ps_partkey"] == qual_parts["p_partkey"],
            "left_semi",
        )
        .join(
            shipped,
            (partsupp["ps_partkey"] == shipped["l_partkey"])
            & (partsupp["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .filter(F.col("ps_availqty") > F.col("_half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    nsupp = supplier.join(
        F.broadcast(nat.filter(F.col("n_name") == nation)),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    )
    return (
        nsupp.join(excess, nsupp["s_suppkey"] == excess["ps_suppkey"], "left_semi")
        .select("s_name", "s_address")
        .orderBy("s_name")
    )


def tpch_q21(
    tables: dict[str, DataFrame], nation: str = "SAUDI ARABIA", limit: int = 100
) -> DataFrame:
    """Q21 suppliers who kept orders waiting: sole late supplier on a
    multi-supplier order.  The EXISTS / NOT EXISTS pair becomes one
    per-order aggregate — distinct suppliers and distinct LATE
    suppliers — joined back to the late rows; a late row survives iff
    the order has >= 2 suppliers and exactly 1 late one (itself)."""
    supplier, nat, orders, lineitem = (
        tables["supplier"], tables["nation"], tables["orders"],
        tables["lineitem"],
    )
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_receiptdate") > F.col("l_commitdate")).alias("_late"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("_late"), F.col("l_suppkey"))
        ).alias("_n_late"),
    )
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    nsupp = supplier.join(
        F.broadcast(nat.filter(F.col("n_name") == nation)),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        li.filter(F.col("_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_late") == 1))
        .join(f_orders, F.col("l_orderkey") == f_orders["o_orderkey"], "left_semi")
        .join(F.broadcast(nsupp), F.col("l_suppkey") == nsupp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(limit)
    )
