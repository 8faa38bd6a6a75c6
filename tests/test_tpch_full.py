"""The six testdata-blocked TPC-H queries (Q2 Q9 Q11 Q16 Q20 Q21) run
against DuckDB executing the OFFICIAL TPC-H SQL on synthetic
full-schema fixtures (partsupp + commit/receipt dates, which
/root/testdata lacks).  Also pins the plan shapes: dim chains
broadcast, no cartesian products, Q21's EXISTS pair stays a two-shuffle
aggregate instead of a triple self-join."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest

from clv_data_pipeline_spark.queries.tpch_full import (
    tpch_q2,
    tpch_q9,
    tpch_q11,
    tpch_q16,
    tpch_q20,
    tpch_q21,
)

_COLORS = ["green", "blue", "forest", "red", "ivory", "navy"]
_TYPES1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY"]
_TYPES2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
_TYPES3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _fixture() -> dict[str, pd.DataFrame]:
    region = pd.DataFrame(
        {"r_regionkey": range(5), "r_name": _REGIONS}
    )
    n_names = ["GERMANY", "CANADA", "SAUDI ARABIA"] + [
        f"NATION{i}" for i in range(3, 25)
    ]
    # Germany in EUROPE, Canada in AMERICA, Saudi Arabia in MIDDLE EAST
    n_region = [3, 1, 4] + [i % 5 for i in range(3, 25)]
    nation = pd.DataFrame(
        {
            "n_nationkey": range(25),
            "n_name": n_names,
            "n_regionkey": n_region,
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": range(1, 41),
            "s_name": [f"Supplier#{i:09d}" for i in range(1, 41)],
            "s_address": [f"addr {i * 37 % 100} lane" for i in range(1, 41)],
            "s_nationkey": [(i * 7) % 25 for i in range(1, 41)],
            "s_phone": [f"{i % 34 + 10}-{i:03d}-555" for i in range(1, 41)],
            "s_acctbal": [round((i * 931) % 10000 / 10.0, 2) for i in range(1, 41)],
            "s_comment": [
                "Customer service Complaints filed" if i % 11 == 0
                else f"reliable supplier {i}"
                for i in range(1, 41)
            ],
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": range(1, 101),
            "p_name": [
                f"{_COLORS[i % 6]} {_COLORS[(i // 2) % 6]} metal"
                for i in range(1, 101)
            ],
            "p_mfgr": [f"Manufacturer#{i % 5 + 1}" for i in range(1, 101)],
            "p_brand": [f"Brand#{i % 5 + 1}{i % 3 + 3}" for i in range(1, 101)],
            "p_type": [
                f"{_TYPES1[i % 5]} {_TYPES2[(i // 5) % 5]} {_TYPES3[(i // 3) % 5]}"
                for i in range(1, 101)
            ],
            # (i*7)%50+1 makes part 52 a size-15 BRASS part with exactly
            # one EUROPE supplier — Q2's filters must select something
            "p_size": [(i * 7) % 50 + 1 for i in range(1, 101)],
            "p_retailprice": [900.0 + i for i in range(1, 101)],
        }
    )
    ps_rows = []
    for p in range(1, 101):
        for j in range(4):
            ps_rows.append(
                {
                    "ps_partkey": p,
                    "ps_suppkey": (p + j * 13) % 40 + 1,
                    "ps_availqty": (p * 17 + j * 29) % 999 + 1,
                    "ps_supplycost": round((p * 53 + j * 7) % 1000 / 10.0 + 1, 2),
                    "ps_comment": f"stock note {p}-{j}",
                }
            )
    partsupp = pd.DataFrame(ps_rows)
    epoch = datetime.datetime(1993, 1, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": range(1, 151),
            "o_custkey": [(i * 3) % 50 + 1 for i in range(1, 151)],
            "o_orderstatus": ["F" if i % 2 else "O" for i in range(1, 151)],
            "o_totalprice": [1000.0 + i * 11 for i in range(1, 151)],
            "o_orderdate": [
                epoch + datetime.timedelta(days=(i * 29) % 1460)
                for i in range(1, 151)
            ],
            "o_orderpriority": [f"{i % 5 + 1}-PRIO" for i in range(1, 151)],
        }
    )
    li_rows = []
    for o in range(1, 151):
        for j in range(o % 4 + 1):
            ps = ps_rows[(o * 7 + j * 31) % len(ps_rows)]
            ship = epoch + datetime.timedelta(days=(o * 17 + j * 111) % 1460)
            commit = ship + datetime.timedelta(days=(o + j) % 30 - 10)
            receipt = commit + datetime.timedelta(days=(o * 3 + j) % 8 - 3)
            li_rows.append(
                {
                    "l_orderkey": o,
                    "l_partkey": ps["ps_partkey"],
                    "l_suppkey": ps["ps_suppkey"],
                    "l_linenumber": j + 1,
                    "l_quantity": float((o * 7 + j) % 50 + 1),
                    "l_extendedprice": round((o * 97 + j * 13) % 9000 / 1.0 + 100, 2),
                    "l_discount": ((o + j) % 11) / 100.0,
                    "l_tax": (o % 9) / 100.0,
                    "l_shipdate": ship,
                    "l_commitdate": commit,
                    "l_receiptdate": receipt,
                }
            )
    lineitem = pd.DataFrame(li_rows)
    return {
        "region": region,
        "nation": nation,
        "supplier": supplier,
        "part": part,
        "partsupp": partsupp,
        "orders": orders,
        "lineitem": lineitem,
    }


@pytest.fixture(scope="module")
def tpch(spark):
    pdfs = _fixture()
    con = duckdb.connect()
    for name, pdf in pdfs.items():
        con.register(name, pdf)
    sdfs = {name: spark.createDataFrame(pdf) for name, pdf in pdfs.items()}
    return sdfs, con


def _compare(sdf, odf, float_cols=(), tol=1e-6):
    got = sdf.toPandas()
    assert sorted(got.columns) == sorted(odf.columns)
    assert len(got) == len(odf), f"{len(got)} vs {len(odf)} rows"
    assert len(got) > 0, "degenerate fixture: empty result proves nothing"
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    odf = odf[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if c in float_cols:
            assert (got[c].astype(float) - odf[c].astype(float)).abs().max() < tol, c
        else:
            assert got[c].tolist() == odf[c].tolist(), c


def test_q2_min_cost_supplier(tpch):
    sdfs, con = tpch
    out = tpch_q2(sdfs)
    oracle = con.sql("""
        SELECT s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address,
               s_phone, s_comment
        FROM part, supplier, partsupp, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_size = 15 AND p_type LIKE '%BRASS'
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost = (
              SELECT MIN(ps_supplycost)
              FROM partsupp, supplier, nation, region
              WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
                AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
                AND r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """).df()
    _compare(out, oracle, float_cols={"s_acctbal"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q9_product_profit(tpch):
    sdfs, con = tpch
    out = tpch_q9(sdfs)
    oracle = con.sql("""
        SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit FROM (
            SELECT n_name AS nation,
                   CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount)
                       - ps_supplycost * l_quantity AS amount
            FROM part, supplier, lineitem, partsupp, orders, nation
            WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
              AND ps_partkey = l_partkey AND p_partkey = l_partkey
              AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
              AND p_name LIKE '%green%') profit
        GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """).df()
    _compare(out, oracle, float_cols={"sum_profit"}, tol=0.011)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q11_important_stock(tpch):
    sdfs, con = tpch
    out = tpch_q11(sdfs, fraction=0.01)
    oracle = con.sql("""
        SELECT ps_partkey,
               ROUND(SUM(ps_supplycost * ps_availqty), 2) AS part_value
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'GERMANY'
        GROUP BY ps_partkey
        HAVING SUM(ps_supplycost * ps_availqty) > (
            SELECT SUM(ps_supplycost * ps_availqty) * 0.01
            FROM partsupp, supplier, nation
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'GERMANY')
        ORDER BY part_value DESC
    """).df()
    _compare(out, oracle, float_cols={"part_value"})


def test_q16_supplier_relationship(tpch):
    sdfs, con = tpch
    out = tpch_q16(sdfs)
    oracle = con.sql("""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT ps_suppkey) AS supplier_cnt
        FROM partsupp, part
        WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#45'
          AND p_type NOT LIKE 'MEDIUM POLISHED%'
          AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
          AND ps_suppkey NOT IN (
              SELECT s_suppkey FROM supplier
              WHERE s_comment LIKE '%Customer%Complaints%')
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """).df()
    _compare(out, oracle)


def test_q20_potential_promotion(tpch):
    sdfs, con = tpch
    out = tpch_q20(sdfs)
    oracle = con.sql("""
        SELECT s_name, s_address FROM supplier, nation
        WHERE s_suppkey IN (
            SELECT ps_suppkey FROM partsupp
            WHERE ps_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'forest%')
              AND ps_availqty > (
                  SELECT 0.5 * SUM(l_quantity) FROM lineitem
                  WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
                    AND l_shipdate >= TIMESTAMP '1994-01-01'
                    AND l_shipdate < TIMESTAMP '1995-01-01'))
          AND s_nationkey = n_nationkey AND n_name = 'CANADA'
        ORDER BY s_name
    """).df()
    _compare(out, oracle)


def test_q21_waiting_suppliers(tpch):
    sdfs, con = tpch
    out = tpch_q21(sdfs)
    oracle = con.sql("""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier, lineitem l1, orders, nation
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_receiptdate > l1.l_commitdate
          AND EXISTS (SELECT * FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT * FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_receiptdate > l3.l_commitdate)
          AND s_nationkey = n_nationkey AND n_name = 'SAUDI ARABIA'
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """).df()
    _compare(out, oracle)
    # the EXISTS pair must NOT become extra lineitem self-joins: one
    # aggregate + one join back, and never a cartesian product
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
