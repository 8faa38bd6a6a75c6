"""Driver-checkable DERIVED variants of the six TPC-H queries the
testdata cannot host natively (Q2 Q9 Q11 Q16 Q20 Q21 — VERDICT r5 #6).

``/root/testdata`` lacks the ``partsupp`` table, lineitem's
``l_commitdate``/``l_receiptdate``, and a few dimension attributes
(p_mfgr, s_address/s_phone/s_comment).  Each missing input is
synthesized DETERMINISTICALLY from existing columns with pure integer
arithmetic — the same formulas appear verbatim in the Spark plan and
the DuckDB oracle, so the driver hash-verifies the full Q2/Q9/Q11/
Q16/Q20/Q21 join-and-aggregate logic end to end.  (The TRUE-schema
implementations live in ``queries/tpch_full.py``, verified against
the official TPC-H SQL on full-schema fixtures in
``tests/test_tpch_full.py``; these derived twins exist to put that
logic under the driver's oracle gate too.)

Derivations (0-based keys; S = |supplier| read from the data by both
engines, so every scale factor stays consistent):

- partsupp: 4 suppliers per part via the TPC-H dbgen spreading
  formula ``(p_partkey + i*(S/4 + p_partkey/S)) % S``; availqty and
  supplycost are modular arithmetic over the keys.
- l_commitdate / l_receiptdate: shipdate + key-derived day offsets in
  [0,30) / [1,30] — about half the lines land "late", giving Q21 real
  work.
- p_mfgr, s_address/s_phone/s_comment: key-derived strings;
  ``s_suppkey % 10 == 0`` suppliers carry the Q16 complaint marker so
  the anti-join filters real rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clv_data_pipeline_spark.queries.tpch_full import (
    tpch_q2,
    tpch_q9,
    tpch_q11,
    tpch_q16,
    tpch_q20,
    tpch_q21,
)
from clv_data_pipeline_spark.registry import query
from clv_data_pipeline_spark.sources.io import load_table

#: DuckDB CTE prefix reproducing every derived input.  Any oracle
#: below starts ``WITH {_DERIVED_CTES}, ...``.
_DERIVED_CTES = """
    sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM supplier),
    ps0 AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + i * (s // 4 + p_partkey // s)) % s
                   AS ps_suppkey,
               (p_partkey * 7 + i * 13) % 9999 + 1 AS ps_availqty
        FROM part CROSS JOIN sc
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) u),
    partsupp2 AS (
        SELECT ps_partkey, ps_suppkey, ps_availqty,
               CAST((ps_partkey * 31 + ps_suppkey * 17) % 90000
                    AS DOUBLE) / CAST(100 AS DOUBLE)
                   + CAST(100 AS DOUBLE) AS ps_supplycost
        FROM ps0),
    supplier2 AS (
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
               'addr_' || CAST(s_suppkey AS VARCHAR) AS s_address,
               'phone_' || CAST(s_suppkey AS VARCHAR) AS s_phone,
               CASE WHEN s_suppkey % 10 = 0 THEN 'Customer Complaints'
                    ELSE 'no comment' END AS s_comment
        FROM supplier),
    part2 AS (
        SELECT *, 'Manufacturer#' || CAST(p_partkey % 5 AS VARCHAR)
                   AS p_mfgr
        FROM part),
    lineitem2 AS (
        SELECT *,
               CAST(l_shipdate AS DATE)
                   + CAST((l_orderkey * 13 + l_linenumber * 5) % 30
                          AS INT) AS l_commitdate,
               CAST(l_shipdate AS DATE)
                   + CAST(1 + (l_orderkey * 7 + l_linenumber * 3) % 30
                          AS INT) AS l_receiptdate
        FROM lineitem)
"""


def _derived_tables(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The full-schema ``tables`` dict for queries/tpch_full.py, with
    every missing input synthesized by the same formulas as
    ``_DERIVED_CTES``.  ``supplier.count()`` is the one driver scalar
    (bounded: table cardinality); the oracle reads the same S from the
    data, so both engines derive identical partsupp rows at any SF."""
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    s = supplier.count()
    s4 = s // 4
    partsupp = (
        part.select("p_partkey")
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(3))))
        .selectExpr(
            "p_partkey AS ps_partkey",
            f"(p_partkey + i * ({s4} + p_partkey DIV {s})) % {s}"
            " AS ps_suppkey",
            "(p_partkey * 7 + i * 13) % 9999 + 1 AS ps_availqty",
        )
        .withColumn(
            "ps_supplycost",
            F.expr(
                "CAST((ps_partkey * 31 + ps_suppkey * 17) % 90000"
                " AS DOUBLE) / CAST(100 AS DOUBLE)"
                " + CAST(100 AS DOUBLE)"
            ),
        )
    )
    supplier2 = supplier.selectExpr(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal",
        "'addr_' || CAST(s_suppkey AS STRING) AS s_address",
        "'phone_' || CAST(s_suppkey AS STRING) AS s_phone",
        "CASE WHEN s_suppkey % 10 = 0 THEN 'Customer Complaints'"
        " ELSE 'no comment' END AS s_comment",
    )
    part2 = part.withColumn(
        "p_mfgr",
        F.expr("'Manufacturer#' || CAST(p_partkey % 5 AS STRING)"),
    )
    lineitem2 = load_table(spark, sf_dir, "lineitem").selectExpr(
        "*",
        "DATE_ADD(CAST(l_shipdate AS DATE),"
        " CAST((l_orderkey * 13 + l_linenumber * 5) % 30 AS INT))"
        " AS l_commitdate",
        "DATE_ADD(CAST(l_shipdate AS DATE),"
        " CAST(1 + (l_orderkey * 7 + l_linenumber * 3) % 30 AS INT))"
        " AS l_receiptdate",
    )
    return {
        "part": part2,
        "partsupp": partsupp,
        "supplier": supplier2,
        "nation": load_table(spark, sf_dir, "nation"),
        "region": load_table(spark, sf_dir, "region"),
        "orders": load_table(spark, sf_dir, "orders"),
        "lineitem": lineitem2,
    }


@query(
    "q_tpch_q2_derived",
    oracle=f"""
    WITH {_DERIVED_CTES}
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_mfgr,
           s.s_address, s.s_phone, s.s_comment
    FROM part2 p, supplier2 s, partsupp2 ps, nation n, region r
    WHERE p.p_partkey = ps.ps_partkey
      AND s.s_suppkey = ps.ps_suppkey
      AND p.p_size = 15 AND p.p_type LIKE '%DARD'
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
          SELECT MIN(ps2.ps_supplycost)
          FROM partsupp2 ps2, supplier2 s2, nation n2, region r2
          WHERE p.p_partkey = ps2.ps_partkey
            AND s2.s_suppkey = ps2.ps_suppkey
            AND s2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier over the derived partsupp (TESTDATA
    params: size 15, type suffix 'DARD', region EUROPE).  Plan shape:
    dim chain broadcasts into partsupp; the correlated MIN becomes a
    per-part aggregate joined back (queries/tpch_full.py:27)."""
    return tpch_q2(
        _derived_tables(spark, sf_dir),
        size=15, type_suffix="DARD", region="EUROPE",
    )


@query(
    "q_tpch_q9_derived",
    oracle=f"""
    WITH {_DERIVED_CTES}
    SELECT nation, o_year,
           ROUND(CAST(SUM(CAST(amount AS DECIMAL(25,6))) AS DOUBLE), 2)
               AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                   - ps.ps_supplycost * l.l_quantity AS amount
        FROM lineitem l, partsupp2 ps, supplier2 s, part2 p,
             orders o, nation n
        WHERE s.s_suppkey = l.l_suppkey
          AND ps.ps_suppkey = l.l_suppkey
          AND ps.ps_partkey = l.l_partkey
          AND p.p_partkey = l.l_partkey
          AND o.o_orderkey = l.l_orderkey
          AND s.s_nationkey = n.n_nationkey
          AND p.p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit by nation and order year over the
    derived partsupp (color 'red').  The 5-way join keeps lineitem as
    the single big side; parts/suppliers/nations broadcast
    (queries/tpch_full.py:88)."""
    return tpch_q9(_derived_tables(spark, sf_dir), color="red")


@query(
    "q_tpch_q11_derived",
    oracle=f"""
    WITH {_DERIVED_CTES},
    nsupp AS (
        SELECT s_suppkey FROM supplier2 s, nation n
        WHERE s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_7'),
    ps AS (
        SELECT ps_partkey,
               CAST(ps_supplycost * ps_availqty AS DECIMAL(25,6)) AS v
        FROM partsupp2 JOIN nsupp ON ps_suppkey = s_suppkey)
    SELECT ps_partkey,
           ROUND(CAST(SUM(v) AS DOUBLE), 2) AS part_value
    FROM ps
    GROUP BY ps_partkey
    HAVING CAST(SUM(v) AS DOUBLE) >
           (SELECT CAST(SUM(v) AS DOUBLE) * CAST(0.003 AS DOUBLE)
            FROM ps)
    """,
)
def q_tpch_q11_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock over the derived partsupp (NATION_7,
    fraction 0.003 — above-average parts only on this data).  The
    threshold is a 1-row broadcast, never a correlated subquery
    (queries/tpch_full.py:131)."""
    return tpch_q11(
        _derived_tables(spark, sf_dir),
        nation="NATION_7", fraction=0.003,
    )


@query(
    "q_tpch_q16_derived",
    oracle=f"""
    WITH {_DERIVED_CTES}
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp2 ps, part2 p
    WHERE p.p_partkey = ps.ps_partkey
      AND p.p_brand <> 'Brand#9'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier2
          WHERE s_comment LIKE '%Customer%Complaints%')
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship over the derived partsupp
    (excluding Brand#9 / MEDIUM types; complaint suppliers are the
    s_suppkey % 10 == 0 tenth, so the anti-join removes real rows)
    (queries/tpch_full.py:167)."""
    return tpch_q16(
        _derived_tables(spark, sf_dir),
        brand="Brand#9",
        type_prefix="MEDIUM",
        sizes=(1, 5, 9, 14, 19, 23, 36, 45),
    )


@query(
    "q_tpch_q20_derived",
    oracle=f"""
    WITH {_DERIVED_CTES}
    SELECT s.s_name, s.s_address
    FROM supplier2 s, nation n
    WHERE s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_7'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey FROM partsupp2 ps
        WHERE ps.ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
          AND ps.ps_availqty > (
              SELECT 0.5 * CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,6)))
                                AS DOUBLE)
              FROM lineitem l
              WHERE l.l_partkey = ps.ps_partkey
                AND l.l_suppkey = ps.ps_suppkey
                AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
    """,
)
def q_tpch_q20_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion over the derived partsupp ('blue'
    parts, 1996 shipments, NATION_7).  The correlated half-quantity
    subquery becomes one grouped aggregate joined to partsupp
    (queries/tpch_full.py:199)."""
    return tpch_q20(
        _derived_tables(spark, sf_dir),
        color_prefix="blue",
        date_lo="1996-01-01", date_hi="1997-01-01",
        nation="NATION_7",
    )


@query(
    "q_tpch_q21_derived",
    oracle=f"""
    WITH {_DERIVED_CTES}
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier2 s, lineitem2 l1, orders o, nation n
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_receiptdate > l1.l_commitdate
      AND EXISTS (
          SELECT 1 FROM lineitem2 l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem2 l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_receiptdate > l3.l_commitdate)
      AND s.s_nationkey = n.n_nationkey
      AND n.n_name = 'NATION_7'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def q_tpch_q21_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting, over derived commit/
    receipt dates (~half the lines late by construction).  The
    EXISTS / NOT EXISTS pair collapses to ONE per-order aggregate —
    distinct suppliers + distinct late suppliers — joined back to the
    late rows: two lineitem shuffles total vs the literal SQL's three
    self-joins (queries/tpch_full.py:254)."""
    return tpch_q21(_derived_tables(spark, sf_dir), nation="NATION_7")
