"""TPC-H completion block (q63–q72): the ten query *shapes* from the
TPC-H suite not yet covered by q48–q50/q56–q58/q60–q61, adapted to the
driver fixture where the fixture lacks a column the official query uses
(no partsupp table, no l_commitdate/l_receiptdate/l_shipmode,
no c_phone/p_container — see TESTDATA.md). Every adaptation preserves the
*operator structure* the original exercises — correlated EXISTS,
decorrelated per-group averages, disjunctive multi-predicate joins,
double self-joins, scalar-subquery thresholds — because that structure is
what the engine is being tested on; the predicate constants only select a
deterministic, non-empty slice of the fixture.

Reference parity note: the reference (SAMbA, a Spark-core fork) inherits
this entire surface from stock Spark SQL in-tree (SURVEY.md §2.3); these
queries are the declared-capability proof that our engine's relational
layer matches, each hash-checked against DuckDB running the identical
ANSI SQL.

Money/average parity follows the q48 house rule: quantize to integer
cents (×100 / ×10⁴) BEFORE any SUM, and turn every ratio-vs-average
comparison into an integer cross-multiplication (a > S/n ⟺ a·n > S), so
no float sum order, division, or rounding mode can split the engines.

All scale notes assume the 100 TB layout: lineitem/orders are the big
fact tables (shuffle joins on their keys, AQE-skew-safe), nation/region
and 1-row aggregates are broadcast, top-k goes through
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from samba_spark.queries.declared import QuerySpec
from samba_spark.sources.tables import load_tables


def _cents(c):
    return F.round(c * 100).cast("long")


def _e4(c):
    return F.round(c * 10000).cast("long")


def q63_tpch_q4(spark, sf_dir):
    """Q4: order priority checking. Fixture has no l_commitdate /
    l_receiptdate, so "late" = shipped more than 60 days after the order
    date; the operator under test (correlated EXISTS → left-semi join with
    a non-equi conjunct, then count by priority) is unchanged."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q63_SQL = """
SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q64_tpch_q7(spark, sf_dir):
    """Q7: volume shipping between two nations, by direction and ship year.
    Full shape: lineitem joins supplier-nation on one side and
    orders-customer-nation on the other, keeping only the two (supp, cust)
    nation orderings. Both nation dims broadcast; the big join keys are
    l_orderkey / l_suppkey as in the official plan."""
    t = load_tables(
        spark, sf_dir, ["supplier", "lineitem", "orders", "customer", "nation"]
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_8")
            )
            | (
                (F.col("supp_nation") == "NATION_8")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_e4")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q64_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))::BIGINT
         AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q65_tpch_q8(spark, sf_dir):
    """Q8: national market share. Share of NATION_6 in AMERICA-region
    ECONOMY-part order volume per year. The official query divides the two
    sums; we emit numerator and denominator as exact integer e-4 units (the
    division is presentation, the joins+conditional aggregation are the
    operator under test)."""
    t = load_tables(
        spark,
        sf_dir,
        ["part", "supplier", "lineitem", "orders", "customer", "nation", "region"],
    )
    cust_nr = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    t["region"].where(F.col("r_name") == "AMERICA"),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_n = t["supplier"].join(
        F.broadcast(
            t["nation"].select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    part = t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    vol = _e4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_nr, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_6", vol).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("nation_volume_e4"),
            F.sum(vol).alias("total_volume_e4"),
        )
        .orderBy("o_year")
    )


Q65_SQL = """
SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       SUM(CASE WHEN n2.n_name = 'NATION_6'
                THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                ELSE 0 END)::BIGINT AS nation_volume_e4,
       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))::BIGINT
         AS total_volume_e4
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND o_custkey IN (SELECT c_custkey FROM customer
                    JOIN nation n1 ON c_nationkey = n1.n_nationkey
                    JOIN region ON n1.n_regionkey = r_regionkey
                    WHERE r_name = 'AMERICA')
GROUP BY o_year
ORDER BY o_year
"""


def q66_tpch_q12(spark, sf_dir):
    """Q12: shipping modes and order priority. No l_shipmode / l_receiptdate
    in the fixture: the "mode" becomes a ship-latency bucket (days between
    order and ship date), keeping the CASE-sum-by-priority core that Q12
    exercises."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST")
        .when(delay <= 90, "REGULAR")
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long")
            .alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


Q66_SQL = """
SELECT CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN DATEDIFF('day', o_orderdate, l_shipdate) <= 90 THEN 'REGULAR'
            ELSE 'SLOW' END AS ship_bucket,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS high_line_count,
       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY ship_bucket
ORDER BY ship_bucket
"""


def q67_tpch_q13(spark, sf_dir):
    """Q13: customer order-count distribution. Left outer join that MUST
    preserve zero-order customers, then a second aggregation over the
    per-customer counts. The o_comment NOT LIKE filter becomes an
    o_orderpriority exclusion (same join-side filter position)."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    orders = t["orders"].where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        t["customer"]
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q67_SQL = """
SELECT c_count, COUNT(*)::BIGINT AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q68_tpch_q15(spark, sf_dir):
    """Q15: top supplier. Quarter revenue per supplier (CTE), then keep the
    supplier(s) whose revenue equals the maximum — a scalar subquery over
    an aggregate, decorrelated in Spark as a broadcast 1-row max joined
    back."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem"])
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("total_revenue_e4")
        )
    )
    mx = rev.agg(F.max("total_revenue_e4").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue_e4") == F.col("_mx"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "total_revenue_e4",
        )
        .orderBy("s_suppkey")
    )


Q68_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))::BIGINT
           AS total_revenue_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue_e4
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM revenue)
ORDER BY s_suppkey
"""


def q69_tpch_q17(spark, sf_dir):
    """Q17: small-quantity-order revenue. Correlated per-part average quantity
    threshold, decorrelated into a groupBy + join; the "l_quantity < 0.2 *
    avg(l_quantity)" comparison is cross-multiplied into exact integers
    (5·qty·n < Σqty, all in cents) so no division happens on either engine.
    Brand/size stand in for the missing p_container."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    part = t["part"].where(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") <= 15)
    )
    li = t["lineitem"].select(
        "l_partkey", _cents(F.col("l_quantity")).alias("qty_c"),
        _cents(F.col("l_extendedprice")).alias("price_c"),
    )
    stats = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.sum("qty_c").alias("sum_qty_c"),
        F.count(F.lit(1)).cast("long").alias("n_li"),
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(stats, F.col("l_partkey") == F.col("ap_key"))
        .where(F.lit(5) * F.col("qty_c") * F.col("n_li") < F.col("sum_qty_c"))
        .agg(
            F.sum("price_c").alias("small_order_revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_small"),
        )
    )


Q69_SQL = """
WITH li AS (SELECT l_partkey,
                   CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c
            FROM lineitem),
stats AS (SELECT l_partkey AS ap_key, SUM(qty_c)::BIGINT AS sum_qty_c,
                 COUNT(*)::BIGINT AS n_li
          FROM li GROUP BY l_partkey)
SELECT SUM(price_c)::BIGINT AS small_order_revenue_c,
       COUNT(*)::BIGINT AS n_small
FROM li
JOIN part ON l_partkey = p_partkey
JOIN stats ON l_partkey = ap_key
WHERE p_brand = 'Brand#4' AND p_size <= 15
  AND 5 * qty_c * n_li < sum_qty_c
"""


def q70_tpch_q19(spark, sf_dir):
    """Q19: discounted revenue over three disjunctive brand/size/quantity
    windows — the classic OR-of-conjunctions join predicate that tests the
    optimizer's ability to keep the part join a single pass. p_container /
    l_shipmode clauses become p_size bands."""
    t = load_tables(spark, sf_dir, ["lineitem", "part"])
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.sum(_e4(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_e4"),
            F.count(F.lit(1)).cast("long").alias("n_matched"),
        )
    )


Q70_SQL = """
SELECT SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))::BIGINT
         AS revenue_e4,
       COUNT(*)::BIGINT AS n_matched
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q71_tpch_q21(spark, sf_dir):
    """Q21: suppliers who kept orders waiting. The fixture has no
    commit/receipt dates, so "waiting" = this supplier shipped strictly
    last in a multi-supplier order: EXISTS another supplier's line in the
    same order (semi) AND NOT EXISTS any line shipped later (anti) — the
    same double-correlated-subquery structure as the official query."""
    t = load_tables(spark, sf_dir, ["supplier", "lineitem", "orders"])
    li = (
        t["lineitem"]
        .join(
            t["orders"].where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        li.join(
            l2,
            (F.col("o2") == F.col("l_orderkey"))
            & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("o3") == F.col("l_orderkey"))
            & (F.col("d3") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            F.broadcast(t["supplier"]),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q71_SQL = """
WITH li AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
            WHERE l_orderkey IN
              (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'))
SELECT s_name, COUNT(*)::BIGINT AS numwait
FROM li l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100
"""


def q72_tpch_q22(spark, sf_dir):
    """Q22: global sales opportunity. "Country code" = c_custkey mod 7
    (fixture has no c_phone); keeps the scalar-subquery average threshold
    (cross-multiplied to integers), the NOT EXISTS anti-join against
    orders, and the per-code aggregation of the official query. The
    anti-join is scoped to orders since 1999 — every fixture customer has
    *some* order (an unscoped NOT EXISTS would be vacuously empty), and "no
    recent orders" is the same lapsed-customer semantics."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    cust = t["customer"].select(
        "c_custkey",
        (F.col("c_custkey") % 7).cast("long").alias("cntrycode"),
        _cents(F.col("c_acctbal")).alias("bal_c"),
    ).where(F.col("cntrycode").isin(1, 2, 4))
    avg_src = cust.where(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("_sum_c"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    return (
        cust.join(F.broadcast(avg_src))
        .where(F.col("bal_c") * F.col("_n") > F.col("_sum_c"))
        .join(
            t["orders"].where(
                F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("bal_c").alias("totacctbal_c"),
        )
        .orderBy("cntrycode")
    )


Q72_SQL = """
WITH cust AS (SELECT c_custkey, CAST(c_custkey % 7 AS BIGINT) AS cntrycode,
                     CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
              FROM customer WHERE c_custkey % 7 IN (1, 2, 4)),
thresh AS (SELECT SUM(bal_c)::BIGINT AS sum_c, COUNT(*)::BIGINT AS n
           FROM cust WHERE bal_c > 0)
SELECT cntrycode, COUNT(*)::BIGINT AS numcust, SUM(bal_c)::BIGINT AS totacctbal_c
FROM cust, thresh
WHERE bal_c * n > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
"""


TPCH: dict[str, QuerySpec] = {
    "q63_tpch_q4": QuerySpec(q63_tpch_q4, Q63_SQL),
    "q64_tpch_q7": QuerySpec(q64_tpch_q7, Q64_SQL),
    "q65_tpch_q8": QuerySpec(q65_tpch_q8, Q65_SQL),
    "q66_tpch_q12": QuerySpec(q66_tpch_q12, Q66_SQL),
    "q67_tpch_q13": QuerySpec(q67_tpch_q13, Q67_SQL),
    "q68_tpch_q15": QuerySpec(q68_tpch_q15, Q68_SQL),
    "q69_tpch_q17": QuerySpec(q69_tpch_q17, Q69_SQL),
    "q70_tpch_q19": QuerySpec(q70_tpch_q19, Q70_SQL),
    "q71_tpch_q21": QuerySpec(q71_tpch_q21, Q71_SQL),
    "q72_tpch_q22": QuerySpec(q72_tpch_q22, Q72_SQL),
}
