"""Q1–Q23: the declared relational operator surface, DataFrame-first.

Each function demonstrates one operator family from SURVEY.md §2.3 (the
reference's instrumented RDD surface, br/uff/spark/TransformationType.scala:
3-35, re-expressed as Catalyst-optimized DataFrame plans). Every computed
column is aliased identically in the Spark code and the oracle SQL — the
driver's hash compare sorts columns by name.

Scale notes are inline: broadcasts are explicit where a dimension is
guaranteed small; everything else is left to Catalyst/AQE (which will pick
broadcast vs shuffled-hash vs sort-merge from runtime stats).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from samba_spark.sources.tables import load_tables


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None → rows-only check


def scratch_dir(name: str) -> str:
    """Per-repo gitignored scratch dir (``<repo>/.scaling/<name>``) for
    queries that round-trip through the filesystem (filegroup roots,
    XML/avro sinks, prov stores the oracle re-reads). NOT a fixed
    world-writable /tmp path: on a multi-user host another user could
    pre-create or symlink such a path to poison the oracle input or
    redirect the writes (ADVICE r5)."""
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(root, ".scaling", name)


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_tables(spark, sf_dir, list(names))
    return [tables[n] for n in names]


# --------------------------------------------------------------------------
# Q1 scan / project / count — map + count (reference rdd/RDD.scala:496,1370)
def q1(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("l_returnflag")
    )


Q1_SQL = """
SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# Q2 predicate filter (reference rdd/RDD.scala:522) — pushdown-eligible:
# both conjuncts reach the parquet scan as PushedFilters.
def q2(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.where((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.02))
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


Q2_SQL = """
SELECT l_orderkey, l_linenumber FROM lineitem
WHERE l_quantity > 45 AND l_discount < 0.02
ORDER BY l_orderkey, l_linenumber
"""


# Q3 string functions (SURVEY §2.3 scalar catalog)
def q3(spark, sf_dir):
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.where(F.col("p_type").like("%ECO%") | F.col("p_name").like("b%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("b"),
            F.substring("p_name", 1, 5).alias("pfx"),
        )
        .orderBy("p_partkey")
    )


Q3_SQL = """
SELECT p_partkey, UPPER(p_brand) AS b, SUBSTR(p_name, 1, 5) AS pfx
FROM part WHERE p_type LIKE '%ECO%' OR p_name LIKE 'b%'
ORDER BY p_partkey
"""


# Q4 distinct (reference rdd/RDD.scala:534-555)
def q4(spark, sf_dir):
    (customer,) = _t(spark, sf_dir, "customer")
    return (
        customer.select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


Q4_SQL = """
SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
ORDER BY c_mktsegment, c_nationkey
"""


# Q5 group-by aggregates (reference PairRDDFunctions.scala:306-325
# reduceByKey; ours is partial+final HashAggregate, map-side combine free)
def q5(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q5_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity),2) AS sum_qty,
       ROUND(AVG(l_extendedprice),2) AS avg_price,
       MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
       COUNT(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# Q6 exact count-distinct — expands to two-phase agg under Catalyst
def q6(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("custs"))
        .orderBy("o_orderstatus")
    )


Q6_SQL = """
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS custs
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# Q7 rollup grouping sets (SURVEY §2.3: stock-SQL-only capability)
def q7(spark, sf_dir):
    (customer,) = _t(spark, sf_dir, "customer")
    return (
        customer.rollup("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("c_nationkey").asc_nulls_first(),
        )
    )


Q7_SQL = """
SELECT c_mktsegment, c_nationkey, COUNT(*) AS cnt
FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
"""


# Q8 inner equi-join (reference PairRDDFunctions.scala:545 — cogroup+flatten;
# ours: AQE picks broadcast or shuffled hash from runtime size)
def q8(spark, sf_dir):
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "inner")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "c_custkey")
        .limit(100)
    )


Q8_SQL = """
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey ORDER BY n_orders DESC, c.c_custkey LIMIT 100
"""


# Q9 outer join with join-time predicate (reference
# PairRDDFunctions.scala:557-613)
def q9(spark, sf_dir):
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    cond = (customer.c_custkey == orders.o_custkey) & (
        orders.o_totalprice > 100000
    )
    return (
        customer.join(orders, cond, "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(F.col("c_custkey"), F.col("o_orderkey").asc_nulls_first())
        .limit(500)
    )


Q9_SQL = """
SELECT c.c_custkey, o.o_orderkey
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_totalprice > 100000
ORDER BY c.c_custkey, o.o_orderkey NULLS FIRST LIMIT 500
"""


# Q10 semi + anti join (reference intersection/subtractByKey,
# rdd/RDD.scala:783-819,1179-1211 → left_semi / left_anti, no payload shuffle)
def q10(spark, sf_dir):
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    has_order = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    )
    f_orders = orders.where(F.col("o_orderstatus") == "F")
    return (
        has_order.join(
            f_orders, has_order.c_custkey == f_orders.o_custkey, "left_anti"
        )
        .select("c_custkey")
        .orderBy("c_custkey")
    )


Q10_SQL = """
SELECT c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
ORDER BY c_custkey
"""


# Q11 cross join (reference rdd/RDD.scala:837, CartesianRDD.scala:59-99) —
# tiny dims: broadcast nested loop, no shuffle
def q11(spark, sf_dir):
    region, nation = _t(spark, sf_dir, "region", "nation")
    return (
        region.crossJoin(F.broadcast(nation))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


Q11_SQL = """
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
ORDER BY r.r_name, n.n_name
"""


# Q12 sort + limit = distributed top-k (reference top/takeOrdered,
# rdd/RDD.scala:1608-1631; Catalyst plans TakeOrderedAndProject —
# partition-local top-k then merge, no global sort)
def q12(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


Q12_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
"""


# Q13 set ops (reference rdd/RDD.scala:752,783-819,1179-1211)
def q13(spark, sf_dir):
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("k"))
        .intersect(supplier.select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
    )


Q13_SQL = """
SELECT c_nationkey AS k FROM customer
INTERSECT
SELECT s_nationkey AS k FROM supplier
ORDER BY k
"""


# Q14 ranking window (SURVEY §2.3 window functions; zipWithIndex analogue)
def q14(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


Q14_SQL = """
SELECT * FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3 ORDER BY o_custkey, rn
"""


# Q15 lag/lead window
def q15(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey", "o_orderkey", F.lag("o_orderkey").over(w).alias("prev_ok")
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(1000)
    )


Q15_SQL = """
SELECT o_custkey, o_orderkey,
       LAG(o_orderkey) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey) AS prev_ok
FROM orders ORDER BY o_custkey, o_orderkey LIMIT 1000
"""


# Q16 framed running aggregate. (l_orderkey, l_linenumber) is NOT unique in
# the fixtures, so the window key is made total by pre-aggregating — a
# non-total ORDER BY in a running frame is engine-ambiguous.
def q16(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    per_line = lineitem.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("l_extendedprice").alias("_price")
    )
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_line.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("_price").over(w), 2).alias("run_sum"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )


Q16_SQL = """
WITH per_line AS (
  SELECT l_orderkey, l_linenumber, SUM(l_extendedprice) AS _price
  FROM lineitem GROUP BY l_orderkey, l_linenumber)
SELECT l_orderkey, l_linenumber,
       ROUND(SUM(_price) OVER (
         PARTITION BY l_orderkey ORDER BY l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_sum
FROM per_line ORDER BY l_orderkey, l_linenumber LIMIT 1000
"""


# Q17 date / math / conditional scalars (all whole-stage-codegen expressions)
def q17(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 200000, "big")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("small")
    )
    return (
        orders.select(
            F.year("o_orderdate").cast("long").alias("yr"), bucket.alias("bucket"),
            F.col("o_totalprice"),
        )
        .groupBy("yr", "bucket")
        .agg(
            F.round(F.sum(F.abs(F.col("o_totalprice"))), 2).alias("s"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("yr", "bucket")
    )


Q17_SQL = """
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
       CASE WHEN o_totalprice >= 200000 THEN 'big'
            WHEN o_totalprice >= 50000  THEN 'mid'
            ELSE 'small' END AS bucket,
       ROUND(SUM(ABS(o_totalprice)),2) AS s, COUNT(*) AS cnt
FROM orders GROUP BY 1, 2 ORDER BY yr, bucket
"""


# Q18 array aggregation, dual-form oracle (FIXTURES.md): compared as a
# sorted CSV string (reference groupByKey, PairRDDFunctions.scala:498-522)
def q18(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("o_orderstatus"))).alias(
                "statuses"
            )
        )
        .orderBy("o_custkey")
        .limit(500)
    )


Q18_SQL = """
SELECT o_custkey,
       LIST_AGGREGATE(LIST_SORT(LIST(o_orderstatus)), 'string_agg', ',') AS statuses
FROM orders GROUP BY o_custkey ORDER BY o_custkey LIMIT 500
"""


# Q19 null semantics
def q19(spark, sf_dir):
    (customer,) = _t(spark, sf_dir, "customer")
    return (
        customer.select(
            "c_custkey",
            F.coalesce(
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
            ).alias("seg"),
        )
        .orderBy("c_custkey")
        .limit(500)
    )


Q19_SQL = """
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg
FROM customer ORDER BY c_custkey LIMIT 500
"""


# Q20 scalar subquery — expressed as a broadcast cross join of the 1-row
# aggregate (no driver collect; scales to any orders size)
def q20(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    # ×1.5 keeps the threshold below the fixture's max price, so the
    # subquery gate actually selects rows (×2 proved a 0-row no-op green)
    thr = orders.agg((F.avg("o_totalprice") * 1.5).alias("_thr"))
    return (
        orders.crossJoin(F.broadcast(thr))
        .where(F.col("o_totalprice") > F.col("_thr"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


Q20_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
ORDER BY o_orderkey
"""


# Q21 CTE
def q21(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 150000)
    return (
        big.groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("yr")
    )


Q21_SQL = """
WITH big AS (SELECT * FROM orders WHERE o_totalprice > 150000)
SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, COUNT(*) AS cnt
FROM big GROUP BY 1 ORDER BY yr
"""


# Q22 HAVING
def q22(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("s"),
            F.count(F.lit(1)).alias("_cnt"),
        )
        .where(F.col("_cnt") >= 3)
        .select("o_custkey", "s")
        .orderBy(F.desc("s"), "o_custkey")
        .limit(100)
    )


Q22_SQL = """
SELECT o_custkey, ROUND(SUM(o_totalprice),2) AS s FROM orders
GROUP BY o_custkey HAVING COUNT(*) >= 3 ORDER BY s DESC, o_custkey LIMIT 100
"""


# Q23 multi-join star aggregation (TPC-H Q3-like; the flagship).
# Scale shape: filter customer (selective) → broadcast into orders →
# the orders⋈lineitem join shuffles on orderkey only after both sides are
# date-pruned at the scan (PushedFilters).
def q23(spark, sf_dir):
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cust = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = orders.where(
        F.to_date("o_orderdate") < F.lit("1995-03-15").cast("date")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    items = lineitem.where(
        F.to_date("l_shipdate") > F.lit("1995-03-15").cast("date")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    co = ords.join(
        F.broadcast(cust), ords.o_custkey == cust.c_custkey, "inner"
    ).select("o_orderkey", "o_orderdate")
    return (
        items.join(co, items.l_orderkey == co.o_orderkey, "inner")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q23_SQL = """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)),2) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
  AND CAST(l.l_shipdate  AS DATE) > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""


DECLARED: dict[str, QuerySpec] = {
    "q1_scan_count": QuerySpec(q1, Q1_SQL),
    "q2_filter": QuerySpec(q2, Q2_SQL),
    "q3_string_funcs": QuerySpec(q3, Q3_SQL),
    "q4_distinct": QuerySpec(q4, Q4_SQL),
    "q5_groupby_aggs": QuerySpec(q5, Q5_SQL),
    "q6_count_distinct": QuerySpec(q6, Q6_SQL),
    "q7_rollup": QuerySpec(q7, Q7_SQL),
    "q8_inner_join": QuerySpec(q8, Q8_SQL),
    "q9_outer_join": QuerySpec(q9, Q9_SQL),
    "q10_semi_anti_join": QuerySpec(q10, Q10_SQL),
    "q11_cross_join": QuerySpec(q11, Q11_SQL),
    "q12_topk": QuerySpec(q12, Q12_SQL),
    "q13_set_ops": QuerySpec(q13, Q13_SQL),
    "q14_rank_window": QuerySpec(q14, Q14_SQL),
    "q15_lag_window": QuerySpec(q15, Q15_SQL),
    "q16_running_sum": QuerySpec(q16, Q16_SQL),
    "q17_scalars": QuerySpec(q17, Q17_SQL),
    "q18_array_agg": QuerySpec(q18, Q18_SQL),
    "q19_null_semantics": QuerySpec(q19, Q19_SQL),
    "q20_scalar_subquery": QuerySpec(q20, Q20_SQL),
    "q21_cte": QuerySpec(q21, Q21_SQL),
    "q22_having": QuerySpec(q22, Q22_SQL),
    "q23_star_join": QuerySpec(q23, Q23_SQL),
}
