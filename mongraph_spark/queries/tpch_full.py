"""The rest of the TPC-H suite (q2, q7-q11, q13, q15-q17, q19-q21), adapted
to the driver's reduced schema (SURVEY.md §2.7 relational scope; TESTDATA.md
has no partsupp table and no commit/receipt dates, so the queries that need
them are re-expressed over lineitem-derived facts with the same plan shape).

Strategy notes (the part that matters at 100 TB):
- every dimension (part, supplier, nation, region, per-part/per-supplier
  aggregate tables) is explicitly ``F.broadcast`` — the only shuffles left
  are the fact-fact joins keyed on orderkey and the final aggregations;
- correlated-subquery queries (q2 min-cost supplier, q17 avg-quantity) are
  expressed as aggregate-then-broadcast-join, not per-row subqueries;
- exists/not-exists queries (q21) are collapsed into ONE per-(order,
  supplier) aggregate + a window over the order — no repeated self-joins of
  the fact table;
- scalar-total queries (q11, q15) cross-join a 1-row aggregate (broadcast
  nested loop of 1 row, free at any scale).

Float policy matches relational.py: every double aggregate is rounded in
BOTH engines so sum-order nondeterminism can't flip the driver's hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongraph_spark.sparkutil import read_table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# -- q2: min-value supplier per part (correlated min -> agg + rejoin) -----------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 adapted: no partsupp, so "supplies the part" = shipped it at
    least once (distinct (l_partkey, l_suppkey)), and min supply cost becomes
    min s_acctbal among EUROPE suppliers of the part.  The correlated min is
    one groupBy + a broadcast rejoin."""
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    shipped = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    cand = shipped.join(
        F.broadcast(part), shipped["l_partkey"] == part["p_partkey"]
    ).join(F.broadcast(supp), shipped["l_suppkey"] == supp["s_suppkey"])
    min_bal = cand.groupBy(F.col("p_partkey").alias("mb_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            F.broadcast(min_bal),
            (F.col("p_partkey") == F.col("mb_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


ORACLE_Q2 = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), cand AS (
  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, s.n_name
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sh
  JOIN part p ON sh.l_partkey = p.p_partkey
  JOIN eu_supp s ON sh.l_suppkey = s.s_suppkey
  WHERE p.p_size = 15 AND p.p_type = 'LARGE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM cand c
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# -- q7: volume shipping between a nation pair ----------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    supp = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    cust = read_table(spark, sf_dir, "customer").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("cn_key"),
                                  F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )


ORACLE_Q7 = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


# -- q8: national market share ---------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of NATION_1 suppliers in ECONOMY-part volume sold to AMERICA
    customers, by order year.  The conditional-share division happens after
    ONE aggregation — no second pass over the fact table."""
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust = (
        read_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("c_custkey")
    )
    supp = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    vol = _revenue()
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


ORACLE_Q8 = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


# -- q9: product-type profit by nation and year ----------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 adapted: supply cost (partsupp) replaced by a retail-price
    cost proxy (0.1 * p_retailprice * quantity); same join/agg shape."""
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    nation = read_table(spark, sf_dir, "nation")
    supp = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    li = read_table(spark, sf_dir, "lineitem")
    profit = _revenue() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .groupBy("nation", F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


ORACLE_Q9 = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.1 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# -- q10: returned-item reporting -------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# -- q11: important stock (scalar-subquery threshold) -----------------------------


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 adapted: stock value (partsupp availqty*cost) replaced by
    shipped value sum(l_quantity * l_extendedprice) for NATION_3 suppliers.
    The grand total is a 1-row aggregate cross-joined back (broadcast of one
    row — the scalar-subquery plan at any scale)."""
    nation = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"]
    )
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(supp.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("raw_value")
    )
    total = per_part.agg(F.sum("raw_value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > 0.001 * F.col("total_value"))
        .select("p_partkey", F.round("raw_value", 2).alias("part_value"))
    )


ORACLE_Q11 = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey, sum(l_quantity * l_extendedprice) AS raw_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY 1
)
SELECT p_partkey, round(raw_value, 2) AS part_value
FROM per_part
WHERE raw_value > 0.001 * (SELECT sum(raw_value) FROM per_part)
"""


# -- q13: customer order-count distribution ---------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# -- q15: top supplier (scalar max + rejoin) --------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 2).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = read_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q15 = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# -- q16: supplier count per part group (anti-join exclusion) ---------------------


def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 adapted: partsupp replaced by distinct shipped pairs; the
    complaints exclusion becomes s_acctbal < 0 suppliers, dropped with a
    broadcast anti-join BEFORE the distinct-count shuffle."""
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# -- q17: small-quantity-order revenue (correlated avg -> agg + rejoin) -----------


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = read_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(thresh), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_Q17 = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n_rows
FROM lineitem l
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#11'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


# -- q19: discounted revenue (OR'd predicate sets, all pushed to one scan) --------


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(
        F.round(F.sum(_revenue()), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# -- q20: suppliers with surplus shipments of a part class ------------------------


def q20_surplus_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 adapted: "has excess stock" becomes "shipped > 30 units of
    one red part in 1996".  Nested exists collapses to: per-(supplier, part)
    aggregate -> threshold filter -> distinct suppliers -> semi-join."""
    red_parts = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    big = (
        li.join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    nation = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    supp = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"]
    )
    return (
        supp.join(big, supp["s_suppkey"] == big["l_suppkey"], "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


ORACLE_Q20 = """
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 30
  )
ORDER BY s_name
"""


# -- q21: suppliers who kept orders waiting (exists/not-exists as ONE window) -----


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 adapted (no receipt/commit dates): supplier S "kept order O
    waiting" iff O is multi-supplier, status F, and S's latest shipment is
    the order's latest (ties qualify both — neither has a strictly-later
    peer).  The classic exists + not-exists double self-join collapses to
    one per-(order, supplier) max + one window over the order: two shuffles
    total, no repeated fact self-joins."""
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = read_table(spark, sf_dir, "lineitem")
    per = (
        li.join(orders.select("o_orderkey"), li["l_orderkey"] == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_max"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per.select(
        "l_orderkey",
        "l_suppkey",
        "s_max",
        F.max("s_max").over(w).alias("o_max"),
        F.count(F.lit(1)).over(w).alias("n_supp"),
    ).filter((F.col("n_supp") >= 2) & (F.col("s_max") == F.col("o_max")))
    nation = read_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    supp = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"]
    )
    return (
        flagged.join(F.broadcast(supp), flagged["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


ORACLE_Q21 = """
WITH per AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  GROUP BY 1, 2
), win AS (
  SELECT l_orderkey, l_suppkey, s_max,
         max(s_max) OVER (PARTITION BY l_orderkey) AS o_max,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supp
  FROM per
)
SELECT s_name, count(*) AS numwait
FROM win
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_supp >= 2 AND s_max = o_max AND n_name = 'NATION_7'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_stock": q11_important_stock,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_parts_supplier_count": q16_parts_supplier_count,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q20_surplus_suppliers": q20_surplus_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": ORACLE_Q2,
    "q7_volume_shipping": ORACLE_Q7,
    "q8_market_share": ORACLE_Q8,
    "q9_product_profit": ORACLE_Q9,
    "q10_returned_items": ORACLE_Q10,
    "q11_important_stock": ORACLE_Q11,
    "q13_customer_distribution": ORACLE_Q13,
    "q15_top_supplier": ORACLE_Q15,
    "q16_parts_supplier_count": ORACLE_Q16,
    "q17_small_quantity_revenue": ORACLE_Q17,
    "q19_discounted_revenue": ORACLE_Q19,
    "q20_surplus_suppliers": ORACLE_Q20,
    "q21_waiting_suppliers": ORACLE_Q21,
}
