"""Table-maintenance & data-quality operators: a declarative expectations
engine (the dbt-test / Great-Expectations rule surface as ONE conditional
aggregation per table), Z-order data-skipping layout, and small-file
compaction for the CoW store.

These extend the reference's implicit data contract — mongraph trusts
Mongoose schema validation plus its own graphability checks
(src/mongraphMongoosePlugin.coffee:10-26, src/extendDocument.coffee:140-151)
— into the batch-warehouse form: run the rules over the whole table in one
scan and report violation counts, instead of validating row-at-a-time on
save.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongraph_spark.sparkutil import read_table


# -- declarative data-quality expectations -------------------------------------------
#
# Rule surface (the dbt-test four: not_null, unique, accepted_values,
# relationships/FK — plus range and cross-column consistency):
#
#   orders:    o_orderdate not null; o_totalprice > 0; o_orderkey unique;
#              o_orderstatus ∈ {O,F,P}; FK o_custkey → customer
#   lineitem:  l_quantity ∈ [1,50]; l_discount ∈ [0,1];
#              l_shipdate ∈ [1992-01-01, 1998-12-31]; FK l_orderkey → orders
#   customer:  c_acctbal ≥ -1000
#
# Execution shape: per table ONE full-scan conditional aggregation (every
# sum(CASE WHEN ...) combines map-side; violations of all that table's rules
# come out of a single pass), then an unpivot of the 1-row aggregate into
# rule rows (driver-sized: |rules| rows).  FK rules are each one anti-join
# reduced to a count — at 100 TB these shuffle on the key (AQE picks
# broadcast when the dim side is small); nothing else shuffles at all.


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over orders / lineitem /
    customer: one row per rule with checked + violation counts and a pass
    flag.  See module comment for the rule table and the one-scan-per-table
    plan shape."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    customer = read_table(spark, sf_dir, "customer")

    def viol(cond):  # count rows violating (cond = the VIOLATION predicate)
        return F.sum(F.when(cond, 1).otherwise(0))

    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        viol(F.col("o_orderdate").isNull()).alias("not_null_orderdate"),
        viol(~(F.col("o_totalprice") > 0)).alias("range_totalprice_pos"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias(
            "unique_orderkey"
        ),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "accepted_orderstatus"
        ),
    )
    li = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        viol(~F.col("l_quantity").between(1, 50)).alias("range_quantity_1_50"),
        viol(~F.col("l_discount").between(0, 1)).alias("range_discount_0_1"),
        viol(
            ~F.col("l_shipdate").between(F.lit("1992-01-01"), F.lit("1998-12-31"))
        ).alias("range_shipdate_1992_1998"),
    )
    cu = customer.agg(
        F.count(F.lit(1)).alias("n"),
        viol(F.col("c_acctbal") < -1000).alias("range_acctbal_floor"),
    )

    def unpivot(agg_df: DataFrame, table: str, rules: list[str]) -> DataFrame:
        pairs = ", ".join(f"'{r}', `{r}`" for r in rules)
        return agg_df.selectExpr(
            f"'{table}' AS table_name",
            "n AS n_checked",
            f"stack({len(rules)}, {pairs}) AS (rule_name, n_violations)",
        )

    # FK rules: anti-join reduced to a count, attached to the fact table's n.
    fk_orders = (
        orders.join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(orders.agg(F.count(F.lit(1)).alias("n_checked")))
        .select(
            F.lit("orders").alias("table_name"),
            "n_checked",
            F.lit("fk_custkey_in_customer").alias("rule_name"),
            "n_violations",
        )
    )
    fk_lineitem = (
        lineitem.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .crossJoin(lineitem.agg(F.count(F.lit(1)).alias("n_checked")))
        .select(
            F.lit("lineitem").alias("table_name"),
            "n_checked",
            F.lit("fk_orderkey_in_orders").alias("rule_name"),
            "n_violations",
        )
    )

    out = (
        unpivot(
            o,
            "orders",
            [
                "not_null_orderdate",
                "range_totalprice_pos",
                "unique_orderkey",
                "accepted_orderstatus",
            ],
        )
        .unionByName(
            unpivot(
                li,
                "lineitem",
                [
                    "range_quantity_1_50",
                    "range_discount_0_1",
                    "range_shipdate_1992_1998",
                ],
            )
        )
        .unionByName(unpivot(cu, "customer", ["range_acctbal_floor"]))
        .unionByName(fk_orders)
        .unionByName(fk_lineitem)
    )
    return out.select(
        "table_name",
        "rule_name",
        F.col("n_checked").cast("bigint").alias("n_checked"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


ORACLE_DQ = """
WITH o AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS not_null_orderdate,
         sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END) AS range_totalprice_pos,
         count(*) - count(DISTINCT o_orderkey) AS unique_orderkey,
         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS accepted_orderstatus
  FROM orders
),
li AS (
  SELECT count(*) AS n,
         sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS range_quantity_1_50,
         sum(CASE WHEN l_discount NOT BETWEEN 0 AND 1 THEN 1 ELSE 0 END) AS range_discount_0_1,
         sum(CASE WHEN l_shipdate NOT BETWEEN DATE '1992-01-01' AND DATE '1998-12-31' THEN 1 ELSE 0 END) AS range_shipdate_1992_1998
  FROM lineitem
),
cu AS (
  SELECT count(*) AS n,
         sum(CASE WHEN c_acctbal < -1000 THEN 1 ELSE 0 END) AS range_acctbal_floor
  FROM customer
),
rows_out AS (
  SELECT 'orders' AS table_name, 'not_null_orderdate' AS rule_name, n, not_null_orderdate AS v FROM o
  UNION ALL SELECT 'orders', 'range_totalprice_pos', n, range_totalprice_pos FROM o
  UNION ALL SELECT 'orders', 'unique_orderkey', n, unique_orderkey FROM o
  UNION ALL SELECT 'orders', 'accepted_orderstatus', n, accepted_orderstatus FROM o
  UNION ALL SELECT 'lineitem', 'range_quantity_1_50', n, range_quantity_1_50 FROM li
  UNION ALL SELECT 'lineitem', 'range_discount_0_1', n, range_discount_0_1 FROM li
  UNION ALL SELECT 'lineitem', 'range_shipdate_1992_1998', n, range_shipdate_1992_1998 FROM li
  UNION ALL SELECT 'customer', 'range_acctbal_floor', n, range_acctbal_floor FROM cu
  UNION ALL SELECT 'orders', 'fk_custkey_in_customer', (SELECT count(*) FROM orders),
    (SELECT count(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
  UNION ALL SELECT 'lineitem', 'fk_orderkey_in_orders', (SELECT count(*) FROM lineitem),
    (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
)
SELECT table_name, rule_name,
       CAST(n AS BIGINT) AS n_checked,
       CAST(v AS BIGINT) AS n_violations,
       v = 0 AS passed
FROM rows_out
"""


QUERIES = {
    "dq_expectations": dq_expectations,
}

ORACLES = {
    "dq_expectations": ORACLE_DQ,
}
