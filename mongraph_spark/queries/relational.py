"""Relational analytics over the driver tables (SURVEY.md §2.7 extension
scope): TPC-H-style aggregations, joins, window functions, rollup, set ops,
semi/anti joins — all stock DataFrame API, all oracle-checked.

Float policy: every aggregate over doubles is rounded (2dp) in BOTH engines
so sum-order nondeterminism can't flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongraph_spark.sparkutil import const_part, read_table


# -- Q1-style: scan + filter + groupBy aggregate (map-side partial aggs) ------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# -- Q3-style: 3-way join + agg + deterministic top-k -------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15")
    )
    # customer is the small side at every SF -> broadcast
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# -- Q5-style: 5-way join through the star schema ------------------------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # dims broadcast; the big fact join (lineitem x orders) shuffles on orderkey
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


ORACLE_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# -- Q6-style: pure filter + aggregate (pushdown showcase) ----------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# -- window functions: per-customer top-3 orders (deterministic tie-break) ------


def window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


ORACLE_WINDOW = """
SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
"""


# -- window: running revenue per supplier (frame clause) --------------------------


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    # l_extendedprice joins the frame order as the last tie-breaker: the
    # synthetic lineitem does NOT enforce (orderkey, linenumber) uniqueness
    # (sf0.1 carries one (suppkey, shipdate, orderkey, linenumber) tie with
    # different prices), and an ambiguous frame order makes a prefix sum
    # engine-nondeterministic.  Rows still tied after the price key have
    # equal summands, so every order yields the same running values.
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            F.asc("l_shipdate"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
            F.asc("l_extendedprice"),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # integer cents: a float prefix sum is bracketing-sensitive (DuckDB's
    # window agg uses a segment tree, Spark accumulates sequentially — same
    # addends, different parenthesization), and at sf0.1 one of 600k rows
    # landed on a round(.,2) half-boundary and hash-mismatched.  Exact
    # integers are order- and bracketing-free.
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(cents).over(w).cast("long").alias("running_cents"),
    )


ORACLE_RUNNING = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_extendedprice ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
FROM lineitem
"""


# -- rollup (grouping sets) --------------------------------------------------------


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping_id — the full
    grouping-sets lattice (rollup's superset)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().alias("gid"),
        )
    )


ORACLE_CUBE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows,
       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# -- range join: price-band histogram ------------------------------------------------
#
# Spark executes inequality joins as broadcast-nested-loop; with a tiny band
# table the broadcast IS the right plan (each row tests ~10 bands).  When
# BOTH sides are large the scalable shape is bucketize-the-range: assign each
# row floor(value/width) and equi-join on the bucket (+ neighbor buckets for
# straddling ranges) — noted here, exercised in the bucketed graph store.

N_BANDS_PRICE = 10
BAND_WIDTH = 200.0


def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, sf_dir, "part")
    bands = spark.range(N_BANDS_PRICE).select(
        F.col("id").alias("band"),
        (F.col("id") * BAND_WIDTH).alias("lo"),
        ((F.col("id") + 1) * BAND_WIDTH).alias("hi"),
    )
    return (
        part.join(
            F.broadcast(bands),
            (part["p_retailprice"] >= bands["lo"]) & (part["p_retailprice"] < bands["hi"]),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        )
    )


ORACLE_RANGE_JOIN = f"""
SELECT band, count(*) AS n_parts, round(avg(p_retailprice), 2) AS avg_price
FROM part
JOIN (SELECT i AS band, i * {BAND_WIDTH} AS lo, (i + 1) * {BAND_WIDTH} AS hi
      FROM range(0, {N_BANDS_PRICE}) t(i)) b
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


# -- KMV sketch: deterministic distinct-count estimate --------------------------------
#
# HLL/approx_count_distinct is engine-specific; the K-minimum-values sketch
# over md5 is *deterministic* (same hashes, same order statistics in any
# engine), so the sketch itself is oracle-checkable.  Estimator:
# (k-1) / fraction(kth smallest hash).  At scale: the k smallest of a
# distinct-hash set is a tiny shuffle (top-k per partition, then merge).

KMV_K = 256


def sketch_kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    hashes = (
        li.select(F.md5(F.col("l_partkey").cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
    )
    # fraction of hash space below the kth value, from the first 15 hex chars
    frac = F.conv(F.substring(F.max("h"), 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    exact = li.select(F.count_distinct("l_partkey").alias("exact_distinct"))
    # small regime: with fewer than K distinct keys the sketch saw every key,
    # so the pool count IS the exact answer — the (K-1)/h_max estimator only
    # applies once the pool is saturated.
    est = hashes.agg(
        F.when(F.count(F.lit(1)) < KMV_K, F.count(F.lit(1)))
        .otherwise(F.floor(F.lit(KMV_K - 1) / frac))
        .cast("long")
        .alias("kmv_estimate"),
        F.count(F.lit(1)).alias("k_used"),
    )
    return est.crossJoin(exact)


ORACLE_KMV = f"""
WITH hashes AS (
  SELECT DISTINCT md5(CAST(l_partkey AS VARCHAR)) AS h FROM lineitem
  ORDER BY h LIMIT {KMV_K}
),
est AS (
  SELECT CAST(CASE WHEN count(*) < {KMV_K} THEN count(*)
           ELSE floor(({KMV_K} - 1) /
           (CAST(('0x' || substr(max(h), 1, 15)) AS UBIGINT) / {float(16**15)})) END AS BIGINT)
           AS kmv_estimate,
         count(*) AS k_used
  FROM hashes
)
SELECT kmv_estimate, k_used,
       (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_distinct
FROM est
"""


# -- theta-sketch set operations over KMV sketches -----------------------------------


def sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count set algebra on SKETCHES, the way segment-overlap
    questions are answered at 100 TB without ever joining the raw sets:
    build a KMV sketch (k smallest md5 values of the distinct keys) per
    segment — customers ordering in 1996 vs 1997 — then

    - **union estimate**: KMV over the merged minima (k smallest of A ∪ B),
    - **intersection estimate** (theta style): of the union sketch's
      retained minima, the fraction present in BOTH input sketches, scaled
      by the union estimate.

    Everything is md5 order statistics + integer floors, so the sketch
    itself is engine-deterministic and oracle-checkable (same reason
    ``sketch_kmv_distinct_parts`` works).  Each sketch is a per-partition
    top-k then a k-row merge — no shuffle wider than k rows; the exact
    counts alongside are for the evidence row, not part of the method."""
    orders = read_table(spark, sf_dir, "orders")

    def year_keys(year: int):
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{year}-01-01"))
            & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01"))
        ).select(F.col("o_custkey").alias("custkey"))

    def kmv(df):  # k smallest md5 hashes of the distinct keys
        return (
            df.select(F.md5(F.col("custkey").cast("string")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
        )

    a, b = kmv(year_keys(1996)), kmv(year_keys(1997))
    union_pool = a.union(b).distinct().orderBy("h").limit(KMV_K)
    frac = F.conv(F.substring(F.max("h"), 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    # small regime: an unsaturated union pool (total distinct < K) holds
    # every distinct key, so the pool count is exact — estimate only once
    # the pool is full (same rule in the oracle SQL below).
    union_est = union_pool.agg(
        F.when(F.count(F.lit(1)) < KMV_K, F.count(F.lit(1)))
        .otherwise(F.floor(F.lit(KMV_K - 1) / frac))
        .cast("long")
        .alias("union_est"),
        F.count(F.lit(1)).alias("k_used"),
    )
    n_both = (
        union_pool.join(a, "h").join(b, "h").agg(F.count(F.lit(1)).alias("n_both"))
    )
    exact = year_keys(1996).intersect(year_keys(1997)).agg(
        F.count(F.lit(1)).alias("exact_inter")
    )
    exact_union = year_keys(1996).union(year_keys(1997)).distinct().agg(
        F.count(F.lit(1)).alias("exact_union")
    )
    return (
        union_est.crossJoin(n_both)
        .select(
            "union_est",
            "k_used",
            F.floor(F.col("n_both") * F.col("union_est") / F.col("k_used"))
            .cast("long")
            .alias("inter_est"),
        )
        .crossJoin(exact)
        .crossJoin(exact_union)
    )


ORACLE_THETA = f"""
WITH a AS (
  SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders
  WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
  ORDER BY h LIMIT {KMV_K}
),
b AS (
  SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders
  WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
  ORDER BY h LIMIT {KMV_K}
),
union_pool AS (
  SELECT DISTINCT h FROM (SELECT h FROM a UNION ALL SELECT h FROM b)
  ORDER BY h LIMIT {KMV_K}
),
est AS (
  SELECT CAST(CASE WHEN count(*) < {KMV_K} THEN count(*)
           ELSE floor(({KMV_K} - 1) /
           (CAST(('0x' || substr(max(h), 1, 15)) AS UBIGINT) / {float(16**15)})) END AS BIGINT)
           AS union_est,
         count(*) AS k_used
  FROM union_pool
),
both_h AS (
  SELECT count(*) AS n_both FROM union_pool u
  JOIN a ON u.h = a.h JOIN b ON u.h = b.h
)
SELECT union_est, k_used,
       CAST(floor(n_both * union_est / k_used) AS BIGINT) AS inter_est,
       (SELECT count(*) FROM (
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
          INTERSECT
          SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'
       )) AS exact_inter,
       (SELECT count(DISTINCT o_custkey) FROM orders
        WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01') AS exact_union
FROM est CROSS JOIN both_h
"""


# -- HyperLogLog sketch (mergeable registers, trailing-zero rank) --------------------

HLL_M = 64  # registers (p = 6)
HLL_WBITS = 54  # md5 60-bit hash minus 6 register bits
# alpha_64 * m^2 * 100 * 2^54, with the power-of-two multiply exact (exponent
# shift), so ONE float divide + floor remains in each engine's estimate.
HLL_NUM = (0.709 * HLL_M * HLL_M * 100) * float(2**HLL_WBITS)


def sketch_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user sketches, one per event_type plus their
    register-wise MERGE (the 'ALL' row) — the mergeability that makes HLL
    the industry standard for distributed distinct counts: per-partition
    register vectors combine with an elementwise max, so the full pipeline
    is one combiner-friendly aggregation regardless of data volume.

    Engine-deterministic by construction: the hash is the first 15 hex
    chars of md5 (60 bits), the register is the low 6 bits, and the rank
    is the TRAILING-zero count of the remaining 54 bits, computed as
    log2(w & -w) — w & -w isolates the lowest set bit, an exact power of
    two, where log2 is exact in IEEE double in both engines (no libm
    last-ulp exposure, unlike leading-zero/log-floor formulations).  The
    harmonic denominator is kept as an exact INTEGER (sum of 2^(55-rank)),
    so the raw estimate is a single float divide + floor.  The standard
    small-range correction m*ln(m/V) is applied when the raw estimate is
    under 2.5m.  Exact distinct counts ride along as ground truth.

    At 100 TB the sketch build is scan + one 64-row-per-scope aggregate —
    no wide shuffle at all; this op is exactly what replaces
    count(distinct) when the answer may be approximate."""
    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_scope = hll_register_table(ev)
    return hll_finish(per_scope, ev)


def hll_base(ev: DataFrame) -> DataFrame:
    """(event_type, reg, rho) per event — the map-only sketch input.
    Shared by the batch op and the streaming twin."""
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return ev.select(
        "event_type",
        (h % HLL_M).alias("reg"),
        F.floor(h / HLL_M).cast("long").alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(HLL_WBITS + 1)).otherwise(
            (F.log2(F.col("w").bitwiseAND(-F.col("w"))) + 1).cast("long")
        ),
    )


def hll_register_table(ev: DataFrame) -> DataFrame:
    """(scope, reg, r): max-rho registers per event_type — the associative
    aggregate that also runs unchanged as a streaming complete-mode agg."""
    return hll_base(ev).groupBy(F.col("event_type").alias("scope"), "reg").agg(
        F.max("rho").alias("r")
    )


def hll_estimate(
    regs: DataFrame, scope_cols: list[str], lc_limit_x100: int = 250 * HLL_M
) -> DataFrame:
    """(scope..., v_zero, harm_int, raw_x100, est_x100) from a register
    table (scope..., reg, r) — the shared HLL finisher (see
    sketch_hll_mergeable for the exactness contract).  Scope-polymorphic
    so the sliding DAU/WAU twin can estimate per day.

    ``lc_limit_x100``: linear counting applies while the raw estimate is
    at or below this (and zero registers remain).  Default 2.5m — the
    original Flajolet threshold, kept for sketch_hll_mergeable's pinned
    contract; callers sizing for the 2.5m–5m bias region (small m, the
    HLL++ correction range) pass 5m, where linear counting is still the
    better estimator as long as any register is empty."""
    est = regs.groupBy(*scope_cols).agg(
        (F.lit(HLL_M) - F.count(F.lit(1))).cast("long").alias("v_zero"),
        (
            F.sum(F.pow(F.lit(2.0), F.lit(HLL_WBITS + 1) - F.col("r")).cast("long"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(2**(HLL_WBITS + 1))
        ).cast("long").alias("harm_int"),
    )
    raw = F.floor(F.lit(HLL_NUM * 2) / F.col("harm_int")).cast("long")
    corrected = F.when(
        (raw <= F.lit(lc_limit_x100)) & (F.col("v_zero") > 0),
        F.floor(F.lit(100.0 * HLL_M) * F.log(F.lit(float(HLL_M)) / F.col("v_zero"))),
    ).otherwise(raw).cast("long")
    return est.select(
        *scope_cols, "v_zero", "harm_int", raw.alias("raw_x100"),
        corrected.alias("est_x100"),
    )


def hll_finish(per_scope: DataFrame, ev_for_exact: DataFrame) -> DataFrame:
    """Register-wise ALL merge + estimate + exact ride-along (shared by
    the batch op and the streaming twin; see sketch_hll_mergeable)."""
    merged = per_scope.groupBy("reg").agg(F.max("r").alias("r")).select(
        F.lit("ALL").alias("scope"), "reg", "r"
    )
    regs = per_scope.unionByName(merged)
    est = hll_estimate(regs, ["scope"])
    exact = (
        ev_for_exact.groupBy(F.col("event_type").alias("scope"))
        .agg(F.count_distinct("user_id").alias("exact_distinct"))
        .unionByName(
            ev_for_exact.agg(
                F.count_distinct("user_id").alias("exact_distinct")
            ).select(F.lit("ALL").alias("scope"), "exact_distinct")
        )
    )
    return est.join(exact, "scope")


ORACLE_HLL = f"""
WITH base AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
         user_id
  FROM events
), rho_t AS (
  SELECT event_type, h % {HLL_M} AS reg, CAST(floor(h / {HLL_M}) AS BIGINT) AS w,
         user_id
  FROM base
), ranked AS (
  SELECT event_type, reg,
         CASE WHEN w = 0 THEN {HLL_WBITS + 1}
              ELSE CAST(log2(CAST(w & (-w) AS DOUBLE)) + 1 AS BIGINT) END AS rho
  FROM rho_t
), per_scope AS (
  SELECT event_type AS scope, reg, max(rho) AS r FROM ranked GROUP BY 1, 2
), regs AS (
  SELECT * FROM per_scope
  UNION ALL
  SELECT 'ALL' AS scope, reg, max(r) AS r FROM per_scope GROUP BY 2
), est AS (
  SELECT scope,
         CAST({HLL_M} - count(*) AS BIGINT) AS v_zero,
         CAST(sum(CAST(pow(2.0, {HLL_WBITS + 1} - r) AS BIGINT))
              + ({HLL_M} - count(*)) * {2**(HLL_WBITS + 1)} AS BIGINT) AS harm_int
  FROM regs GROUP BY scope
), exact AS (
  SELECT event_type AS scope, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
  UNION ALL
  SELECT 'ALL', count(DISTINCT user_id) FROM events
)
SELECT e.scope, v_zero, harm_int,
       CAST(floor({HLL_NUM * 2!r} / harm_int) AS BIGINT) AS raw_x100,
       CAST(CASE WHEN floor({HLL_NUM * 2!r} / harm_int) <= {250 * HLL_M}
                  AND v_zero > 0
                 THEN floor({100.0 * HLL_M} * ln({float(HLL_M)} / v_zero))
                 ELSE floor({HLL_NUM * 2!r} / harm_int) END AS BIGINT) AS est_x100,
       exact_distinct
FROM est e JOIN exact x ON e.scope = x.scope
"""


# -- mergeable equi-width histogram quantile sketch ----------------------------------

HIST_BINS = 64
HIST_QS = (50, 90, 99)  # percentiles reported


def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram quantile sketch over event values:
    per-event_type 64-bin integer histograms (values snapped to exact
    cents first), merged register-wise into an 'ALL' row by SUMMING bin
    counts — the mergeability that lets percentile dashboards aggregate
    per-partition synopses instead of sorting 100 TB.  Reports the
    histogram's p50/p90/p99 estimate (lower bin edge) NEXT TO the exact
    discrete percentile, so the sketch error is part of the evidence row.

    Engine-deterministic: cents = round(value*100) is a single IEEE
    multiply + half-away round in both engines (exact-.5 cases cannot
    arise: (k+.5)/100 is never binary-representable), and everything
    after — bin = (cents-min)*64 div (range+1), cumulative counts, edge
    arithmetic — is integer.

    Scale shape: the sketch is ONE combiner-friendly (scope, bin)
    aggregation (map-side partials absorb everything; the exchange is
    O(scopes × bins) like the HLL op); the exact percentiles alongside
    cost a per-scope sort at this SF and are precisely what you would NOT
    compute at 100 TB — the sketch row is the product, the exact row is
    the test."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    rng = ev.agg(
        F.min("cents").alias("minc"), F.max("cents").alias("maxc")
    )
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "cents",
        "minc",
        "maxc",
        F.expr(f"(cents - minc) * {HIST_BINS} div (maxc - minc + 1)").alias("bin"),
    )
    per_scope = binned.groupBy(
        F.col("event_type").alias("scope"), "bin", "minc", "maxc"
    ).agg(F.count(F.lit(1)).alias("n"))
    merged = per_scope.groupBy("bin", "minc", "maxc").agg(
        F.sum("n").alias("n")
    ).select(F.lit("ALL").alias("scope"), "bin", "minc", "maxc", "n")
    hist = per_scope.unionByName(merged)
    wcum = Window.partitionBy("scope").orderBy("bin")
    cum = hist.withColumn("cum", F.sum("n").over(wcum)).withColumn(
        "total", F.sum("n").over(Window.partitionBy("scope"))
    )
    est_cols = []
    for q in HIST_QS:
        # smallest bin whose cumulative count reaches ceil(q% of total)
        target = F.ceil(F.col("total") * q / 100)
        est_cols.append(
            F.min(
                F.when(
                    F.col("cum") >= target,
                    F.col("minc")
                    + F.expr(f"bin * (maxc - minc + 1) div {HIST_BINS}"),
                )
            ).alias(f"p{q}_est")
        )
    ests = cum.groupBy("scope").agg(*est_cols)
    # exact discrete percentiles (the at-SF ground truth the sketch is judged by)
    scoped = ev.select(F.col("event_type").alias("scope"), "cents").unionByName(
        ev.select(F.lit("ALL").alias("scope"), "cents")
    )
    wr = Window.partitionBy("scope").orderBy("cents")
    ranked = scoped.withColumn("rn", F.row_number().over(wr)).withColumn(
        "total", F.count(F.lit(1)).over(Window.partitionBy("scope"))
    )
    exact = ranked.groupBy("scope").agg(
        *[
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.col("total") * q / 100), F.col("cents")
                )
            ).alias(f"p{q}_exact")
            for q in HIST_QS
        ]
    )
    return ests.join(exact, "scope")


ORACLE_HISTOGRAM = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), rng AS (
  SELECT min(cents) AS minc, max(cents) AS maxc FROM ev
), binned AS (
  SELECT event_type, cents, minc, maxc,
         (cents - minc) * {HIST_BINS} // (maxc - minc + 1) AS bin
  FROM ev CROSS JOIN rng
), per_scope AS (
  SELECT event_type AS scope, bin, minc, maxc, count(*) AS n
  FROM binned GROUP BY 1, 2, 3, 4
), hist AS (
  SELECT * FROM per_scope
  UNION ALL
  SELECT 'ALL', bin, minc, maxc, sum(n) FROM per_scope GROUP BY 2, 3, 4
), cum AS (
  SELECT scope, bin, minc, maxc, n,
         sum(n) OVER (PARTITION BY scope ORDER BY bin) AS cum,
         sum(n) OVER (PARTITION BY scope) AS total
  FROM hist
), ests AS (
  SELECT scope,
         {", ".join(
             f'''min(CASE WHEN cum >= ceil(total * {q} / 100)
                 THEN minc + bin * (maxc - minc + 1) // {HIST_BINS} END) AS p{q}_est'''
             for q in HIST_QS
         )}
  FROM cum GROUP BY scope
), scoped AS (
  SELECT event_type AS scope, cents FROM ev
  UNION ALL SELECT 'ALL', cents FROM ev
), ranked AS (
  SELECT scope, cents,
         row_number() OVER (PARTITION BY scope ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY scope) AS total
  FROM scoped
), exact AS (
  SELECT scope,
         {", ".join(
             f"min(CASE WHEN rn = ceil(total * {q} / 100) THEN cents END)"
             f" AS p{q}_exact"
             for q in HIST_QS
         )}
  FROM ranked GROUP BY scope
)
SELECT e.scope, {", ".join(f"p{q}_est" for q in HIST_QS)},
       {", ".join(f"p{q}_exact" for q in HIST_QS)}
FROM ests e JOIN exact x ON e.scope = x.scope
"""


# -- DDSketch-class relative-error quantile sketch -----------------------------------
#
# The synopsis sketch_histogram_quantiles can't be: that one is EQUI-WIDTH —
# it needs a min/max pre-pass (a second job over the data) and its error is
# ABSOLUTE (bin width ∝ range, so one outlier order poisons every estimate).
# This is the DDSketch / HdrHistogram family (Masson et al., VLDB 2019):
# log-scaled buckets give a GUARANTEED RELATIVE error, and bucketing needs
# no range information at all — a true one-pass, bucket-wise-mergeable
# sketch, the right synopsis for long-tailed money/latency distributions.
#
# Bucketing is INTEGER-EXACT in both engines (no libm log anywhere): for
# cents ≥ 1, the octave e = length(bin(cents)) − 1 (floor-log2 via the
# binary-string length — exact string arithmetic), and the sub-bucket
# m = (cents·16) div 2^e − 16 ∈ [0,16) splits each octave into 16 linear
# slots (HdrHistogram's bucketing).  Bucket width ratio ≤ 17/16, so the
# lower-edge estimate's relative error is < 1/17 ≈ 588 bp — pinned in
# tests at ≤ 600 bp for every reported quantile.
#
# Scale shape: the sketch is ONE combiner-friendly (e, m) aggregation —
# O(#buckets) ≈ 16·64 rows of state regardless of input volume; per-group
# sub-sketches merge by bucket-wise SUM (both the merged and the directly-
# built global sketch are emitted; the hash check pins them equal).  The
# exact discrete percentile rides along as at-SF ground truth — the row
# you would NOT compute at 100 TB; the sketch row is the product.

DD_PCTS = [50, 90, 99]
DD_SUB = 16  # linear sub-buckets per octave


def dd_binned(df: DataFrame) -> DataFrame:
    """Attach DDSketch bucket coordinates to a frame carrying a ``cents``
    long column (cents ≥ 1): octave ``e`` = floor-log2 via binary-string
    length, sub-bucket ``m`` = (cents·16) div 2^e − 16 ∈ [0, 16).
    Integer-exact in both engines; map-only."""
    return df.withColumn(
        "e", (F.length(F.expr("bin(cents)")) - 1).cast("long")
    ).withColumn(
        "m",
        F.expr(
            f"(cents * {DD_SUB}) div shiftleft(cast(1 as bigint), cast(e as int)) - {DD_SUB}"
        ),
    )


def dd_targets(n_row: DataFrame) -> DataFrame:
    """Per-percentile rank targets (ceil(p·n/100)) from a 1-row count frame
    with column ``n``; broadcast-sized (|DD_PCTS| rows)."""
    spark = n_row.sparkSession
    return (
        spark.range(1)
        .crossJoin(F.broadcast(n_row))
        .select(
            F.explode(F.array(*[F.lit(p) for p in DD_PCTS])).alias("p"),
            F.col("n"),
        )
        .select("p", F.expr("(p * n + 99) div 100").alias("target"))
    )


def dd_estimate(sketch: DataFrame, targets: DataFrame, out: str) -> DataFrame:
    """Lower-edge quantile estimates from an (e, m, c) bucket table: total
    cumulative order over (e, m) — a const-part window over O(#buckets)
    rows, never over the data — then the first bucket whose cumulative
    count reaches each rank target decodes back to its lower edge."""
    cum = sketch.withColumn(
        "cum",
        F.sum("c").over(
            Window.partitionBy(const_part(F.col("e"))).orderBy("e", "m")
        ),
    )
    return (
        cum.crossJoin(F.broadcast(targets))
        .filter(F.col("cum") >= F.col("target"))
        .groupBy("p")
        .agg(F.min(F.col("e") * DD_SUB + F.col("m")).alias("bid"))
        .select(
            "p",
            F.expr(
                f"(({DD_SUB} + bid % {DD_SUB})"
                f" * shiftleft(cast(1 as bigint), cast(bid div {DD_SUB} as int)))"
                f" div {DD_SUB}"
            ).alias(out),
        )
    )


def dd_exact(o: DataFrame, targets: DataFrame) -> DataFrame:
    """Exact discrete percentiles (the at-SF ground-truth row you would NOT
    compute at 100 TB) from a ``cents`` frame."""
    wr = Window.partitionBy(const_part(F.col("cents"))).orderBy("cents")
    return (
        o.withColumn("rn", F.row_number().over(wr))
        .join(F.broadcast(targets), F.col("rn") == F.col("target"))
        .select("p", F.col("cents").alias("exact_cents"))
    )


def sketch_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderpriority").alias("prio"),
    )
    binned = dd_binned(o).select("prio", "cents", "e", "m")
    # per-group sub-sketches → bucket-wise-summed merge; direct global build
    sub = binned.groupBy("prio", "e", "m").agg(F.count(F.lit(1)).alias("c"))
    merged = sub.groupBy("e", "m").agg(F.sum("c").alias("c"))
    direct = binned.groupBy("e", "m").agg(F.count(F.lit(1)).alias("c"))
    targets = dd_targets(o.agg(F.count(F.lit(1)).alias("n")))
    est_m = dd_estimate(merged, targets, "est_merged_cents")
    est_d = dd_estimate(direct, targets, "est_cents")
    exact = dd_exact(o, targets)
    n_buckets = direct.agg(F.count(F.lit(1)).alias("n_buckets"))
    return (
        est_d.join(est_m, "p")
        .join(exact, "p")
        .crossJoin(F.broadcast(n_buckets))
        .select(
            F.col("p").cast("long").alias("p"),
            "est_cents",
            "est_merged_cents",
            "exact_cents",
            F.expr("(10000 * (exact_cents - est_cents)) div exact_cents").alias(
                "rel_err_bp"
            ),
            "n_buckets",
        )
    )


ORACLE_DDSKETCH = f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderpriority AS prio
  FROM orders
), binned AS (
  SELECT prio, cents, e,
         (cents * {DD_SUB}) // (1::BIGINT << CAST(e AS INTEGER)) - {DD_SUB} AS m
  FROM (SELECT prio, cents, CAST(length(bin(cents)) - 1 AS BIGINT) AS e FROM o)
), sub AS (
  SELECT prio, e, m, CAST(count(*) AS BIGINT) AS c FROM binned GROUP BY 1, 2, 3
), merged AS (
  SELECT e, m, CAST(sum(c) AS BIGINT) AS c FROM sub GROUP BY 1, 2
), direct AS (
  SELECT e, m, CAST(count(*) AS BIGINT) AS c FROM binned GROUP BY 1, 2
), targets AS (
  SELECT p, (p * n + 99) // 100 AS target
  FROM (VALUES {", ".join(f"({p})" for p in DD_PCTS)}) t(p)
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM o)
), est_d AS (
  SELECT p,
         (({DD_SUB} + bid % {DD_SUB}) * (1::BIGINT << CAST(bid // {DD_SUB} AS INTEGER))) // {DD_SUB} AS est_cents
  FROM (
    SELECT t.p, min(s.e * {DD_SUB} + s.m) AS bid
    FROM (SELECT e, m, sum(c) OVER (ORDER BY e, m) AS cum FROM direct) s
    CROSS JOIN targets t
    WHERE s.cum >= t.target
    GROUP BY t.p
  )
), est_m AS (
  SELECT p,
         (({DD_SUB} + bid % {DD_SUB}) * (1::BIGINT << CAST(bid // {DD_SUB} AS INTEGER))) // {DD_SUB} AS est_merged_cents
  FROM (
    SELECT t.p, min(s.e * {DD_SUB} + s.m) AS bid
    FROM (SELECT e, m, sum(c) OVER (ORDER BY e, m) AS cum FROM merged) s
    CROSS JOIN targets t
    WHERE s.cum >= t.target
    GROUP BY t.p
  )
), exact AS (
  SELECT t.p, r.cents AS exact_cents
  FROM (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM o) r
  JOIN targets t ON r.rn = t.target
), nb AS (
  SELECT CAST(count(*) AS BIGINT) AS n_buckets FROM direct
)
SELECT CAST(d.p AS BIGINT) AS p, d.est_cents, m.est_merged_cents, x.exact_cents,
       (10000 * (x.exact_cents - d.est_cents)) // x.exact_cents AS rel_err_bp,
       nb.n_buckets
FROM est_d d JOIN est_m m ON d.p = m.p JOIN exact x ON d.p = x.p
CROSS JOIN nb
"""


# -- interval-overlap join (key-partitioned range join) ------------------------------


def interval_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of orders by the SAME customer
    whose 30-day activity windows [orderdate, orderdate+30d) overlap —
    the temporal-join primitive behind session stitching, concurrent-
    treatment detection, and validity-interval reconciliation.

    Scale shape: the join is EQUI-keyed on the customer and only the range
    predicate is non-equi, so Spark executes a shuffled hash join on
    custkey with the overlap filter on top — candidate pairs are bounded
    by per-customer order counts (bounded fanout), never a cartesian.  For
    KEYLESS interval joins, bucket each interval into the coarse time
    chunks it spans (explode bounded by interval_len/chunk) and equi-join
    on the chunk before the exact overlap filter — same plan family as
    ``events_asof_attribution``.  Output: per customer, the pair count and
    the total overlapped days (integer datediff arithmetic, hash-exact)."""
    orders = read_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("end"),
    )
    a = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("key_a"),
        F.col("start").alias("start_a"),
        F.col("end").alias("end_a"),
    )
    b = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("key_b"),
        F.col("start").alias("start_b"),
        F.col("end").alias("end_b"),
    )
    pairs = a.join(b, "o_custkey").filter(
        (F.col("key_a") < F.col("key_b"))
        & (F.col("start_a") < F.col("end_b"))
        & (F.col("start_b") < F.col("end_a"))
    )
    overlap_days = F.datediff(
        F.least("end_a", "end_b"), F.greatest("start_a", "start_b")
    )
    return (
        pairs.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_overlapping_pairs"),
            F.sum(overlap_days).cast("long").alias("total_overlap_days"),
        )
    )


ORACLE_INTERVAL_OVERLAP = """
SELECT o_custkey AS custkey, count(*) AS n_overlapping_pairs,
       CAST(sum(date_diff('day',
                greatest(a.start_d, b.start_d),
                least(a.end_d, b.end_d))) AS BIGINT) AS total_overlap_days
FROM (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS start_d,
             CAST(o_orderdate AS DATE) + 30 AS end_d FROM orders) a
JOIN (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS start_d,
             CAST(o_orderdate AS DATE) + 30 AS end_d FROM orders) b
  USING (o_custkey)
WHERE a.o_orderkey < b.o_orderkey
  AND a.start_d < b.end_d AND b.start_d < a.end_d
GROUP BY o_custkey
"""


# -- entity resolution: blocked pairwise record linkage ------------------------------


def er_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage candidate generation + match scoring with BLOCKING —
    the only shape entity resolution survives at scale: never all-pairs,
    only pairs within a blocking key (here the product noun, the last word
    of ``p_name``), then exact edit-distance scoring inside each block.

    Scale shape: one shuffle keyed on the block, a within-block self-join
    whose fan-out is bounded by block size, and a map-side-combined rollup.
    The block key is COMPOSITE (brand × noun): the noun alone gives ~8
    blocks of thousands of items — quadratic pair volume, the classic ER
    hot-block trap that ``skew_profile``'s weight classes detect — while
    the composite key bounds blocks to ~100 items (measured 22.6 s → ~1 s
    at sf0.1 for identical join/score machinery).  ``levenshtein`` is a
    JVM builtin in Spark and a native function in DuckDB — same DP
    definition, hash-identical counts.  Output: per block, items,
    candidate pairs, and pairs matching at edit distance ≤ 4."""
    part = read_table(spark, sf_dir, "part")
    blocked = part.select(
        F.concat_ws(
            "|", "p_brand", F.element_at(F.split("p_name", " "), -1)
        ).alias("block_key"),
        F.col("p_partkey").alias("key"),
        F.col("p_name").alias("name"),
    )
    a = blocked.select(
        "block_key", F.col("key").alias("key_a"), F.col("name").alias("name_a")
    )
    b = blocked.select(
        "block_key", F.col("key").alias("key_b"), F.col("name").alias("name_b")
    )
    pairs = a.join(b, "block_key").filter(F.col("key_a") < F.col("key_b"))
    block_sizes = blocked.groupBy("block_key").agg(F.count(F.lit(1)).alias("n_items"))
    pair_stats = (
        pairs.withColumn(
            "is_match", (F.levenshtein("name_a", "name_b") <= 4).cast("long")
        )
        .groupBy("block_key")
        .agg(
            F.count(F.lit(1)).alias("n_pairs_checked"),
            F.sum("is_match").alias("n_matches"),
        )
    )
    return block_sizes.join(pair_stats, "block_key").select(
        "block_key", "n_items", "n_pairs_checked", "n_matches"
    )


ORACLE_ER_BLOCKED = """
WITH blocked AS (
  SELECT p_partkey, p_name,
         p_brand || '|' || string_split(p_name, ' ')[-1] AS block_key
  FROM part
),
sizes AS (SELECT block_key, count(*) AS n_items FROM blocked GROUP BY block_key),
pair_stats AS (
  SELECT a.block_key,
         count(*) AS n_pairs_checked,
         CAST(sum(CASE WHEN levenshtein(a.p_name, b.p_name) <= 4 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_matches
  FROM blocked a JOIN blocked b
    ON a.block_key = b.block_key AND a.p_partkey < b.p_partkey
  GROUP BY a.block_key
)
SELECT block_key, n_items, n_pairs_checked, n_matches
FROM sizes JOIN pair_stats USING (block_key)
"""


def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage (1969) on the SAME
    blocked candidate pairs as :func:`er_blocked_pairs` — the scoring leg
    that turns candidate generation into match DECISIONS: each pair's
    agreement pattern γ over comparison fields (p_type, p_size,
    retail-price band) gets a likelihood-ratio weight LR(γ) = Π_i m_i/u_i over
    agreeing fields × (1−m_i)/(1−u_i) over disagreeing ones, and
    thresholds on LR partition patterns into match / possible / non-match
    (the Splink/Dedupe.io production shape).

    Parameter estimation without EM, fully deterministic: u-probabilities
    from ALL blocked pairs (the classical "random pair" approximation,
    restricted to blocks exactly as production linkers do), m-probabilities
    from the labeled-match subset (edit-distance ≤ 4 on p_name — the same
    rule er_blocked_pairs reports), both add-one smoothed so no term is
    ever 0/0.  Exactness: each per-field probability is floored ONCE to a
    ppm grid (the documented estimator — raw count products overflow any
    fixed precision once the pair count passes ~10⁶, which sf0.1 already
    does), clamped ≥ 1 ppm; the 3-field likelihood product is then exact
    integer arithmetic on grid values (≤ 10¹⁸) with one final bp floor —
    no logs, no floats, hash-identical across engines at ANY table size.

    Scale shape: the blocked self-join (bounded fan-out, composite key)
    feeds ONE map-side-combined aggregation producing both the 8-row
    pattern table and the 1-row global m/u counts; everything after runs
    on ≤ 8 rows with a broadcast of the 1-row stats."""
    part = read_table(spark, sf_dir, "part")
    blocked = part.select(
        F.concat_ws(
            "|", "p_brand", F.element_at(F.split("p_name", " "), -1)
        ).alias("block_key"),
        F.col("p_partkey").alias("key"),
        F.col("p_name").alias("name"),
        F.col("p_type").alias("ptype"),
        F.col("p_size").alias("psize"),
        # third comparator: retail-price band (100-currency-unit bins of
        # exact cents; prices are positive so trunc == floor)
        F.expr("cast(round(p_retailprice * 100) as bigint) div 10000").alias(
            "pcont"
        ),
    )
    a = blocked.select(
        "block_key",
        *[F.col(c).alias(f"{c}_a") for c in ("key", "name", "ptype", "psize", "pcont")],
    )
    b = blocked.select(
        "block_key",
        *[F.col(c).alias(f"{c}_b") for c in ("key", "name", "ptype", "psize", "pcont")],
    )
    flags = (
        a.join(b, "block_key")
        .filter(F.col("key_a") < F.col("key_b"))
        .select(
            (F.col("ptype_a") == F.col("ptype_b")).cast("long").alias("g_type"),
            (F.col("psize_a") == F.col("psize_b")).cast("long").alias("g_size"),
            (F.col("pcont_a") == F.col("pcont_b")).cast("long").alias("g_cont"),
            (F.levenshtein("name_a", "name_b") <= 4).cast("long").alias("lab"),
        )
    )
    pat = flags.groupBy("g_type", "g_size", "g_cont").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("lab").cast("long").alias("n_labeled_matches"),
    )
    glob = flags.agg(
        F.count(F.lit(1)).cast("long").alias("u_n"),
        F.sum("lab").cast("long").alias("m_n"),
        *[
            x
            for f in ("type", "size", "cont")
            for x in (
                F.sum(f"g_{f}").cast("long").alias(f"u_{f}"),
                F.sum(F.col(f"g_{f}") * F.col("lab")).cast("long").alias(f"m_{f}"),
            )
        ],
    )
    # per-field add-one-smoothed probabilities on the ppm grid, clamped
    # >= 1 ppm so no denominator term is ever 0; products of three 10^6-
    # bounded values stay under 10^18 (BIGINT), and only the final *10^4
    # rides a DECIMAL(38)
    num_terms, den_terms = [], []
    for f in ("type", "size", "cont"):
        num_terms.append(
            f"greatest(case when g_{f} = 1"
            f" then (1000000 * (m_{f} + 1)) div (m_n + 2)"
            f" else (1000000 * (m_n - m_{f} + 1)) div (m_n + 2) end, 1)"
        )
        den_terms.append(
            f"greatest(case when g_{f} = 1"
            f" then (1000000 * (u_{f} + 1)) div (u_n + 2)"
            f" else (1000000 * (u_n - u_{f} + 1)) div (u_n + 2) end, 1)"
        )
    num = " * ".join(num_terms)
    den = " * ".join(den_terms)
    return (
        pat.crossJoin(F.broadcast(glob))
        .withColumn(
            "weight_bp",
            F.expr(
                f"cast((10000 * cast({num} as decimal(38,0)))"
                f" div cast({den} as decimal(38,0)) as bigint)"
            ),
        )
        .select(
            "g_type",
            "g_size",
            "g_cont",
            "n_pairs",
            "n_labeled_matches",
            "weight_bp",
            F.when(F.col("weight_bp") >= 20000, "match")
            .when(F.col("weight_bp") <= 5000, "non_match")
            .otherwise("possible")
            .alias("fs_class"),
        )
    )


def _oracle_fellegi_sunter() -> str:
    num_terms, den_terms = [], []
    for f in ("type", "size", "cont"):
        num_terms.append(
            f"greatest(CASE WHEN g_{f} = 1"
            f" THEN (1000000 * (m_{f} + 1)) // (m_n + 2)"
            f" ELSE (1000000 * (m_n - m_{f} + 1)) // (m_n + 2) END, 1)"
        )
        den_terms.append(
            f"greatest(CASE WHEN g_{f} = 1"
            f" THEN (1000000 * (u_{f} + 1)) // (u_n + 2)"
            f" ELSE (1000000 * (u_n - u_{f} + 1)) // (u_n + 2) END, 1)"
        )
    num = "CAST(" + " * ".join(num_terms) + " AS HUGEINT)"
    den = "CAST(" + " * ".join(den_terms) + " AS HUGEINT)"
    return f"""
WITH blocked AS (
  SELECT p_partkey, p_name, p_type, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) // 10000 AS pband,
         p_brand || '|' || string_split(p_name, ' ')[-1] AS block_key
  FROM part
),
flags AS (
  SELECT CAST(a.p_type = b.p_type AS BIGINT) AS g_type,
         CAST(a.p_size = b.p_size AS BIGINT) AS g_size,
         CAST(a.pband = b.pband AS BIGINT) AS g_cont,
         CAST(levenshtein(a.p_name, b.p_name) <= 4 AS BIGINT) AS lab
  FROM blocked a JOIN blocked b
    ON a.block_key = b.block_key AND a.p_partkey < b.p_partkey
),
pat AS (
  SELECT g_type, g_size, g_cont,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(lab) AS BIGINT) AS n_labeled_matches
  FROM flags GROUP BY 1, 2, 3
),
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS u_n, CAST(sum(lab) AS BIGINT) AS m_n,
         CAST(sum(g_type) AS BIGINT) AS u_type,
         CAST(sum(g_type * lab) AS BIGINT) AS m_type,
         CAST(sum(g_size) AS BIGINT) AS u_size,
         CAST(sum(g_size * lab) AS BIGINT) AS m_size,
         CAST(sum(g_cont) AS BIGINT) AS u_cont,
         CAST(sum(g_cont * lab) AS BIGINT) AS m_cont
  FROM flags
)
SELECT g_type, g_size, g_cont, n_pairs, n_labeled_matches,
       CAST((10000 * ({num})) // ({den}) AS BIGINT) AS weight_bp,
       CASE WHEN CAST((10000 * ({num})) // ({den}) AS BIGINT) >= 20000 THEN 'match'
            WHEN CAST((10000 * ({num})) // ({den}) AS BIGINT) <= 5000 THEN 'non_match'
            ELSE 'possible' END AS fs_class
FROM pat CROSS JOIN gstats
"""


ORACLE_FELLEGI_SUNTER = _oracle_fellegi_sunter()


# -- set operations ------------------------------------------------------------------


def setop_active_building_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers in BUILDING who placed a 1997 order;
    EXCEPT removes those who also placed a 1995 order."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    in_1997 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    ).select(F.col("o_custkey").alias("custkey"))
    in_1995 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    ).select(F.col("o_custkey").alias("custkey"))
    return building.intersect(in_1997).exceptAll(in_1995.distinct())


ORACLE_SETOP = """
SELECT custkey FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
)
EXCEPT
SELECT DISTINCT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
"""


# -- semi / anti joins (EXISTS / NOT EXISTS) --------------------------------------------


def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_ANTI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def semi_parts_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        part.join(li, part["p_partkey"] == li["l_partkey"], "left_semi")
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


ORACLE_SEMI = """
SELECT p_type, count(*) AS n_parts
FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_type
"""


# -- correlated-scalar pattern: orders above their customer's average price ----------


def above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    avg_per_cust = orders.groupBy("o_custkey").agg(
        F.avg("o_totalprice").alias("cust_avg")
    )
    return (
        orders.join(avg_per_cust, on="o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg") * 1.5)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


ORACLE_ABOVE_AVG = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM orders o
JOIN (SELECT o_custkey AS k, avg(o_totalprice) AS cust_avg
      FROM orders GROUP BY o_custkey) a ON o.o_custkey = a.k
WHERE o.o_totalprice > a.cust_avg * 1.5
"""


# -- Q4-style: EXISTS correlated semi-join + count by priority -----------------
#
# (adapted: the slim schema has no l_commitdate/l_receiptdate, so "late" is
# shipdate > orderdate + 60 days)


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    late = li.join(
        orders,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (li["l_shipdate"] > F.date_add(orders["o_orderdate"], 60)),
        "left_semi",
    ).select("l_orderkey").distinct()
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# -- Q12-style: join + conditional (CASE) aggregation --------------------------


def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l_linestatus
"""


# -- Q14-style: promo revenue ratio (conditional agg over a join) --------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_Q14 = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l_shipdate >= '1995-09-01' AND l_shipdate < '1995-10-01'
"""


# -- Q18-style: groupBy-HAVING (large orders) joined back to dims --------------

Q18_QTY = 250


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_QTY)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), F.col("o_custkey") == customer["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


ORACLE_Q18 = f"""
SELECT c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, round(total_qty, 2) AS total_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {Q18_QTY}) b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# -- Q22-style: scalar subquery threshold + NOT EXISTS anti-join ---------------
#
# (adapted: no phone column; "inactive wealthy" = above the positive-balance
# average with no URGENT order)


def q22_wealthy_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    avg_bal = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("v"))
        .select("v")
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("v"))
        .join(urgent, customer["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


ORACLE_Q22 = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


# -- exact distribution statistics (percentiles, correlation) -------------------


def stats_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per priority class.
    ``F.percentile`` is the exact (sort-based) aggregate — the right call
    when the group count is small and bounded; for percentile-of-everything
    at 100 TB you'd switch to ``percentile_approx`` (t-digest, mergeable
    partial state, no global sort)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 2).alias("p95"),
        F.count(F.lit(1)).alias("n_orders"),
    )


ORACLE_PERCENTILES = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


def stats_price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + dispersion of price vs quantity per return
    flag — single-pass mergeable moment aggregates (map-side combine), the
    cheapest possible distributed shape."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.avg("l_extendedprice"), 2).alias("price_avg"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_CORR = """
SELECT l_returnflag,
       round(corr(l_extendedprice, l_quantity), 4) AS price_qty_corr,
       round(stddev_samp(l_extendedprice), 2) AS price_stddev,
       round(avg(l_extendedprice), 2) AS price_avg,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


# -- merged evidence rows: grouping-sets lattice + distribution stats -------------
#
# The driver's correctness gate reads a bounded number of queries() entries;
# these tagged unions carry the ROLLUP+CUBE and percentile+moment evidence in
# one row each (the standalone forms stay registered for the extended gate).


def rollup_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (revenue) and CUBE (quantity, with grouping_id) over
    (l_returnflag, l_linestatus) as one tagged union.  Both lattices come
    from the same single scan; each is one partial-aggregatable shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    rolled = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.lit("rollup").alias("form"),
            "l_returnflag",
            "l_linestatus",
            "revenue",
            F.lit(None).cast("double").alias("sum_qty"),
            "n_rows",
            F.lit(None).cast("long").alias("gid"),
        )
    )
    cubed = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().alias("gid"),
        )
        .select(
            F.lit("cube").alias("form"),
            "l_returnflag",
            "l_linestatus",
            F.lit(None).cast("double").alias("revenue"),
            "sum_qty",
            "n_rows",
            F.col("gid").cast("long"),
        )
    )
    return rolled.unionByName(cubed)


ORACLE_ROLLUP_CUBE = """
SELECT 'rollup' AS form, l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(NULL AS DOUBLE) AS sum_qty,
       count(*) AS n_rows,
       CAST(NULL AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube', l_returnflag, l_linestatus,
       CAST(NULL AS DOUBLE),
       round(sum(l_quantity), 2),
       count(*),
       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT)
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def stats_percentiles_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per order priority + Pearson/moment stats per
    return flag, one tagged union.  The moment aggregates are single-pass
    mergeable; the exact percentile sorts within small bounded groups (the
    100 TB form swaps in percentile_approx's t-digest)."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pct = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.95)), 2).alias("p95"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        F.lit("pct_by_priority").alias("form"),
        "grp",
        "p50",
        "p95",
        F.lit(None).cast("double").alias("price_qty_corr"),
        F.lit(None).cast("double").alias("price_stddev"),
        F.lit(None).cast("double").alias("price_avg"),
        "n_rows",
    )
    mom = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.avg("l_extendedprice"), 2).alias("price_avg"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        F.lit("corr_by_flag").alias("form"),
        "grp",
        F.lit(None).cast("double").alias("p50"),
        F.lit(None).cast("double").alias("p95"),
        "price_qty_corr",
        "price_stddev",
        "price_avg",
        "n_rows",
    )
    return pct.unionByName(mom)


ORACLE_PCT_CORR = """
SELECT 'pct_by_priority' AS form, o_orderpriority AS grp,
       round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
       round(quantile_cont(o_totalprice, 0.95), 2) AS p95,
       CAST(NULL AS DOUBLE) AS price_qty_corr,
       CAST(NULL AS DOUBLE) AS price_stddev,
       CAST(NULL AS DOUBLE) AS price_avg,
       count(*) AS n_rows
FROM orders
GROUP BY o_orderpriority
UNION ALL
SELECT 'corr_by_flag', l_returnflag,
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       round(corr(l_extendedprice, l_quantity), 4),
       round(stddev_samp(l_extendedprice), 2),
       round(avg(l_extendedprice), 2),
       count(*)
FROM lineitem
GROUP BY l_returnflag
"""


# -- SCD2 dimension build: gaps-and-islands over order priority -------------------


def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: collapse each customer's
    order-priority sequence into validity intervals — the warehouse-standard
    gaps-and-islands pattern.  Island id = difference of two row_numbers
    (one over the customer, one over customer+priority), both ordered by
    (o_orderdate, o_orderkey) so ties are deterministic; one groupBy per
    island then a lead() for valid_to.  At scale this is two window passes
    and one aggregation, all keyed on the customer — a single shuffle
    partitioning reused across all three (Spark plans one Exchange).
    Dates are emitted as strings so both engines hash identically."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("d")
    )
    w_all = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    w_grp = Window.partitionBy("o_custkey", "o_orderpriority").orderBy("d", "o_orderkey")
    islands = orders.withColumn(
        "island", F.row_number().over(w_all) - F.row_number().over(w_grp)
    )
    per_island = islands.groupBy("o_custkey", "o_orderpriority", "island").agg(
        F.min("d").alias("vf"),
        F.min("o_orderkey").alias("first_key"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w_hist = Window.partitionBy("o_custkey").orderBy("vf", "first_key")
    return per_island.select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("vf").cast("string").alias("valid_from"),
        F.lead("vf").over(w_hist).cast("string").alias("valid_to"),
        "n_orders",
    )


# the gaps-and-islands history build, shared verbatim by every SCD2 oracle
# (one pinned SQL implementation, mirroring scd2_priority_history being the
# one pinned Spark implementation)
_SCD2_ISLANDS_SQL = """
  SELECT o_custkey, o_orderpriority AS priority, island,
         min(d) AS vf, min(o_orderkey) AS first_key, count(*) AS n_orders
  FROM (
    SELECT o_custkey, o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE) AS d,
           row_number() OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
         - row_number() OVER (PARTITION BY o_custkey, o_orderpriority
                              ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS island
    FROM orders
  )
  GROUP BY 1, 2, 3
"""

ORACLE_SCD2 = f"""
SELECT o_custkey, priority,
       CAST(vf AS VARCHAR) AS valid_from,
       CAST(lead(vf) OVER (PARTITION BY o_custkey ORDER BY vf, first_key) AS VARCHAR)
         AS valid_to,
       n_orders
FROM ({_SCD2_ISLANDS_SQL})
"""


def scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) join against the SCD2 dimension: every
    lineitem is attributed to the customer's priority version VALID AT SHIP
    TIME — the warehouse query SCD2 tables exist for, and the one that
    silently corrupts metrics when someone joins the current version
    instead.

    Scale shape: facts pick up the custkey via the orders join (orderkey-
    keyed shuffle), then join the history EQUI-keyed on custkey with the
    interval predicate on top (per-customer version counts bound the
    fan-out, same posture as ``interval_overlap_orders``); an in-history
    row matches exactly one version because SCD2 intervals partition the
    timeline from the first valid_from onward.  Facts shipping BEFORE the
    customer's first version (this generator draws ship dates independent
    of order dates) have no version and drop — the pinned invariant in
    tests/test_round4_plans.py.  Revenue in integer cents."""
    hist = scd2_priority_history(spark, sf_dir).select(
        "o_custkey",
        "priority",
        F.to_date("valid_from").alias("vf"),
        F.to_date("valid_to").alias("vt"),  # null = current version
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.to_date("l_shipdate").alias("ship_d"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("rev_cents"),
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    facts = li.join(orders, "l_orderkey")
    pit = facts.join(hist, "o_custkey").filter(
        (F.col("ship_d") >= F.col("vf"))
        & (F.col("vt").isNull() | (F.col("ship_d") < F.col("vt")))
    )
    return pit.groupBy(F.col("priority").alias("priority_at_ship")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("rev_cents").alias("revenue_cents"),
    )


ORACLE_SCD2_PIT = f"""
WITH hist AS (
  SELECT o_custkey, priority, vf,
         lead(vf) OVER (PARTITION BY o_custkey ORDER BY vf, first_key) AS vt
  FROM ({_SCD2_ISLANDS_SQL})
)
SELECT h.priority AS priority_at_ship,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN hist h ON h.o_custkey = o.o_custkey
           AND CAST(l.l_shipdate AS DATE) >= h.vf
           AND (h.vt IS NULL OR CAST(l.l_shipdate AS DATE) < h.vt)
GROUP BY 1
"""


# -- decile distribution: ntile over per-customer spend ----------------------------


def window_customer_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-spend decile table (the reporting cut of a skewed revenue
    distribution): aggregate to one row per customer first, then ntile(10)
    over the reduced set.  The global ntile window IS single-partition by
    construction — correct here because its input is already one row per
    customer (the reduction did the distributed work); at 100 TB with
    billions of customers the same report uses pre-computed percentile
    boundaries + a broadcast range join instead of a total order."""
    orders = read_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    w = Window.partitionBy(const_part(F.col("o_custkey"))).orderBy(
        F.desc("spend"), F.asc("o_custkey")
    )
    # explicit round() before the long cast: Spark's double→long cast
    # truncates while DuckDB's rounds, so the cast must never see x.99…
    cents = F.round(F.col("spend") * 100).cast("long")
    return (
        spend.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(cents).alias("decile_spend_cents"),
            F.min(cents).alias("min_spend_cents"),
            F.max(cents).alias("max_spend_cents"),
        )
    )


def window_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis of part revenue — the inventory-management
    classic (class A: parts covering the first 70% of cumulative revenue,
    B: to 90%, C: the tail), the named report behind "20% of SKUs are 80%
    of revenue".  Classification is a cumulative-share window over the
    one-row-per-part REDUCTION (the deciles argument: the global window's
    input is already reduced; at 100 TB swap for percentile boundaries +
    a broadcast range join).  Class thresholds are integer
    cross-multiplications on exact cents (10·cum ≤ 7·total, ≤ 9·total);
    ties broken (revenue DESC, partkey ASC) so the boundary part is
    deterministic in both engines.  Output: per class, member count,
    revenue, exact floored share/cumulative-share bp."""
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents")
    )
    w = Window.partitionBy(const_part(F.col("partkey"))).orderBy(
        F.desc("cents"), F.asc("partkey")
    )
    classed = (
        per_part.withColumn("cum", F.sum("cents").over(w))
        .crossJoin(
            F.broadcast(per_part.agg(F.sum("cents").alias("total")))
        )
        .withColumn(
            "abc_class",
            F.when(10 * F.col("cum") <= 7 * F.col("total"), "A")
            .when(10 * F.col("cum") <= 9 * F.col("total"), "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("class_cents"),
            F.min("total").cast("long").alias("total_cents"),
        )
        .select(
            "abc_class",
            "n_parts",
            "class_cents",
            F.expr("(10000 * class_cents) div total_cents")
            .cast("long")
            .alias("share_bp"),
        )
    )


ORACLE_ABC = """
WITH per_part AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY l_partkey
),
classed AS (
  SELECT cents,
         CASE WHEN 10 * cum <= 7 * total THEN 'A'
              WHEN 10 * cum <= 9 * total THEN 'B'
              ELSE 'C' END AS abc_class
  FROM (
    SELECT cents,
           sum(cents) OVER (ORDER BY cents DESC, partkey ASC
                            ROWS UNBOUNDED PRECEDING) AS cum,
           sum(cents) OVER () AS total
    FROM per_part
  )
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(cents) AS BIGINT) AS class_cents,
       CAST((10000 * sum(cents)) // (SELECT sum(cents) FROM per_part) AS BIGINT)
         AS share_bp
FROM classed GROUP BY abc_class
"""


ORACLE_DECILES = """
SELECT decile, count(*) AS n_customers,
       CAST(sum(cents) AS BIGINT) AS decile_spend_cents,
       CAST(min(cents) AS BIGINT) AS min_spend_cents,
       CAST(max(cents) AS BIGINT) AS max_spend_cents
FROM (
  SELECT ntile(10) OVER (ORDER BY spend DESC, o_custkey ASC) AS decile,
         CAST(round(spend * 100) AS BIGINT) AS cents, o_custkey
  FROM (
    SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey
  )
)
GROUP BY decile
"""


# -- salted join, oracle-checked: placement-only rewrite of a fact⋈dim join --------


def salted_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority through ``sparkutil.adaptive_salted_join``:
    the fact-side key histogram is profiled first, and salting (8 salt
    shards + 8× dim replication) is bought only when the hottest key
    dominates the mean by ≥4× — on TPC-H's near-uniform order keys the gate
    picks the plain join and skips the replication premium (in-session A/B
    at sf0.1: plain 0.91 s, always-salted-8 1.69 s, always-salted-16
    2.61 s).  The oracle is the PLAIN join — salting is pure placement, so
    the result is row-identical whichever path the histogram picks, which
    is the property that lets this wrapper be dropped into any equi-join.
    Revenue is summed in exact integer cents so shard order can't perturb
    the hash."""
    from mongraph_spark.sparkutil import adaptive_salted_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("rev_cents"),
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined, _used_salting = adaptive_salted_join(li, orders, "l_orderkey", n_salts=8)
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("rev_cents").alias("revenue_cents"),
    )


ORACLE_SALTED = """
SELECT o_orderpriority AS priority,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# -- range-frame window: rolling 7-day revenue per customer -----------------------


def window_rolling_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer rolling 7-day order revenue via a RANGE window frame
    (``rangeBetween(-6, 0)`` over the integer day ordinal) — the frame is
    VALUE-bounded, so same-day orders share one frame and calendar gaps
    shrink it; a ROWS frame can express neither.  One customer-keyed
    shuffle + per-partition sort, like any window; cents keep the rolling
    sums integer-exact."""
    orders = read_table(spark, sf_dir, "orders")
    day_ord = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day_ord")
        .rangeBetween(-6, Window.currentRow)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            day_ord.alias("day_ord"),
            cents.alias("cents"),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "day_ord",
            F.sum("cents").over(w).alias("rolling_7d_cents"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_orders_7d"),
        )
    )


ORACLE_ROLLING_7DAY = """
SELECT o_orderkey, o_custkey, day_ord,
       CAST(sum(cents) OVER w AS BIGINT) AS rolling_7d_cents,
       CAST(count(*) OVER w AS BIGINT) AS n_orders_7d
FROM (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS day_ord,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day_ord
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# -- unpivot (melt): wide measure columns to long rows ----------------------------

UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt lineitem's four measure columns into (measure, value) rows via
    ``stack`` — the Spark unpivot — then profile each measure (n, integer-
    cents sum, extremes).  Unpivot is a map-only row expansion (4× rows,
    same bytes); the aggregation keys on 4 measure names, so the partial
    aggs collapse everything map-side and the shuffle moves 4 rows per
    input partition regardless of scale."""
    li = read_table(spark, sf_dir, "lineitem")
    stack_expr = "stack({n}, {args}) as (measure, value)".format(
        n=len(UNPIVOT_MEASURES),
        args=", ".join(f"'{c}', {c}" for c in UNPIVOT_MEASURES),
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        li.selectExpr(stack_expr)
        .groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        )
    )


ORACLE_UNPIVOT = """
WITH long_form AS (
  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
)
SELECT measure, count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM long_form
GROUP BY measure
"""


# -- table profiling (data-quality summary, Deequ/SUMMARIZE-style) ----------------

_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_render(agg: F.Column, kind: str) -> F.Column:
    """Render an already-aggregated min/max engine-portably: numerics
    through DECIMAL(18,2) (both engines print '123.45'; raw double→string
    differs), others as plain string casts.  The cast happens AFTER the
    aggregate — casting first and min/max-ing the strings gives
    lexicographic extremes for numerics ('99993.10' > '100279.40')."""
    return agg.cast("decimal(18,2)").cast("string") if kind == "num" else agg.cast("string")


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile of the orders table — per column: null count, exact
    distinct count, min and max — the data-quality summary every ingest
    pipeline runs before training (Deequ profiles / DuckDB SUMMARIZE).

    ONE aggregation over one scan: multiple exact count(distinct)s compile
    to a single Expand + two-phase aggregate (rows × n_cols map-side, each
    partial collapsing to one row per distinct value before the shuffle).
    At 100 TB swap the exact distincts for ``approx_count_distinct`` — same
    plan minus the Expand blowup; exact is kept here because the oracle
    hash-compares values.  The 1-row × 4·n_cols aggregate is then unpivoted
    driver-free with ``stack`` (6-row input, trivial)."""
    orders = read_table(spark, sf_dir, "orders")
    aggs = []
    for col, kind in _PROFILE_COLS:
        c = F.col(col)
        aggs += [
            F.sum(c.isNull().cast("long")).alias(f"{col}__nulls"),
            F.count_distinct(c).alias(f"{col}__distinct"),
            _profile_render(F.min(c), kind).alias(f"{col}__min"),
            _profile_render(F.max(c), kind).alias(f"{col}__max"),
        ]
    one = orders.agg(*aggs)
    stack_expr = "stack({n}, {args}) as (column_name, n_nulls, n_distinct, min_val, max_val)".format(
        n=len(_PROFILE_COLS),
        args=", ".join(
            f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
            for c, _ in _PROFILE_COLS
        ),
    )
    return one.selectExpr(stack_expr)


ORACLE_PROFILE = "\nUNION ALL ".join(
    """SELECT '{c}' AS column_name,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {min_expr} AS min_val, {max_expr} AS max_val FROM orders""".format(
        c=c,
        min_expr=(
            f"CAST(CAST(min({c}) AS DECIMAL(18,2)) AS VARCHAR)"
            if kind == "num"
            else f"CAST(min({c}) AS VARCHAR)"
        ),
        max_expr=(
            f"CAST(CAST(max({c}) AS DECIMAL(18,2)) AS VARCHAR)"
            if kind == "num"
            else f"CAST(max({c}) AS VARCHAR)"
        ),
    )
    for c, kind in _PROFILE_COLS
)


# -- join-key skew profiler (shuffle-planning diagnostic) --------------------------


def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-weight histogram for the three hottest join keys in the schema —
    the diagnostic that decides salting/broadcast strategy before a big
    join: per key column, bucket every key by ⌊log2(row_count)⌋ and report
    how many keys and rows live in each weight class (a heavy-tail class
    with few keys and many rows = salt or skew-hint those keys).

    Scale shape: each profile is one map-side-combined groupBy on the key,
    then a MAP-ONLY log2 bucketing of the per-key counts — deliberately NOT
    an ntile/global-sort decile split, which would funnel every distinct
    key through one reducer at billion-key scale.  log2 boundaries are
    FP-safe for the hash compare: counts are exact longs and log2 of a
    power of two is exact in IEEE double in both engines."""

    def classes(df: DataFrame, key: str, label: str) -> DataFrame:
        counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
        return counts.groupBy(
            F.lit(label).alias("key_name"),
            F.floor(F.log2("n_rows")).cast("long").alias("weight_class"),
        ).agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_rows").alias("sum_rows"),
            F.max("n_rows").alias("max_rows"),
        )

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    ev = read_table(spark, sf_dir, "events")
    return (
        classes(li, "l_partkey", "lineitem.l_partkey")
        .unionByName(classes(orders, "o_custkey", "orders.o_custkey"))
        .unionByName(classes(ev, "user_id", "events.user_id"))
    )


ORACLE_SKEW_PROFILE = """
WITH k1 AS (SELECT count(*) AS n_rows FROM lineitem GROUP BY l_partkey),
     k2 AS (SELECT count(*) AS n_rows FROM orders GROUP BY o_custkey),
     k3 AS (SELECT count(*) AS n_rows FROM events GROUP BY user_id)
SELECT 'lineitem.l_partkey' AS key_name,
       CAST(floor(log2(n_rows)) AS BIGINT) AS weight_class,
       count(*) AS n_keys, CAST(sum(n_rows) AS BIGINT) AS sum_rows,
       CAST(max(n_rows) AS BIGINT) AS max_rows
FROM k1 GROUP BY 2
UNION ALL
SELECT 'orders.o_custkey', CAST(floor(log2(n_rows)) AS BIGINT),
       count(*), CAST(sum(n_rows) AS BIGINT), CAST(max(n_rows) AS BIGINT)
FROM k2 GROUP BY 2
UNION ALL
SELECT 'events.user_id', CAST(floor(log2(n_rows)) AS BIGINT),
       count(*), CAST(sum(n_rows) AS BIGINT), CAST(max(n_rows) AS BIGINT)
FROM k3 GROUP BY 2
"""


# -- bitemporal AS-KNOWN-AT: valid time x transaction time -------------------------

BITEMPORAL_ASOF = "1997-06-01"


def scd2_bitemporal_asknown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal snapshot comparison: order priorities carry BOTH a valid
    date (o_orderdate) and a transaction date (when the record was
    *recorded*), and late corrections (every 7th order re-recorded 30 days
    after the fact with a downgraded priority) must only be visible to
    queries whose AS-KNOWN-AT is past the correction's record date.  Output:
    per-priority order counts under the ``as_known`` view (corrections
    recorded after {asof} invisible — last record per order wins among the
    visible ones) vs the ``latest`` view (all corrections applied), the
    audit/replay primitive warehouses need when history itself is revised.

    Scale shape: the correction overlay is a union of two projections of
    the SAME scan (no join — corrections are derived columns here; a real
    corrections feed would be a key-equi union), and visibility resolution
    is one per-order max_by over recorded_d — combiner-friendly, one
    order-keyed shuffle, then a tiny per-priority rollup.  The SCD2
    interval build (:func:`scd2_priority_history`) composes on top of
    either resolved snapshot unchanged — same helper, different input."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("d")
    )
    base = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("d").alias("recorded_d"),
    )
    corrections = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("5-LOW").alias("priority"),
        F.date_add("d", 30).alias("recorded_d"),
    )
    records = base.unionByName(corrections)

    def resolved(view, visible):
        # last visible record per order: max_by over recorded_d with the
        # correction flag as tie-break (a correction recorded the same day
        # supersedes the base row — deterministic, oracle-mirrored)
        return (
            visible.groupBy("o_orderkey")
            .agg(
                F.max_by(
                    "priority", F.struct(F.col("recorded_d"), F.col("priority"))
                ).alias("priority")
            )
            .groupBy("priority")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .select(F.lit(view).alias("view"), "priority", "n_orders")
        )

    as_known = resolved(
        "as_known", records.filter(F.col("recorded_d") <= F.lit(BITEMPORAL_ASOF))
    )
    latest = resolved("latest", records)
    return as_known.unionByName(latest)


ORACLE_BITEMPORAL = f"""
WITH records AS (
  SELECT o_orderkey, o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS recorded_d
  FROM orders
  UNION ALL
  SELECT o_orderkey, '5-LOW', CAST(o_orderdate AS DATE) + INTERVAL 30 DAY
  FROM orders WHERE o_orderkey % 7 = 0
),
asv AS (
  -- ISO date string + priority concat == Spark's struct(recorded_d, priority)
  -- lexicographic max (fixed-width date segment keeps the order identical)
  SELECT 'as_known' AS view, priority, count(*) AS n_orders FROM (
    SELECT o_orderkey,
           arg_max(priority, strftime(recorded_d, '%Y-%m-%d') || '|' || priority) AS priority
    FROM records WHERE recorded_d <= DATE '{BITEMPORAL_ASOF}' GROUP BY o_orderkey
  ) GROUP BY 2
),
latestv AS (
  SELECT 'latest' AS view, priority, count(*) AS n_orders FROM (
    SELECT o_orderkey,
           arg_max(priority, strftime(recorded_d, '%Y-%m-%d') || '|' || priority) AS priority
    FROM records GROUP BY o_orderkey
  ) GROUP BY 2
)
SELECT * FROM asv UNION ALL SELECT * FROM latestv
"""


# -- mergeable KMV synopses: daily build, weekly rollup -------------------------------

KMV_ROLLUP_K = 256


def sketch_kmv_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE half of the KMV sketch story (:func:`sketch_kmv_distinct_parts`
    covers the estimator): per-day K-minimum-values synopses of distinct
    event users, merged into WEEKLY distinct estimates by pooling the
    daily minima and re-taking the K smallest — correct because any of
    the week's K global minima is necessarily among its own day's K
    minima.  This is how warehouses answer "distinct users any week,
    any rollup" without re-scanning events: build synopses once at the
    finest grain, merge upward for free.

    Shape: one shuffle to build daily pools (day-keyed row_number over
    distinct hashes), one K·|days|-row shuffle to merge weekly — the
    second pass touches SYNOPSES, not events.  The exact comparison join
    is the evidence column, not part of the production shape."""
    ev = read_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    hashed = (
        ev.select(day, F.md5(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    wd = Window.partitionBy("day").orderBy("h")
    daily = (
        hashed.withColumn("rk", F.row_number().over(wd))
        .filter(F.col("rk") <= KMV_ROLLUP_K)
        .select("day", "h")
    )
    week = F.date_trunc("week", F.col("day")).alias("week")
    ww = Window.partitionBy("week").orderBy("h")
    merged = (
        daily.select(week, "h")
        .distinct()
        .withColumn("rk", F.row_number().over(ww))
        .filter(F.col("rk") <= KMV_ROLLUP_K)
    )
    frac = F.conv(F.substring(F.max("h"), 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    est = merged.groupBy("week").agg(
        F.count(F.lit(1)).alias("k_used"),
        F.when(F.count(F.lit(1)) < KMV_ROLLUP_K, F.count(F.lit(1)))
        .otherwise(F.floor(F.lit(KMV_ROLLUP_K - 1) / frac))
        .cast("long")
        .alias("kmv_estimate"),
    )
    exact = ev.groupBy(F.date_trunc("week", F.col("ts")).alias("week")).agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "week")


ORACLE_KMV_ROLLUP = f"""
WITH hashed AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events
),
daily AS (
  SELECT day, h FROM (
    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rk FROM hashed
  ) WHERE rk <= {KMV_ROLLUP_K}
),
merged AS (
  SELECT week, h FROM (
    SELECT week, h, row_number() OVER (PARTITION BY week ORDER BY h) AS rk
    FROM (SELECT DISTINCT date_trunc('week', day) AS week, h FROM daily)
  ) WHERE rk <= {KMV_ROLLUP_K}
),
est AS (
  SELECT week, count(*) AS k_used,
         CAST(CASE WHEN count(*) < {KMV_ROLLUP_K} THEN count(*)
              ELSE floor(({KMV_ROLLUP_K} - 1) /
                (CAST(('0x' || substr(max(h), 1, 15)) AS UBIGINT) / {float(16**15)}))
              END AS BIGINT) AS kmv_estimate
  FROM merged GROUP BY week
)
SELECT e.week, e.k_used, e.kmv_estimate, x.exact_distinct
FROM est e JOIN (
  SELECT date_trunc('week', ts) AS week, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
) x ON e.week = x.week
"""


# -- Poisson-bootstrap confidence intervals -------------------------------------------

BOOT_B = 32  # bootstrap replicas
# Poisson(1) inverse-CDF thresholds (fixed 5-decimal constants so both
# engines branch identically); tail collapsed at 4+
_POIS_CDF = [0.36788, 0.73576, 0.91970, 0.98101, 0.99634]


def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard error of the per-priority mean order value by the POISSON
    BOOTSTRAP — the bootstrap that actually distributes: classical
    resampling needs N draws from the full dataset per replica (a global
    operation), but Binomial(N, 1/N) → Poisson(1), so each ROW draws its
    own per-replica weight independently — map-only, streaming-friendly,
    embarrassingly parallel (the Google "bag of little bootstraps" family's
    workhorse).

    Determinism: the replica weight is Poisson(1) by inverse-CDF over an
    md5-derived uniform per (row, replica) — fixed decimal thresholds, no
    rng state, stable under repartitioning (same lineage argument as the
    pipeline sampling ops).  Plan: explode ×B (map-side), ONE shuffle to
    (group, replica) means, a tiny second agg over B replica means per
    group.  Point estimate and the replica-spread SE are floored to cents
    ×100 — double summation-order slack ~1e-10 sits far below the grid."""
    orders = read_table(spark, sf_dir, "orders")
    # one md5 yields FOUR independent 8-hex uniforms (32 hex chars), so hash
    # on the block-exploded frame (B/4 blocks) and fan each digest out to 4
    # replica lanes — 4x less hashing than md5-per-(row, replica), same
    # distribution, same determinism (the oracle mirrors the block split)
    blocks = orders.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B // 4 - 1))).alias("blk"),
    ).withColumn(
        "h", F.md5(F.concat_ws(":", F.col("o_orderkey"), F.col("blk")))
    )
    rep = blocks.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        "h",
        "blk",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("lane"),
    ).withColumn("b", F.col("blk") * 4 + F.col("lane"))
    u = (
        F.conv(F.expr("substring(h, lane * 8 + 1, 8)"), 16, 10).cast("long")
        / F.lit(float(1 << 32))
    )
    w = F.lit(len(_POIS_CDF))
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < _POIS_CDF[k], F.lit(k)).otherwise(w)
    per_rep = (
        rep.withColumn("w", w)
        .groupBy("o_orderpriority", "b")
        .agg(
            (F.sum(F.col("w") * F.col("o_totalprice")) / F.sum("w")).alias("mean_b")
        )
    )
    return per_rep.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_replicas"),
        F.floor(100 * F.avg("mean_b")).cast("long").alias("boot_mean_c"),
        F.floor(100 * F.stddev_samp("mean_b")).cast("long").alias("boot_se_c"),
    )


def _bootstrap_oracle() -> str:
    branches = "".join(
        f"WHEN u < {_POIS_CDF[k]} THEN {k} "
        for k in range(len(_POIS_CDF))
    )
    return f"""
WITH blocks AS (
  SELECT o_orderpriority, o_totalprice, blk,
         md5(CAST(o_orderkey AS VARCHAR) || ':' || CAST(blk AS VARCHAR)) AS h
  FROM orders, (SELECT unnest(range({BOOT_B // 4})) AS blk)
),
rep AS (
  SELECT o_orderpriority, o_totalprice,
         ('0x' || substr(h, lane * 8 + 1, 8))::BIGINT / {float(1 << 32)} AS u,
         blk * 4 + lane AS b
  FROM blocks, (SELECT unnest(range(4)) AS lane)
),
weighted AS (
  SELECT o_orderpriority, b, o_totalprice,
         CASE {branches}ELSE {len(_POIS_CDF)} END AS w
  FROM rep
),
per_rep AS (
  SELECT o_orderpriority, b, sum(w * o_totalprice) / sum(w) AS mean_b
  FROM weighted GROUP BY o_orderpriority, b
)
SELECT o_orderpriority, count(*) AS n_replicas,
       CAST(floor(100 * avg(mean_b)) AS BIGINT) AS boot_mean_c,
       CAST(floor(100 * stddev_samp(mean_b)) AS BIGINT) AS boot_se_c
FROM per_rep GROUP BY o_orderpriority
"""


ORACLE_BOOTSTRAP = _bootstrap_oracle()


# -- robust outlier detection: median / MAD -------------------------------------------

MAD_CONSISTENCY = 1.4826  # normal-consistency constant
MAD_CUTOFF = 3.5  # Iglewicz-Hoaglin modified-z threshold


def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection by median absolute deviation —
    the screening rule that survives the very outliers it hunts (mean/σ
    z-scores are dragged by the tail they're meant to flag; the
    median/MAD modified z-score |x−med| > 3.5·1.4826·MAD is the
    Iglewicz-Hoaglin recommendation).

    Two exact-percentile aggregations keyed on the group (median, then
    median of residuals — the second NEEDS the first, so two passes is
    the true data dependency, not a plan artifact), each a broadcast
    1-row-per-group rejoin; the flag count is a conditional agg on the
    second pass.  At 100 TB swap ``percentile`` for ``approx_percentile``
    per the module's percentile policy and keep the shape."""
    orders = read_table(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("med")
    )
    resid = orders.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("r"),
    )
    mad = resid.groupBy("o_orderpriority").agg(
        F.percentile("r", F.lit(0.5)).alias("mad")
    )
    return (
        resid.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.first("med"), 2).alias("median_price"),
            F.round(F.first("mad"), 2).alias("mad_price"),
            F.sum(
                (
                    F.col("r")
                    > F.lit(MAD_CUTOFF) * F.lit(MAD_CONSISTENCY) * F.col("mad")
                ).cast("long")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


ORACLE_MAD = f"""
WITH med AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders GROUP BY o_orderpriority
),
resid AS (
  SELECT o.o_orderpriority, m.med, abs(o.o_totalprice - m.med) AS r
  FROM orders o JOIN med m USING (o_orderpriority)
),
mad AS (
  SELECT o_orderpriority, quantile_cont(r, 0.5) AS mad
  FROM resid GROUP BY o_orderpriority
)
SELECT r.o_orderpriority, count(*) AS n_orders,
       round(any_value(r.med), 2) AS median_price,
       round(any_value(d.mad), 2) AS mad_price,
       CAST(sum(CASE WHEN r.r > {MAD_CUTOFF} * {MAD_CONSISTENCY} * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM resid r JOIN mad d USING (o_orderpriority)
GROUP BY r.o_orderpriority
"""


# -- RFM customer segmentation ----------------------------------------------------

RFM_QS = (0.2, 0.4, 0.6, 0.8)  # quintile edges


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic marketing/cohort partition of a
    customer base: score every customer 1-5 on Recency (days since last
    order), Frequency (order count), and Monetary (lifetime spend), then
    profile each of the up-to-125 R·F·M segments.  Scores come from
    ``percentile_disc`` quintile edges, whose smallest-value-with-
    cum_dist>=p tie rule both engines implement identically — no float
    interpolation anywhere (monetary is exact integer cents).

    Scale shape: one groupBy over orders (map-side combine) reduces the
    fact table to one row per customer; the quintile edges are ONE tiny
    aggregate over that per-customer table, broadcast back as a 1-row
    cross join, so scoring is map-only and the final segment rollup has a
    ≤125-key space.  ``percentile_disc`` is a sort-based aggregate over
    the per-customer table — at 100 TB (hundreds of millions of
    customers) swap it for ``approx_percentile`` with the same scoring
    expression, or compute edges on a salted sample; the fact-table scan
    shape is unchanged either way."""
    orders = read_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
            "m_cents"
        ),
    )
    edge_aggs = [
        F.expr(
            f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})"
        ).alias(f"{col}_q{i}")
        for col in ("r_days", "freq", "m_cents")
        for i, q in enumerate(RFM_QS, start=1)
    ]
    ref = cust.agg(F.max("last_day").alias("ref_day"))
    scored = cust.crossJoin(F.broadcast(ref)).withColumn(
        "r_days", F.datediff("ref_day", "last_day").cast("bigint")
    )
    edges = scored.agg(*edge_aggs)

    def score(col: str) -> F.Column:
        expr = F.lit(1)
        for i in range(1, len(RFM_QS) + 1):
            expr = expr + F.when(F.col(col) > F.col(f"{col}_q{i}"), 1).otherwise(0)
        return expr

    return (
        scored.crossJoin(F.broadcast(edges))
        .select(
            (
                score("r_days") * 100 + score("freq") * 10 + score("m_cents")
            ).cast("bigint").alias("segment"),
            "m_cents",
            "freq",
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("m_cents").alias("sum_m_cents"),
            F.sum("freq").alias("sum_orders"),
        )
    )


def _rfm_oracle() -> str:
    edge_cols = ",\n         ".join(
        f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col}) AS {col}_q{i}"
        for col in ("r_days", "freq", "m_cents")
        for i, q in enumerate(RFM_QS, start=1)
    )

    def score(col: str) -> str:
        terms = " + ".join(
            f"(CASE WHEN {col} > {col}_q{i} THEN 1 ELSE 0 END)"
            for i in range(1, len(RFM_QS) + 1)
        )
        return f"(1 + {terms})"

    return f"""
WITH cust AS (
  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_day,
         count(*) AS freq,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS m_cents
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT c.*, CAST(date_diff('day', last_day,
                   (SELECT max(last_day) FROM cust)) AS BIGINT) AS r_days
  FROM cust c
),
edges AS (
  SELECT {edge_cols}
  FROM scored
)
SELECT CAST({score('r_days')} * 100 + {score('freq')} * 10
            + {score('m_cents')} AS BIGINT) AS segment,
       count(*) AS n_customers,
       CAST(sum(m_cents) AS BIGINT) AS sum_m_cents,
       CAST(sum(freq) AS BIGINT) AS sum_orders
FROM scored, edges
GROUP BY 1
"""


ORACLE_RFM = _rfm_oracle()


# -- chi-square test of independence ----------------------------------------------


def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer market segment and
    order priority — the categorical-association test behind "does segment
    drive priority mix?" dashboards and feature-selection passes.  Emits
    the full contingency diagnostic per cell: observed count, expected
    count (e4 fixed point), and the cell's chi-square contribution in
    basis points; the test statistic is ``sum(chi2_bp)/1e4`` against
    chi2(dof) with dof = (R-1)(C-1) (documented, driver-side arithmetic).

    Exactness: expected = rt*ct/n and the cell term (obs*n - rt*ct)^2 /
    (rt*ct*n) are evaluated in DECIMAL(38,0) / HUGEINT integer arithmetic
    with a single truncating division each — both engines floor the same
    rationals, so no float summation order can flip the hash (the
    quadratic term overflows int64 beyond ~40k orders, hence the wide
    types).

    Scale shape: one equi-join orders⋈customer (both sides shuffle-keyed
    on custkey; at this SF the dim side broadcasts), ONE count aggregation
    to the R×C contingency table (map-side combine, ≤25 keys), then all
    marginals ride literal-partitioned windows over those 25 rows —
    nothing after the first agg touches the scan."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    obs = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    wseg = Window.partitionBy("c_mktsegment")
    wpri = Window.partitionBy("o_orderpriority")
    wall = Window.partitionBy(const_part(F.col("c_mktsegment")))
    t = obs.select(
        "c_mktsegment",
        "o_orderpriority",
        "obs",
        F.sum("obs").over(wseg).alias("rt"),
        F.sum("obs").over(wpri).alias("ct"),
        F.sum("obs").over(wall).alias("n"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    dev = f"({dec.format('obs')} * n - {dec.format('rt')} * ct)"
    return t.select(
        "c_mktsegment",
        "o_orderpriority",
        "obs",
        F.expr(
            f"CAST((CAST(10000 AS DECIMAL(38,0)) * rt * ct) div "
            f"{dec.format('n')} AS BIGINT)"
        ).alias("expected_e4"),
        F.expr(
            f"CAST((CAST(10000 AS DECIMAL(38,0)) * {dev} * {dev}) div "
            f"({dec.format('rt')} * ct * n) AS BIGINT)"
        ).alias("chi2_bp"),
    )


ORACLE_CHI2 = """
WITH obs AS (
  SELECT c_mktsegment, o_orderpriority, count(*) AS obs
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c_mktsegment, o_orderpriority
),
t AS (
  SELECT c_mktsegment, o_orderpriority, obs,
         sum(obs) OVER (PARTITION BY c_mktsegment) AS rt,
         sum(obs) OVER (PARTITION BY o_orderpriority) AS ct,
         sum(obs) OVER () AS n
  FROM obs
)
SELECT c_mktsegment, o_orderpriority, obs,
       CAST((CAST(10000 AS HUGEINT) * rt * ct) // CAST(n AS HUGEINT)
            AS BIGINT) AS expected_e4,
       CAST((CAST(10000 AS HUGEINT)
             * (CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
             * (CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct))
            // (CAST(rt AS HUGEINT) * ct * n) AS BIGINT) AS chi2_bp
FROM t
"""


# -- two-sample Kolmogorov-Smirnov test -------------------------------------------

KS_SEG_A, KS_SEG_B = "BUILDING", "MACHINERY"


def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic comparing the order-
    value distributions of two customer segments — the distribution-shift
    test that needs no binning choice (unlike the PSI monitor, its natural
    companion): D = max |F₁(x) − F₂(x)| over the pooled sample.

    Exactness: prices are integer cents; per distinct value the two
    cumulative counts ride ONE ordered window, and D's maximization runs
    on |n₂·cum₁ − n₁·cum₂| — pure integers; the single division to basis
    points happens once at the end (and the argmax value is resolved by a
    second exact pass: min value attaining the max — no reliance on either
    engine's arg_max tie rule).

    Scale shape: one orders⋈customer join + one (value)-keyed count agg
    collapse the scan to |distinct values| rows; the cumulative window is
    ordered over those (global-window note: block-prefix-sum at 100 TB,
    same as the Gini/cumulative ops); the max and argmax are 1-row aggs.
    n₁·n₂ stays in int64 below ~3M rows per side; DECIMAL beyond
    (documented)."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    j = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .filter(F.col("c_mktsegment").isin(KS_SEG_A, KS_SEG_B))
        .select(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("v"),
            (F.col("c_mktsegment") == KS_SEG_A).alias("is_a"),
        )
    )
    per_v = j.groupBy("v").agg(
        F.sum(F.col("is_a").cast("long")).alias("c1"),
        F.sum((~F.col("is_a")).cast("long")).alias("c2"),
    )
    wall = Window.partitionBy(const_part(F.col("v")))
    wcum = Window.partitionBy(const_part(F.col("v"))).orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_v.select(
        "v",
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c2").over(wcum).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    ).withColumn(
        "term",
        F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2")),
    )
    mx = cum.agg(F.max("term").alias("mx"))
    at = (
        cum.crossJoin(F.broadcast(mx))
        .filter(F.col("term") == F.col("mx"))
        .agg(
            F.min("v").alias("at_value_cents"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.max("mx").alias("mx"),
        )
    )
    return at.select(
        "n1",
        "n2",
        "at_value_cents",
        F.expr("CAST((10000 * mx) DIV (n1 * n2) AS BIGINT)").alias("d_bp"),
    )


ORACLE_KS = f"""
WITH j AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         c_mktsegment = '{KS_SEG_A}' AS is_a
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
),
per_v AS (
  SELECT v, CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM j GROUP BY v
),
cum AS (
  SELECT v,
         sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum1,
         sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cum2,
         sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
  FROM per_v
),
t AS (SELECT *, abs(n2 * cum1 - n1 * cum2) AS term FROM cum),
mx AS (SELECT max(term) AS mx FROM t)
SELECT CAST(max(t.n1) AS BIGINT) AS n1, CAST(max(t.n2) AS BIGINT) AS n2,
       CAST(min(t.v) AS BIGINT) AS at_value_cents,
       CAST((10000 * max(t.term)) // (max(t.n1) * max(t.n2)) AS BIGINT) AS d_bp
FROM t, mx WHERE t.term = mx.mx
"""


# -- band join --------------------------------------------------------------------

BAND_CENTS = 5  # |price difference| <= 5 cents
BAND_BUCKET = 10  # bucket width; > BAND_CENTS so a pair spans <= 2 buckets


def band_join_close_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band self-join — the third join-strategy exhibit next to the range
    join and the interval join: order pairs whose totals differ by at most
    {BAND_CENTS} cents (duplicate-charge screening, price-collusion
    scans).  The naive plan is a cartesian product with an inequality
    filter; the scalable plan buckets the value axis at width
    {BAND_BUCKET} > band and equi-joins each row against its own and the
    NEXT bucket — every qualifying pair co-locates in one of the two
    bucket keys, so the join is a plain hash shuffle on integers and the
    band predicate only refines bucket-local candidates.

    Exactness/dedup: a pair is found once per direction at most; the
    (k_a < k_b) canonical filter plus DISTINCT collapses the same-bucket
    double-hit.  All integer cents.  Output: per-priority-pair counts of
    close-price order pairs (the collusion screen's summary table).

    At 100 TB: identical plan — bucket keys are `v div {BAND_BUCKET}`,
    skew only if one price point dominates (then salt the hot bucket);
    candidate volume is sum over buckets of n_b·(n_b + n_{{b+1}}),
    never n²."""
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("v"),
    )
    left = orders.select(
        "k", "prio", "v", F.expr(f"v DIV {BAND_BUCKET}").alias("b")
    )
    right = orders.select(
        F.col("k").alias("k2"),
        F.col("prio").alias("prio2"),
        F.col("v").alias("v2"),
        F.explode(
            F.array(
                F.expr(f"v DIV {BAND_BUCKET}"),
                F.expr(f"v DIV {BAND_BUCKET} + 1"),
            )
        ).alias("b"),
    )
    # canonicalize AFTER the bucket match with least/greatest (not a k<k2
    # filter): a pair whose buckets differ is only discovered in one of the
    # two role assignments, and that assignment's key order is arbitrary
    pairs = (
        left.join(right, "b")
        .filter(
            (F.col("k") != F.col("k2"))
            & (F.abs(F.col("v") - F.col("v2")) <= BAND_CENTS)
        )
        .select(
            F.least("k", "k2").alias("ka"),
            F.greatest("k", "k2").alias("kb"),
            F.least("prio", "prio2").alias("prio_a"),
            F.greatest("prio", "prio2").alias("prio_b"),
        )
        .distinct()
    )
    return pairs.groupBy("prio_a", "prio_b").agg(
        F.count(F.lit(1)).alias("n_close_pairs")
    )


ORACLE_BAND_JOIN = f"""
WITH o AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
)
SELECT least(a.prio, b.prio) AS prio_a, greatest(a.prio, b.prio) AS prio_b,
       count(*) AS n_close_pairs
FROM o a JOIN o b
  ON a.k < b.k AND b.v BETWEEN a.v - {BAND_CENTS} AND a.v + {BAND_CENTS}
GROUP BY 1, 2
"""


# -- incremental view maintenance (join view) --------------------------------------

IVM_SPLIT_DATE = "1997-01-01"  # orders delta = on/after; base = before
IVM_CUST_MOD = 10  # customer delta = custkey % 10 == 0


def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the algebra every
    streaming/materialized-view engine implements: with base states A, B
    and deltas ΔA, ΔB, the view change is EXACTLY
    ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB (insert-only case), so refreshing
    V = orders⋈customer costs |Δ|-proportional work instead of a full
    re-join.  This operator RUNS the identity and PROVES it: per market
    segment it emits the three delta-term counts, the incrementally
    maintained total (old + Σ deltas), and the full-recompute total —
    with a boolean that they are equal (also pinned in tests; the
    companion to events_incremental_rollup, which maintains an AGG view).

    Scale shape: the delta terms join a small side against a big one —
    exactly why IVM wins: ΔA⋈B shuffles only ΔA against B's existing
    partitioning (or broadcasts ΔA), never re-joining A⋈B.  All counts
    exact integers."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("d")
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    a_old = orders.filter(F.col("d") < F.lit(IVM_SPLIT_DATE))
    da = orders.filter(F.col("d") >= F.lit(IVM_SPLIT_DATE))
    b_old = customer.filter(F.col("c_custkey") % IVM_CUST_MOD != 0)
    db = customer.filter(F.col("c_custkey") % IVM_CUST_MOD == 0)

    def seg_counts(o: DataFrame, c: DataFrame, name: str) -> DataFrame:
        return (
            o.join(c, o["o_custkey"] == c["c_custkey"])
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias(name))
        )

    old_v = seg_counts(a_old, b_old, "n_old")
    t1 = seg_counts(da, b_old, "n_da_b")
    t2 = seg_counts(a_old, db, "n_a_db")
    t3 = seg_counts(da, db, "n_da_db")
    full = seg_counts(orders, customer, "n_full")
    out = (
        full.join(old_v, "c_mktsegment", "left")
        .join(t1, "c_mktsegment", "left")
        .join(t2, "c_mktsegment", "left")
        .join(t3, "c_mktsegment", "left")
        .na.fill(0, ["n_old", "n_da_b", "n_a_db", "n_da_db"])
    )
    return out.select(
        "c_mktsegment",
        "n_old",
        "n_da_b",
        "n_a_db",
        "n_da_db",
        (
            F.col("n_old") + F.col("n_da_b") + F.col("n_a_db") + F.col("n_da_db")
        ).alias("n_maintained"),
        "n_full",
        (
            F.col("n_old")
            + F.col("n_da_b")
            + F.col("n_a_db")
            + F.col("n_da_db")
            == F.col("n_full")
        ).alias("identity_holds"),
    )


ORACLE_IVM = f"""
WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
a_old AS (SELECT * FROM o WHERE d < DATE '{IVM_SPLIT_DATE}'),
da AS (SELECT * FROM o WHERE d >= DATE '{IVM_SPLIT_DATE}'),
b_old AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % {IVM_CUST_MOD} <> 0),
db AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % {IVM_CUST_MOD} = 0),
oldv AS (SELECT c_mktsegment, count(*) AS n_old FROM a_old a JOIN b_old b ON a.o_custkey = b.c_custkey GROUP BY 1),
t1 AS (SELECT c_mktsegment, count(*) AS n_da_b FROM da a JOIN b_old b ON a.o_custkey = b.c_custkey GROUP BY 1),
t2 AS (SELECT c_mktsegment, count(*) AS n_a_db FROM a_old a JOIN db b ON a.o_custkey = b.c_custkey GROUP BY 1),
t3 AS (SELECT c_mktsegment, count(*) AS n_da_db FROM da a JOIN db b ON a.o_custkey = b.c_custkey GROUP BY 1),
fullv AS (SELECT c_mktsegment, count(*) AS n_full FROM o a JOIN customer b ON a.o_custkey = b.c_custkey GROUP BY 1)
SELECT f.c_mktsegment,
       coalesce(oldv.n_old, 0) AS n_old,
       coalesce(t1.n_da_b, 0) AS n_da_b,
       coalesce(t2.n_a_db, 0) AS n_a_db,
       coalesce(t3.n_da_db, 0) AS n_da_db,
       coalesce(oldv.n_old, 0) + coalesce(t1.n_da_b, 0)
         + coalesce(t2.n_a_db, 0) + coalesce(t3.n_da_db, 0) AS n_maintained,
       f.n_full,
       coalesce(oldv.n_old, 0) + coalesce(t1.n_da_b, 0)
         + coalesce(t2.n_a_db, 0) + coalesce(t3.n_da_db, 0) = f.n_full
         AS identity_holds
FROM fullv f
LEFT JOIN oldv ON f.c_mktsegment = oldv.c_mktsegment
LEFT JOIN t1 ON f.c_mktsegment = t1.c_mktsegment
LEFT JOIN t2 ON f.c_mktsegment = t2.c_mktsegment
LEFT JOIN t3 ON f.c_mktsegment = t3.c_mktsegment
"""


# Benford expected first-digit shares, floor(1e4*log10(1+1/d)) — precomputed
# so NEITHER engine evaluates a log (the float-free extreme of the module's
# exactness policy)
BENFORD_BP = {1: 3010, 2: 1760, 3: 1249, 4: 969, 5: 791, 6: 669, 7: 579, 8: 511, 9: 457}


def stats_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screening of order totals — the forensic-
    accounting classic: naturally occurring multi-magnitude amounts
    follow P(d) = log10(1+1/d); fabricated or capped numbers don't.  Per
    digit: observed count, observed share (bp), the Benford expectation
    (precomputed integer constants — no log evaluates in either engine),
    and the absolute deviation; the headline MAD-style statistic is the
    sum of deviations, reconstructible from the rows.

    (This synthetic corpus's totals are range-bounded, so it FAILS the
    screen — which is the correct answer and what the oracle pins; the
    operator's job is the measurement, not a verdict.)

    Scale shape: first digit is a string op on the scan, ONE 9-key count
    agg with map-side combine, marginal via a literal-partition window
    over 9 rows.  Integer end to end."""
    orders = read_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"), 1, 1
    ).cast("int")
    obs = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    expected = F.create_map(
        *[F.lit(x) for kv in BENFORD_BP.items() for x in kv]
    )
    # documented-bounded global window: 9 post-aggregation rows (one per
    # first digit); const_part keeps it off the SinglePartition-exchange
    # path the plan audit flags (PARTITION BY 1 constant-folds away)
    total = F.sum("n").over(
        Window.partitionBy(const_part(F.col("digit")))
    )
    observed_bp = F.expr("CAST((10000 * n) DIV total AS BIGINT)")
    with_total = obs.withColumn("total", total)
    return with_total.select(
        "digit",
        "n",
        observed_bp.alias("observed_bp"),
        expected[F.col("digit")].cast("bigint").alias("benford_bp"),
        F.abs(observed_bp - expected[F.col("digit")])
        .cast("bigint")
        .alias("abs_dev_bp"),
    )


def _benford_oracle() -> str:
    cases = " ".join(f"WHEN {d} THEN {bp}" for d, bp in BENFORD_BP.items())
    return f"""
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit,
         count(*) AS n
  FROM orders GROUP BY 1
)
SELECT digit, n,
       CAST((10000 * n) // sum(n) OVER () AS BIGINT) AS observed_bp,
       CAST(CASE digit {cases} END AS BIGINT) AS benford_bp,
       CAST(abs((10000 * n) // sum(n) OVER () - CASE digit {cases} END) AS BIGINT)
         AS abs_dev_bp
FROM obs
"""


ORACLE_BENFORD = _benford_oracle()


def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median — the quantity-weighted median line price per
    order priority: 'the price at which half the UNITS (not half the
    lines) sell cheaper'.  Plain medians mis-state unit economics when
    line quantities vary; percentile functions don't take weights, so
    this is the cumulative-weight construction every warehouse ends up
    writing by hand — here exact and engine-portable.

    All integer: prices in cents, integer quantities as weights, ONE
    (priority, price)-keyed weight agg, a cumulative window over the
    collapsed price rows (distinct prices, far smaller than lines), and
    the lower-median pick 2·cumw ≥ totw as an exact integer comparison
    with a min() tiebreak — no interpolation, no floats anywhere."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("v"),
        F.col("l_quantity").cast("long").alias("wgt"),
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    per_v = j.groupBy("o_orderpriority", "v").agg(F.sum("wgt").alias("wsum"))
    wcum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("o_orderpriority")
    staged = per_v.select(
        "o_orderpriority",
        "v",
        F.sum("wsum").over(wcum).alias("cumw"),
        F.sum("wsum").over(wall).alias("totw"),
    )
    return (
        staged.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("o_orderpriority")
        .agg(
            F.min("v").alias("weighted_median_cents"),
            F.max("totw").alias("total_quantity"),
        )
    )


ORACLE_WEIGHTED_MEDIAN = """
WITH j AS (
  SELECT o_orderpriority,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(l_quantity AS BIGINT) AS wgt
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_v AS (
  SELECT o_orderpriority, v, sum(wgt) AS wsum FROM j GROUP BY 1, 2
),
staged AS (
  SELECT o_orderpriority, v,
         sum(wsum) OVER (PARTITION BY o_orderpriority ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         sum(wsum) OVER (PARTITION BY o_orderpriority) AS totw
  FROM per_v
)
SELECT o_orderpriority,
       CAST(min(v) AS BIGINT) AS weighted_median_cents,
       CAST(max(totw) AS BIGINT) AS total_quantity
FROM staged WHERE 2 * cumw >= totw
GROUP BY o_orderpriority
"""


# -- trimmed / winsorized means (robust location) -------------------------------------

TRIM_PCT_BP = 1000  # 10% per tail


def stats_trimmed_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed and winsorized means of order value — robust LOCATION,
    completing the robust battery (MAD = scale, Spearman = association,
    Theil–Sen = regression, and now location): trim drops the k = ⌊n/10⌋
    extreme values per tail, winsorize CLAMPS them to the surviving
    boundary values (keeping n constant — the estimator A/B platforms
    use when heavy spenders shred the mean's variance).  The raw mean
    rides along as the contrast column.

    Exactness: one total-order rank (at 100 TB: rank per-value count
    pre-aggregates, as the rank-test ops note), then all three means are
    exact integer rationals floored once to micro-cents — the boundary
    values joined back by rank equality, no float anywhere.  Everything
    after the rank runs in one aggregation + a 2-row broadcast."""
    o = read_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    w = Window.partitionBy(const_part(F.col("cents"))).orderBy(
        "cents", F.monotonically_increasing_id()
    )
    # monotonically_increasing_id is partition-dependent — rank ties on
    # cents are interchangeable for every statistic below, so the order
    # within a tie block cannot change any output (values equal); use
    # row_number over cents only in the oracle for the same reason.
    ranked = o.withColumn("rn", F.row_number().over(w))
    nk = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"count(1) * {TRIM_PCT_BP} div 10000").alias("k"),
    )
    j = ranked.crossJoin(F.broadcast(nk))
    lo = j.filter(F.col("rn") == F.col("k") + 1).select(
        F.col("cents").alias("lo_val")
    )
    hi = j.filter(F.col("rn") == F.col("n") - F.col("k")).select(
        F.col("cents").alias("hi_val")
    )
    agg = (
        j.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .agg(
            F.max("n").alias("n"),
            F.max("k").alias("k"),
            F.sum("cents").alias("s_all"),
            F.sum(
                F.when(
                    (F.col("rn") > F.col("k"))
                    & (F.col("rn") <= F.col("n") - F.col("k")),
                    F.col("cents"),
                ).otherwise(0)
            ).alias("s_mid"),
            F.sum(
                F.greatest(F.least(F.col("cents"), F.col("hi_val")), F.col("lo_val"))
            ).alias("s_wins"),
        )
    )
    return agg.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("k").cast("long").alias("k_per_tail"),
        F.expr("(1000000 * s_all) div n").alias("mean_micro"),
        F.expr("(1000000 * s_mid) div (n - 2 * k)").alias("trimmed_micro"),
        F.expr("(1000000 * s_wins) div n").alias("winsorized_micro"),
    )


ORACLE_TRIMMED = f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
ranked AS (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM o
),
nk AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) * {TRIM_PCT_BP} // 10000 AS BIGINT) AS k
  FROM o
),
lo AS (SELECT cents AS lo_val FROM ranked CROSS JOIN nk WHERE rn = k + 1),
hi AS (SELECT cents AS hi_val FROM ranked CROSS JOIN nk WHERE rn = n - k),
agg AS (
  SELECT max(n) AS n, max(k) AS k,
         CAST(sum(cents) AS BIGINT) AS s_all,
         CAST(sum(CASE WHEN rn > k AND rn <= n - k THEN cents ELSE 0 END)
              AS BIGINT) AS s_mid,
         CAST(sum(greatest(least(cents, hi_val), lo_val)) AS BIGINT) AS s_wins
  FROM ranked CROSS JOIN nk CROSS JOIN lo CROSS JOIN hi
)
SELECT n AS n_rows, k AS k_per_tail,
       (1000000 * s_all) // n AS mean_micro,
       (1000000 * s_mid) // (n - 2 * k) AS trimmed_micro,
       (1000000 * s_wins) // n AS winsorized_micro
FROM agg
"""


# -- Spearman rank correlation ------------------------------------------------------


def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between per-order ITEM COUNT and
    per-order REVENUE (a genuinely associated pair — revenue is a sum of
    per-item terms), with the raw Pearson riding along as the contrast
    column — the robust monotone-association statistic vs the linear one
    (heavy-tailed revenue moves Pearson, not Spearman).  Tie handling is
    exact:
    Pearson over DOUBLED tie-averaged ranks (2·r̄ = 2·rank() + tiecount −
    1, integers always — the Mann-Whitney trick), so every moment
    Σdx, Σdy, Σdxdy, Σdx², Σdy² is an exact DECIMAL(38)/HUGEINT; the only
    float step is the final normalized quotient, where both engines cast
    the SAME exact integers to double and apply the same sqrt/divide —
    deterministic to the last bit, floored once onto the bp grid.

    Shape: two total-order rank windows (the sorts every rank statistic
    pays; at 100 TB rank over per-value count pre-aggregates so the sort
    is |distinct values|), then ONE five-moment aggregation and a 1-row
    finisher."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("q"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("p"),
        )
        .select("q", "p")
    )
    wq = Window.partitionBy(const_part(F.col("q"))).orderBy("q")
    wp = Window.partitionBy(const_part(F.col("p"))).orderBy("p")
    ranked = (
        li.withColumn("rq", 2 * F.rank().over(wq))
        .withColumn("tq", F.count(F.lit(1)).over(Window.partitionBy("q")))
        .withColumn("rp", 2 * F.rank().over(wp))
        .withColumn("tp", F.count(F.lit(1)).over(Window.partitionBy("p")))
        .select(
            "q",
            "p",
            (F.col("rq") + F.col("tq") - 1).alias("dx"),
            (F.col("rp") + F.col("tp") - 1).alias("dy"),
        )
    )
    mom = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("dy").cast("decimal(38,0)")).alias("sy"),
        F.sum(
            (F.col("dx").cast("decimal(38,0)") * F.col("dy")).cast("decimal(38,0)")
        ).alias("sxy"),
        F.sum(
            (F.col("dx").cast("decimal(38,0)") * F.col("dx")).cast("decimal(38,0)")
        ).alias("sxx"),
        F.sum(
            (F.col("dy").cast("decimal(38,0)") * F.col("dy")).cast("decimal(38,0)")
        ).alias("syy"),
        F.sum(F.col("q").cast("decimal(38,0)")).alias("rsx"),
        F.sum(F.col("p").cast("decimal(38,0)")).alias("rsy"),
        F.sum(
            (F.col("q").cast("decimal(38,0)") * F.col("p")).cast("decimal(38,0)")
        ).alias("rsxy"),
        F.sum(
            (F.col("q").cast("decimal(38,0)") * F.col("q")).cast("decimal(38,0)")
        ).alias("rsxx"),
        F.sum(
            (F.col("p").cast("decimal(38,0)") * F.col("p")).cast("decimal(38,0)")
        ).alias("rsyy"),
    )

    def corr_bp(sxy, sx, sy, sxx, syy):
        num = f"(cast(n as decimal(38,0)) * {sxy} - {sx} * {sy})"
        va = f"(cast(n as decimal(38,0)) * {sxx} - {sx} * {sx})"
        vb = f"(cast(n as decimal(38,0)) * {syy} - {sy} * {sy})"
        return F.expr(
            f"cast(floor(10000 * cast({num} as double)"
            f" / (sqrt(cast({va} as double)) * sqrt(cast({vb} as double))))"
            f" as bigint)"
        )

    return mom.select(
        F.col("n").cast("long").alias("n_rows"),
        corr_bp("sxy", "sx", "sy", "sxx", "syy").alias("spearman_bp"),
        corr_bp("rsxy", "rsx", "rsy", "rsxx", "rsyy").alias("pearson_bp"),
    )


ORACLE_SPEARMAN = """
WITH li AS (
  SELECT CAST(count(*) AS BIGINT) AS q,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p
  FROM lineitem GROUP BY l_orderkey
),
ranked AS (
  SELECT q, p,
         2 * rank() OVER (ORDER BY q) + count(*) OVER (PARTITION BY q) - 1 AS dx,
         2 * rank() OVER (ORDER BY p) + count(*) OVER (PARTITION BY p) - 1 AS dy
  FROM li
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(dx AS HUGEINT)) AS sx, sum(CAST(dy AS HUGEINT)) AS sy,
         sum(CAST(dx AS HUGEINT) * dy) AS sxy,
         sum(CAST(dx AS HUGEINT) * dx) AS sxx,
         sum(CAST(dy AS HUGEINT) * dy) AS syy,
         sum(CAST(q AS HUGEINT)) AS rsx, sum(CAST(p AS HUGEINT)) AS rsy,
         sum(CAST(q AS HUGEINT) * p) AS rsxy,
         sum(CAST(q AS HUGEINT) * q) AS rsxx,
         sum(CAST(p AS HUGEINT) * p) AS rsyy
  FROM ranked
)
SELECT n AS n_rows,
       CAST(floor(10000 * CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
         AS spearman_bp,
       CAST(floor(10000 * CAST(n * rsxy - rsx * rsy AS DOUBLE)
            / (sqrt(CAST(n * rsxx - rsx * rsx AS DOUBLE))
               * sqrt(CAST(n * rsyy - rsy * rsy AS DOUBLE)))) AS BIGINT)
         AS pearson_bp
FROM mom
"""


# -- Mann-Whitney U rank-sum test -------------------------------------------------

MW_GROUP_A, MW_GROUP_B = "1-URGENT", "5-LOW"


def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) two-sample test — THE
    nonparametric location test, the gap in a stats battery that had
    KS/χ²/bootstrap but nothing rank-based: does one order-priority's
    price distribution stochastically dominate another's, with no
    normality assumption.

    Rank statistics are where cross-engine exactness is FREE if you keep
    the arithmetic doubled-integer: the tie-averaged rank (min+max)/2 is
    half-integer, so every quantity carries a factor 2 — per-row doubled
    rank 2·r̄ = 2·rank() + tiecount − 1 (rank() is the tie block's min in
    both engines), doubled U, doubled mean 2μ = n_a·n_b — and the
    tie-corrected variance is the exact rational
    4σ² = n_a·n_b·(N³−N−Σ(t³−t)) / (3·N·(N−1)), so
    z² = (2U−2μ)²·3·N·(N−1) / (n_a·n_b·(N³−N−T)) is a ratio of exact
    DECIMAL(38)/HUGEINT products, floored once onto the bp grid.

    Shape: one total-order rank window (the sort every rank test pays —
    at 100 TB you pre-aggregate to per-value counts first, as here via
    the tie window, so the sort runs on |distinct values|), two tiny
    aggregations, a 1-row finisher."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(MW_GROUP_A, MW_GROUP_B)
    ).select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w_rank = Window.partitionBy(const_part(F.col("cents"))).orderBy("cents")
    w_tie = Window.partitionBy("cents")
    ranked = o.withColumn("r_min", F.rank().over(w_rank)).withColumn(
        "tie_n", F.count(F.lit(1)).over(w_tie)
    )
    per = ranked.agg(
        F.sum(
            F.when(
                F.col("grp") == MW_GROUP_A,
                2 * F.col("r_min") + F.col("tie_n") - 1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("r2_a"),
        F.sum((F.col("grp") == MW_GROUP_A).cast("int")).cast("long").alias("n_a"),
        F.sum((F.col("grp") == MW_GROUP_B).cast("int")).cast("long").alias("n_b"),
    )
    ties = (
        o.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tie_term")
        )
    )
    d = "cast({} as decimal(38,0))"
    return (
        per.crossJoin(F.broadcast(ties))
        .withColumn("n_all", F.col("n_a") + F.col("n_b"))
        .withColumn("u2_a", F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1))
        .withColumn("mu2", F.col("n_a") * F.col("n_b"))
        .select(
            "n_a",
            "n_b",
            "u2_a",
            "mu2",
            "tie_term",
            F.expr(
                f"(10000 * {d.format('(u2_a - mu2)')} * {d.format('(u2_a - mu2)')}"
                f" * 3 * n_all * (n_all - 1))"
                f" div ({d.format('n_a')} * n_b *"
                f" ({d.format('n_all')} * n_all * n_all - n_all - tie_term))"
            )
            .cast("long")
            .alias("z2_bp"),
        )
        .withColumn("significant_95", (F.col("z2_bp") >= 38416).cast("int"))
    )


ORACLE_MANN_WHITNEY = f"""
WITH o AS (
  SELECT o_orderpriority AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderpriority IN ('{MW_GROUP_A}', '{MW_GROUP_B}')
),
ranked AS (
  SELECT grp, cents,
         rank() OVER (ORDER BY cents) AS r_min,
         count(*) OVER (PARTITION BY cents) AS tie_n
  FROM o
),
per AS (
  SELECT CAST(sum(CASE WHEN grp = '{MW_GROUP_A}'
                       THEN 2 * r_min + tie_n - 1 ELSE 0 END) AS BIGINT) AS r2_a,
         CAST(sum(CASE WHEN grp = '{MW_GROUP_A}' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN grp = '{MW_GROUP_B}' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM ranked
),
ties AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
  FROM (SELECT count(*) AS t FROM o GROUP BY cents)
),
fin AS (
  SELECT n_a, n_b,
         r2_a - n_a * (n_a + 1) AS u2_a,
         n_a * n_b AS mu2,
         tie_term,
         n_a + n_b AS n_all
  FROM per CROSS JOIN ties
)
SELECT n_a, n_b, u2_a, mu2, tie_term,
       CAST((10000 * CAST(u2_a - mu2 AS HUGEINT) * (u2_a - mu2)
             * 3 * n_all * (n_all - 1))
            // (CAST(n_a AS HUGEINT) * n_b
                * (CAST(n_all AS HUGEINT) * n_all * n_all - n_all - tie_term))
         AS BIGINT) AS z2_bp,
       CASE WHEN (10000 * CAST(u2_a - mu2 AS HUGEINT) * (u2_a - mu2)
                  * 3 * n_all * (n_all - 1))
                 // (CAST(n_a AS HUGEINT) * n_b
                     * (CAST(n_all AS HUGEINT) * n_all * n_all - n_all - tie_term))
                 >= 38416 THEN 1 ELSE 0 END AS significant_95
FROM fin
"""


# -- Neyman optimal stratified-sample allocation --------------------------------

NEYMAN_BUDGET = 1000  # total sample rows to allocate across strata


def stats_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) stratified-sample allocation over order priorities:
    given a total sample budget n, allocate n_h ∝ N_h·S_h — strata that
    are big OR internally variable get more samples, which minimizes the
    variance of the stratified mean estimator (the textbook improvement
    over proportional allocation, and the standard design for QA-sampling
    a 100 TB corpus: audit budget goes where the uncertainty is).

    Cross-engine exactness without a cross-stratum float reduction: the
    per-stratum variance numerator V_h = N_h·Σx² − (Σx)² is EXACT
    (DECIMAL(38)/HUGEINT — cents² sums overflow int64 at sf0.1), the
    only float op is one per-stratum sqrt (libm-identical), QUANTIZED
    IMMEDIATELY to integer cents (σ here is ~10^7 cents, so the cent grid
    already carries 1e-7 relative precision AND keeps budget·N_h·S_h far
    inside int64 — the micro grid would overflow), and every downstream
    step —
    weight products, the shared denominator, the floor division, the
    largest-remainder top-up ranked by (n·w mod Σw, stratum) — is
    integer arithmetic.  One aggregation over the data; everything else
    runs on |strata| rows.  Allocations sum to the budget EXACTLY
    (largest-remainder), pinned in tests alongside the
    high-variance-oversampled invariant."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return neyman_allocate(o)


def neyman_allocate(o: DataFrame) -> DataFrame:
    """The allocation core over a (priority, cents) frame — separated so
    tests can drive degenerate strata.  Zero-variance degenerate case
    (every stratum constant ⇒ all weights 0): falls back to PROPORTIONAL
    weights, the canonical allocation when variances carry no signal."""
    per = o.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            (F.col("cents").cast("decimal(38,0)") * F.col("cents")).cast(
                "decimal(38,0)"
            )
        ).alias("sxx"),
    )
    v_num = (
        F.col("n_rows").cast("decimal(38,0)") * F.col("sxx")
        - F.col("sx") * F.col("sx")
    )
    # S_h in whole cents: sqrt(V_h)/N_h — quantized per stratum, no
    # cross-stratum float ever happens
    s_cents = F.floor(
        F.sqrt(v_num.cast("double")) / F.col("n_rows")
    ).cast("long")
    w = per.select(
        "priority",
        "n_rows",
        F.floor(F.col("sx").cast("double") / F.col("n_rows"))
        .cast("long")
        .alias("mean_cents"),
        s_cents.alias("s_cents"),
        (F.col("n_rows") * s_cents).alias("w_h"),
    )
    tot = w.agg(
        F.sum("w_h").alias("w_sum"),
        F.sum("n_rows").alias("n_total"),
    )
    j = (
        w.crossJoin(F.broadcast(tot))
        # zero-variance degenerate case: proportional fallback
        .withColumn(
            "w_eff",
            F.when(F.col("w_sum") == 0, F.col("n_rows")).otherwise(F.col("w_h")),
        )
        .withColumn(
            "wsum_eff",
            F.when(F.col("w_sum") == 0, F.col("n_total")).otherwise(
                F.col("w_sum")
            ),
        )
    )
    base = F.expr(f"({NEYMAN_BUDGET} * w_eff) div wsum_eff")
    rem = F.expr(f"({NEYMAN_BUDGET} * w_eff) % wsum_eff")
    staged = j.select(
        "priority",
        "n_rows",
        "mean_cents",
        "s_cents",
        base.alias("base_alloc"),
        rem.alias("rem"),
        F.expr(f"({NEYMAN_BUDGET} * n_rows) div n_total").alias(
            "alloc_proportional"
        ),
    )
    shortfall = staged.agg(
        (F.lit(NEYMAN_BUDGET) - F.sum("base_alloc")).cast("long").alias("k")
    )
    rk = F.row_number().over(
        Window.partitionBy(const_part(F.col("rem"))).orderBy(
            F.desc("rem"), F.asc("priority")
        )
    )
    return (
        staged.crossJoin(F.broadcast(shortfall))
        .withColumn("rk", rk)
        .select(
            "priority",
            "n_rows",
            "mean_cents",
            "s_cents",
            (F.col("base_alloc") + (F.col("rk") <= F.col("k")).cast("long")).alias(
                "alloc_neyman"
            ),
            "alloc_proportional",
        )
    )


def stats_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DRAW that completes :func:`stats_neyman_allocation`: actually
    take the allocated per-stratum sample — deterministically, by ranking
    each stratum's rows on a salted md5 of the order key (the portable
    "uniform" order both engines compute identically; no rng state, fully
    reproducible — the property an auditable QA sample needs) and keeping
    the first ``alloc_neyman``.  Reports, per stratum: population size,
    allocation, rows actually drawn (== allocation; a short stratum would
    expose itself here), the SAMPLE mean vs the TRUE stratum mean in
    exact floored micro-cents — the audit table a sampling review reads
    to see both the design and how far this draw landed from truth.

    Scale shape: the allocation is one aggregation + |strata|-row math
    (broadcast back); the draw is ONE window shuffle keyed on the stratum
    (rank truncated at the allocation, so only sample-sized output
    survives the filter).  At 100 TB with huge strata, swap row_number
    for a two-pass threshold-on-hash (approximate rank cutoff) — the
    documented scale knob; the semantics stay rank-by-hash."""
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    alloc = neyman_allocate(o.select("priority", "cents"))
    rk = F.row_number().over(
        Window.partitionBy("priority").orderBy(
            F.md5(F.concat(F.lit("samp:"), F.col("okey").cast("string"))), "okey"
        )
    )
    drawn = (
        o.withColumn("rk", rk)
        .join(
            F.broadcast(alloc.select("priority", "alloc_neyman")), "priority"
        )
        .filter(F.col("rk") <= F.col("alloc_neyman"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_drawn"),
            F.sum("cents").cast("long").alias("s_sample"),
        )
    )
    truth = o.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("long").alias("s_all"),
    )
    return (
        truth.join(drawn, "priority")
        .join(alloc.select("priority", "alloc_neyman"), "priority")
        .select(
            "priority",
            "n_rows",
            "alloc_neyman",
            "n_drawn",
            F.expr("(1000000 * s_sample) div n_drawn").alias("sample_mean_micro"),
            F.expr("(1000000 * s_all) div n_rows").alias("true_mean_micro"),
        )
    )


ORACLE_NEYMAN = f"""
WITH o AS (
  SELECT o_orderpriority AS priority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
per AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n_rows,
         sum(CAST(cents AS HUGEINT)) AS sx,
         sum(CAST(cents AS HUGEINT) * cents) AS sxx
  FROM o GROUP BY 1
),
w AS (
  SELECT priority, n_rows,
         CAST(floor(CAST(sx AS DOUBLE) / n_rows) AS BIGINT) AS mean_cents,
         CAST(floor(sqrt(CAST(n_rows * sxx - sx * sx AS DOUBLE)) / n_rows)
              AS BIGINT) AS s_cents
  FROM per
),
w2 AS (SELECT *, n_rows * s_cents AS w_h FROM w),
tot AS (
  SELECT CAST(sum(w_h) AS BIGINT) AS w_sum, CAST(sum(n_rows) AS BIGINT) AS n_total
  FROM w2
),
staged AS (
  SELECT priority, n_rows, mean_cents, s_cents,
         ({NEYMAN_BUDGET} * w_eff) // wsum_eff AS base_alloc,
         ({NEYMAN_BUDGET} * w_eff) % wsum_eff AS rem,
         ({NEYMAN_BUDGET} * n_rows) // n_total AS alloc_proportional
  FROM (SELECT w2.*, n_total,
               CASE WHEN w_sum = 0 THEN n_rows ELSE w_h END AS w_eff,
               CASE WHEN w_sum = 0 THEN n_total ELSE w_sum END AS wsum_eff
        FROM w2 CROSS JOIN tot)
),
shortfall AS (
  SELECT CAST({NEYMAN_BUDGET} - sum(base_alloc) AS BIGINT) AS k FROM staged
)
SELECT priority, n_rows, mean_cents, s_cents,
       CAST(base_alloc + CASE WHEN row_number() OVER (ORDER BY rem DESC, priority)
                              <= k THEN 1 ELSE 0 END AS BIGINT) AS alloc_neyman,
       CAST(alloc_proportional AS BIGINT) AS alloc_proportional
FROM staged CROSS JOIN shortfall
"""

ORACLE_NEYMAN_SAMPLE = f"""
WITH alloc AS ({ORACLE_NEYMAN}),
o2 AS (
  SELECT o_orderpriority AS priority, o_orderkey AS okey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
ranked AS (
  SELECT priority, cents,
         row_number() OVER (
           PARTITION BY priority
           ORDER BY md5('samp:' || CAST(okey AS VARCHAR)), okey
         ) AS rk
  FROM o2
),
drawn AS (
  SELECT r.priority, CAST(count(*) AS BIGINT) AS n_drawn,
         CAST(sum(r.cents) AS BIGINT) AS s_sample
  FROM ranked r JOIN alloc a ON r.priority = a.priority
  WHERE r.rk <= a.alloc_neyman
  GROUP BY r.priority
),
truth AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(cents) AS BIGINT) AS s_all
  FROM o2 GROUP BY priority
)
SELECT t.priority, t.n_rows, a.alloc_neyman, d.n_drawn,
       CAST((1000000 * d.s_sample) // d.n_drawn AS BIGINT) AS sample_mean_micro,
       CAST((1000000 * t.s_all) // t.n_rows AS BIGINT) AS true_mean_micro
FROM truth t JOIN drawn d ON t.priority = d.priority
JOIN alloc a ON t.priority = a.priority
"""


# -- Lag/lead/rolling feature generation ------------------------------------------


def window_feature_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series FEATURE GENERATION — the standard lag/lead/rolling
    block a training pipeline materializes per series before fitting any
    model: for each (event type, day), yesterday's and last week's value
    (lag 1/7), tomorrow's value (the label leak-check column), the
    trailing-7-day sum/min/max, and the day-over-day delta in basis
    points.  Every feature is an exact integer on the cents grid;
    series-edge rows carry NULLs (no silent zero-fill — the downstream
    imputation policy is the consumer's decision, not the feature
    store's).  The delta division is sign-split so both engines truncate
    identically.

    Scale shape: one map-side-combined daily rollup, then ONE window
    partition per series carrying all six frames — at 100 TB millions of
    independent series, no global pass, and the frames share the single
    per-series sort."""
    ev = read_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(cents).alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    feat = (
        daily.withColumn("lag_1d", F.lag("y", 1).over(w))
        .withColumn("lag_7d", F.lag("y", 7).over(w))
        .withColumn("lead_1d", F.lead("y", 1).over(w))
        .withColumn("roll7_sum", F.sum("y").over(w7))
        .withColumn("roll7_min", F.min("y").over(w7))
        .withColumn("roll7_max", F.max("y").over(w7))
    )
    return feat.selectExpr(
        "event_type",
        "CAST(day AS STRING) AS day",
        "y AS y_cents",
        "lag_1d",
        "lag_7d",
        "lead_1d",
        "roll7_sum",
        "roll7_min",
        "roll7_max",
        "CASE WHEN lag_1d IS NULL THEN NULL"
        " WHEN y - lag_1d >= 0 THEN CAST((10000 * (y - lag_1d)) div lag_1d AS BIGINT)"
        " ELSE -CAST((10000 * (lag_1d - y)) div lag_1d AS BIGINT)"
        " END AS delta_bp",
    )


ORACLE_FEATURE_LAGS = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
feat AS (
  SELECT event_type, day, y,
         lag(y, 1) OVER w AS lag_1d,
         lag(y, 7) OVER w AS lag_7d,
         lead(y, 1) OVER w AS lead_1d,
         sum(y) OVER w7 AS roll7_sum,
         min(y) OVER w7 AS roll7_min,
         max(y) OVER w7 AS roll7_max
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day),
         w7 AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, CAST(day AS VARCHAR) AS day, y AS y_cents,
       lag_1d, lag_7d, lead_1d,
       CAST(roll7_sum AS BIGINT) AS roll7_sum,
       CAST(roll7_min AS BIGINT) AS roll7_min,
       CAST(roll7_max AS BIGINT) AS roll7_max,
       CASE WHEN lag_1d IS NULL THEN NULL
            WHEN y - lag_1d >= 0
              THEN CAST((10000 * (y - lag_1d)) // lag_1d AS BIGINT)
            ELSE -CAST((10000 * (lag_1d - y)) // lag_1d AS BIGINT)
       END AS delta_bp
FROM feat
"""


# -- Kruskal-Wallis k-sample rank test -------------------------------------------

KW_GROUPS = ("1-URGENT", "2-HIGH", "3-MEDIUM")


def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test — the k-sample generalization of
    Mann–Whitney (which this battery already has for k=2): do the three
    most-urgent order priorities share a price distribution, with no
    normality assumption?  The one-way ANOVA replacement every experiment
    readout reaches for when the metric is skewed.

    Exactness follows the battery's two house patterns at once: the rank
    layer keeps the tie-averaged rank doubled-integer (2·r̄ = 2·rank() +
    tiecount − 1, exact in both engines), and the k-group finisher —
    which unlike Mann–Whitney needs a CROSS-GROUP sum of non-integer
    rationals Σ R̄ᵢ²/nᵢ — PIVOTS the three groups into one row (the
    Welch/Brown–Forsythe trick) so the double arithmetic is a fixed
    left-to-right IEEE expression tree, bit-identical cross-engine, then
    floors once onto ppm.  Tie correction: H' = H / (1 − ΣT/(N³−N)).

    Scale shape: one total-order rank window (every rank test's price —
    at 100 TB pre-aggregate to per-value counts first), ONE map-side-
    combined aggregation pivoting to a single row, scalar finisher."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(*KW_GROUPS)
    ).select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w_rank = Window.partitionBy(const_part(F.col("cents"))).orderBy("cents")
    w_tie = Window.partitionBy("cents")
    ranked = o.withColumn("r_min", F.rank().over(w_rank)).withColumn(
        "tie_n", F.count(F.lit(1)).over(w_tie)
    )
    r2 = 2 * F.col("r_min") + F.col("tie_n") - 1
    per = ranked.agg(
        *[
            x
            for i, g in enumerate(KW_GROUPS, 1)
            for x in (
                F.sum((F.col("grp") == g).cast("int")).cast("long").alias(f"n{i}"),
                F.sum(F.when(F.col("grp") == g, r2).otherwise(0))
                .cast("long")
                .alias(f"r{i}"),
            )
        ]
    )
    ties = (
        o.groupBy("cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tie_term")
        )
    )
    # fixed IEEE tree — written ONCE as SQL text shared verbatim with the
    # oracle so the parenthesization cannot drift between engines
    return (
        per.crossJoin(F.broadcast(ties))
        .withColumn("n_all", F.col("n1") + F.col("n2") + F.col("n3"))
        .selectExpr(
            "n1",
            "n2",
            "n3",
            "tie_term",
            f"CAST(floor({KW_H_EXPR}) AS BIGINT) AS kw_h_ppm",
        )
        .withColumn(
            "significant_95", (F.col("kw_h_ppm") >= 5991465).cast("int")
        )  # chi2(0.95, df=2) = 5.991465
    )


# H' on doubled rank sums rᵢ (= 2·Σr̄): H = 3·S/(N(N+1)) − 3(N+1) with
# S = Σ rᵢ²/nᵢ, divided by the tie factor (1 − T/(N³−N)).  Shared Spark/DuckDB.
KW_H_EXPR = (
    "1000000.0 * ((3.0 * ((CAST(r1 AS DOUBLE) * CAST(r1 AS DOUBLE)"
    " / CAST(n1 AS DOUBLE))"
    " + (CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " + (CAST(r3 AS DOUBLE) * CAST(r3 AS DOUBLE) / CAST(n3 AS DOUBLE)))"
    " / (CAST(n_all AS DOUBLE) * (CAST(n_all AS DOUBLE) + 1.0))"
    " - 3.0 * (CAST(n_all AS DOUBLE) + 1.0))"
    " / (1.0 - CAST(tie_term AS DOUBLE)"
    " / (CAST(n_all AS DOUBLE) * CAST(n_all AS DOUBLE) * CAST(n_all AS DOUBLE)"
    " - CAST(n_all AS DOUBLE))))"
)

_KW_IN = ", ".join(f"'{g}'" for g in KW_GROUPS)

ORACLE_KRUSKAL_WALLIS = f"""
WITH o AS (
  SELECT o_orderpriority AS grp,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderpriority IN ({_KW_IN})
),
ranked AS (
  SELECT grp, cents,
         rank() OVER (ORDER BY cents) AS r_min,
         count(*) OVER (PARTITION BY cents) AS tie_n
  FROM o
),
per AS (
  SELECT
    CAST(sum(CASE WHEN grp = '{KW_GROUPS[0]}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN grp = '{KW_GROUPS[0]}'
             THEN 2 * r_min + tie_n - 1 ELSE 0 END) AS BIGINT) AS r1,
    CAST(sum(CASE WHEN grp = '{KW_GROUPS[1]}' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN grp = '{KW_GROUPS[1]}'
             THEN 2 * r_min + tie_n - 1 ELSE 0 END) AS BIGINT) AS r2,
    CAST(sum(CASE WHEN grp = '{KW_GROUPS[2]}' THEN 1 ELSE 0 END) AS BIGINT) AS n3,
    CAST(sum(CASE WHEN grp = '{KW_GROUPS[2]}'
             THEN 2 * r_min + tie_n - 1 ELSE 0 END) AS BIGINT) AS r3
  FROM ranked
),
ties AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
  FROM (SELECT count(*) AS t FROM o GROUP BY cents)
),
fin AS (
  SELECT *, n1 + n2 + n3 AS n_all
  FROM per CROSS JOIN ties
)
SELECT n1, n2, n3, tie_term,
       CAST(floor({KW_H_EXPR}) AS BIGINT) AS kw_h_ppm,
       CASE WHEN CAST(floor({KW_H_EXPR}) AS BIGINT) >= 5991465
            THEN 1 ELSE 0 END AS significant_95
FROM fin
"""


# -- McNemar paired-binary test ---------------------------------------------------

MCNEMAR_YEAR_A, MCNEMAR_YEAR_B = 1996, 1997


def stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary outcomes — did customers' purchase
    propensity CHANGE between two years?  Each customer is its own
    control (paired design), so only the DISCORDANT pairs carry signal:
    b = active in year A only, c = active in year B only, and
    χ² = (b−c)²/(b+c) against chi2(df=1).  The standard readout for
    before/after product changes where each unit is observed twice.

    Fully integer-exact: the per-customer flags are max(CASE) bits from
    one grouped pass over orders (year predicate pushed to the scan),
    b/c/concordant are integer counts, and the statistic is one
    truncating division onto the bp grid — no floats anywhere.
    Customers with no orders in either year are concordant (0,0) pairs
    and contribute nothing, so the orders-only aggregation loses no
    information (documented; n_pairs counts the active-either-year
    customers actually aggregated)."""
    o = read_table(spark, sf_dir, "orders")
    flags = (
        o.filter(F.year("o_orderdate").isin(MCNEMAR_YEAR_A, MCNEMAR_YEAR_B))
        .groupBy("o_custkey")
        .agg(
            F.max((F.year("o_orderdate") == MCNEMAR_YEAR_A).cast("int")).alias("a"),
            F.max((F.year("o_orderdate") == MCNEMAR_YEAR_B).cast("int")).alias("b"),
        )
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 1)).cast("int"))
        .cast("long")
        .alias("concordant_both"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 0)).cast("int"))
        .cast("long")
        .alias("only_a"),
        F.sum(((F.col("a") == 0) & (F.col("b") == 1)).cast("int"))
        .cast("long")
        .alias("only_b"),
    )
    return agg.select(
        "n_pairs",
        "concordant_both",
        "only_a",
        "only_b",
        F.expr(
            "CAST((10000 * CAST(only_a - only_b AS DECIMAL(38,0))"
            " * (only_a - only_b)) div"
            " CAST(only_a + only_b AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("chi2_bp"),
    ).withColumn(
        "significant_95", (F.col("chi2_bp") >= 38415).cast("int")
    )  # chi2(0.95, df=1) = 3.8415


ORACLE_MCNEMAR = f"""
WITH flags AS (
  SELECT o_custkey,
         max(CASE WHEN year(o_orderdate) = {MCNEMAR_YEAR_A} THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN year(o_orderdate) = {MCNEMAR_YEAR_B} THEN 1 ELSE 0 END) AS b
  FROM orders
  WHERE year(o_orderdate) IN ({MCNEMAR_YEAR_A}, {MCNEMAR_YEAR_B})
  GROUP BY o_custkey
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS concordant_both,
         CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS only_a,
         CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS only_b
  FROM flags
)
SELECT n_pairs, concordant_both, only_a, only_b,
       CAST((10000 * CAST(only_a - only_b AS HUGEINT) * (only_a - only_b))
            // CAST(only_a + only_b AS HUGEINT) AS BIGINT) AS chi2_bp,
       CASE WHEN (10000 * CAST(only_a - only_b AS HUGEINT) * (only_a - only_b))
                 // CAST(only_a + only_b AS HUGEINT) >= 38415
            THEN 1 ELSE 0 END AS significant_95
FROM agg
"""


# -- Cochran's Q k-treatment paired-binary test ------------------------------------

COCHRAN_YEARS = (1996, 1997, 1998)


def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q — the k-treatment generalization of McNemar (which this
    battery has for k=2): did customers' purchase propensity differ
    across THREE years, with every customer serving as its own block?
    The standard readout for k repeated binary measurements on the same
    units (k model versions scored on the same eval set is the
    training-pipeline instance).

        Q = k(k−1)·Σ_j(G_j − N/k)² / (k·N − Σ L_i²)

    (G_j = per-year totals, L_i = per-customer totals, N = ΣL).  Clearing
    N/k with k² makes the numerator Σ(k·G_j − N)² exact, so
    Q_bp = 10⁴(k−1)·Σ(kG_j−N)² div (k·(kN − ΣL²)) is one truncating
    integer division both engines share — no floats anywhere.  Customers
    active in no qualifying year are all-zero blocks and contribute
    nothing, so the orders-only aggregation loses no information; the
    all-ones blocks (active every year) are counted but likewise carry
    no signal.

    Shape: one grouped pass over orders (year predicate pushed to the
    scan) pivoting per-customer flags, one 1-row reduction — McNemar's
    exact scale posture with k columns."""
    o = read_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    flags = (
        o.filter(yr.isin(*COCHRAN_YEARS))
        .groupBy("o_custkey")
        .agg(
            *[
                F.max((yr == y).cast("int")).alias(f"x{i}")
                for i, y in enumerate(COCHRAN_YEARS, 1)
            ]
        )
    )
    k = len(COCHRAN_YEARS)
    l_i = sum(F.col(f"x{i}") for i in range(1, k + 1))
    agg = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        *[
            F.sum(f"x{i}").cast("long").alias(f"g{i}")
            for i in range(1, k + 1)
        ],
        F.sum(l_i).cast("long").alias("n_total"),
        F.sum(l_i * l_i).cast("long").alias("l_sq"),
    )
    dev_sq = " + ".join(
        f"(CAST({k} AS DECIMAL(38,0)) * g{i} - n_total)"
        f" * (CAST({k} AS DECIMAL(38,0)) * g{i} - n_total)"
        for i in range(1, k + 1)
    )
    q_expr = (
        f"(CAST(10000 AS DECIMAL(38,0)) * {k - 1} * ({dev_sq}))"
        f" div (CAST({k} AS DECIMAL(38,0))"
        f" * (CAST({k} AS DECIMAL(38,0)) * n_total - l_sq))"
    )
    return agg.selectExpr(
        "n_subjects",
        *[f"g{i}" for i in range(1, k + 1)],
        f"CAST({q_expr} AS BIGINT) AS q_bp",
    ).withColumn(
        "significant_95", (F.col("q_bp") >= 59915).cast("int")
    )  # chi2(0.95, df=k-1=2) = 5.9915


_CQ_IN = ", ".join(str(y) for y in COCHRAN_YEARS)
_CQ_K = len(COCHRAN_YEARS)
_CQ_FLAGS = ",\n         ".join(
    f"max(CASE WHEN year(o_orderdate) = {y} THEN 1 ELSE 0 END) AS x{i}"
    for i, y in enumerate(COCHRAN_YEARS, 1)
)
_CQ_L = " + ".join(f"x{i}" for i in range(1, _CQ_K + 1))
_CQ_DEV = " + ".join(
    f"(CAST({_CQ_K} AS HUGEINT) * g{i} - n_total)"
    f" * (CAST({_CQ_K} AS HUGEINT) * g{i} - n_total)"
    for i in range(1, _CQ_K + 1)
)
_CQ_Q = (
    f"(CAST(10000 AS HUGEINT) * {_CQ_K - 1} * ({_CQ_DEV}))"
    f" // (CAST({_CQ_K} AS HUGEINT)"
    f" * (CAST({_CQ_K} AS HUGEINT) * n_total - l_sq))"
)

ORACLE_COCHRAN_Q = f"""
WITH flags AS (
  SELECT o_custkey,
         {_CQ_FLAGS}
  FROM orders
  WHERE year(o_orderdate) IN ({_CQ_IN})
  GROUP BY o_custkey
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_subjects,
         {", ".join(f"CAST(sum(x{i}) AS BIGINT) AS g{i}" for i in range(1, _CQ_K + 1))},
         CAST(sum({_CQ_L}) AS BIGINT) AS n_total,
         CAST(sum(({_CQ_L}) * ({_CQ_L})) AS BIGINT) AS l_sq
  FROM flags
)
SELECT n_subjects, {", ".join(f"g{i}" for i in range(1, _CQ_K + 1))},
       CAST({_CQ_Q} AS BIGINT) AS q_bp,
       CASE WHEN {_CQ_Q} >= 59915 THEN 1 ELSE 0 END AS significant_95
FROM agg
"""


# -- Cramér's V association strength ---------------------------------------------


def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the normalized effect size the chi-square test
    (stats_chi2_independence) is missing: at 100 TB row counts EVERY
    association is "significant", so the dashboard question is "how
    strong?", which V = sqrt(χ²/(N·(min(R,C)−1))) ∈ [0,1] answers
    scale-free.  Measured here between order status and order priority
    (5×3 table, single-table, no join — the chi2 query covers the joined
    segment×priority pair).

    Exactness: each cell's χ² contribution is floored ONTO THE e8 GRID
    individually as an exact DECIMAL(38)/HUGEINT rational — per-cell
    flooring is the defined semantic, so the cross-cell reduction is a
    sum of INTEGERS (order-independent, unlike a float sum) — and the
    only float op is one terminal sqrt (IEEE-correctly-rounded in both
    engines), floored onto ppm.

    Scale shape: ONE count aggregation to the R×C table (map-side
    combine, 15 keys); marginals ride literal-partitioned windows over
    those 15 rows; nothing after the first agg touches the scan."""
    o = read_table(spark, sf_dir, "orders")
    seen = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("obs")
    )
    # complete the R×C grid: a structurally EMPTY cell still carries a χ²
    # contribution (obs=0 against expected rt·ct/n) — groupBy alone would
    # silently drop it and understate the statistic exactly when the
    # association is strongest
    obs = (
        seen.select("o_orderstatus")
        .distinct()
        .crossJoin(seen.select("o_orderpriority").distinct())
        .join(seen, ["o_orderstatus", "o_orderpriority"], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0)))
    )
    wr = Window.partitionBy("o_orderstatus")
    wc = Window.partitionBy("o_orderpriority")
    wall = Window.partitionBy(const_part(F.col("obs")))
    t = obs.select(
        "obs",
        F.sum("obs").over(wr).alias("rt"),
        F.sum("obs").over(wc).alias("ct"),
        F.sum("obs").over(wall).alias("n"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    dev = f"({dec.format('obs')} * n - {dec.format('rt')} * ct)"
    cells = t.selectExpr(
        f"CAST((CAST(100000000 AS DECIMAL(38,0)) * {dev} * {dev}) div "
        f"({dec.format('rt')} * ct * n) AS BIGINT) AS cell_e8",
        "n",
    )
    dims = obs.agg(
        F.least(
            F.countDistinct("o_orderstatus"), F.countDistinct("o_orderpriority")
        )
        .cast("long")
        .alias("min_dim")
    )
    agg = cells.agg(
        F.sum("cell_e8").cast("long").alias("chi2_e8"),
        F.max("n").cast("long").alias("n"),
    ).crossJoin(F.broadcast(dims))
    return agg.selectExpr(
        "n",
        "chi2_e8",
        "min_dim - 1 AS dof_min",
        "CAST(floor(1000000.0 * sqrt((CAST(chi2_e8 AS DOUBLE) / 100000000.0)"
        " / (CAST(n AS DOUBLE) * CAST(min_dim - 1 AS DOUBLE)))) AS BIGINT)"
        " AS cramers_v_ppm",
    )


ORACLE_CRAMERS_V = """
WITH seen AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS obs
  FROM orders GROUP BY 1, 2
),
obs AS (
  SELECT g.o_orderstatus, g.o_orderpriority, coalesce(s.obs, 0) AS obs
  FROM (SELECT DISTINCT a.o_orderstatus, b.o_orderpriority
        FROM seen a CROSS JOIN seen b) g
  LEFT JOIN seen s
    ON g.o_orderstatus = s.o_orderstatus
   AND g.o_orderpriority = s.o_orderpriority
),
t AS (
  SELECT obs,
         sum(obs) OVER (PARTITION BY o_orderstatus) AS rt,
         sum(obs) OVER (PARTITION BY o_orderpriority) AS ct,
         sum(obs) OVER () AS n
  FROM obs
),
cells AS (
  SELECT CAST((CAST(100000000 AS HUGEINT)
               * (CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
               * (CAST(obs AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct))
              // (CAST(rt AS HUGEINT) * ct * n) AS BIGINT) AS cell_e8,
         n
  FROM t
),
dims AS (
  SELECT CAST(least(count(DISTINCT o_orderstatus),
                    count(DISTINCT o_orderpriority)) AS BIGINT) AS min_dim
  FROM obs
),
agg AS (
  SELECT CAST(sum(cell_e8) AS BIGINT) AS chi2_e8,
         CAST(max(n) AS BIGINT) AS n, min_dim
  FROM cells CROSS JOIN dims
  GROUP BY min_dim
)
SELECT n, chi2_e8, min_dim - 1 AS dof_min,
       CAST(floor(1000000.0 * sqrt((CAST(chi2_e8 AS DOUBLE) / 100000000.0)
            / (CAST(n AS DOUBLE) * CAST(min_dim - 1 AS DOUBLE)))) AS BIGINT)
         AS cramers_v_ppm
FROM agg
"""


# -- Jonckheere-Terpstra ordered-trend test ---------------------------------------


def stats_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra test — the ORDERED-alternative k-sample test:
    where Kruskal–Wallis asks "do the priority groups differ at all?",
    JT asks the sharper monotone question "does order price tend to RISE
    along 1-URGENT < 2-HIGH < 3-MEDIUM?" by summing the pairwise
    Mann–Whitney counts over every ordered group pair.

    Exactness: everything stays integer by doubling — 2J = Σ_{{g<h}} Σ_v
    n_h(v)·(2·C_g(<v) + n_g(v)) (ties count half, hence the doubling),
    computed from per-value group counts with ONE exclusive cumulative
    window over the pivoted value axis, never a pairwise join; the null
    mean clears its /4 as 4·E[J] = N² − Σ n_g².  The direction call
    compares the two exact integers (4·2J/2 vs …): sign(2·2J − (N² −
    Σn_g²)·… ) — i.e. 2·(2J) vs 4E — so the trend flag can never drift;
    z is IEEE from exact inputs with the tie-UNcorrected variance
    (documented — ties in cents are sparse).

    Scale shape: per-value counts first (map-side combine to |distinct
    values| rows), one pivoted ordered window over that bounded axis,
    a 1-row finisher — the Kruskal–Wallis shape with a cumsum instead of
    a rank."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(*KW_GROUPS)
    ).select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per_val = o.groupBy("cents").agg(
        *[
            F.sum((F.col("grp") == g).cast("long")).alias(f"n{i}")
            for i, g in enumerate(KW_GROUPS, 1)
        ]
    )
    w_ex = (
        Window.partitionBy(const_part(F.col("cents")))
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_val.select(
        "cents",
        "n1",
        "n2",
        "n3",
        F.coalesce(F.sum("n1").over(w_ex), F.lit(0)).alias("c1"),
        F.coalesce(F.sum("n2").over(w_ex), F.lit(0)).alias("c2"),
    )
    agg = cum.agg(
        F.sum(
            F.col("n2") * (2 * F.col("c1") + F.col("n1"))
            + F.col("n3") * (2 * F.col("c1") + F.col("n1"))
            + F.col("n3") * (2 * F.col("c2") + F.col("n2"))
        ).cast("long").alias("j2"),
        F.sum("n1").cast("long").alias("m1"),
        F.sum("n2").cast("long").alias("m2"),
        F.sum("n3").cast("long").alias("m3"),
    )
    base = agg.selectExpr(
        "m1 + m2 + m3 AS n_total",
        "j2",
        "(m1+m2+m3)*(m1+m2+m3) - (m1*m1 + m2*m2 + m3*m3) AS mean4",
        # tie-uncorrected 72*Var as an EXACT integer
        "(m1+m2+m3)*(m1+m2+m3)*(2*(m1+m2+m3)+3)"
        " - (m1*m1*(2*m1+3) + m2*m2*(2*m2+3) + m3*m3*(2*m3+3)) AS var72",
    )
    return base.selectExpr(
        "n_total",
        "j2",
        "mean4",
        # 2*(2J) vs 4E compares J to its null mean exactly
        "CASE WHEN 2*j2 > mean4 THEN 'increasing'"
        " WHEN 2*j2 < mean4 THEN 'decreasing' ELSE 'none' END AS direction",
        # z = 4(J-E) / (4*sigma); tie-uncorrected (documented), IEEE from
        # the exact integers above
        "CAST(2*j2 - mean4 AS DOUBLE)"
        " / SQRT(CAST(var72 AS DOUBLE) * 16.0 / 72.0) AS z",
    )


ORACLE_JONCKHEERE = f"""
WITH vals AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderpriority AS grp
  FROM orders WHERE o_orderpriority IN ('{KW_GROUPS[0]}', '{KW_GROUPS[1]}', '{KW_GROUPS[2]}')
),
per_val AS (
  SELECT cents,
         CAST(sum(CASE WHEN grp = '{KW_GROUPS[0]}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN grp = '{KW_GROUPS[1]}' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN grp = '{KW_GROUPS[2]}' THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM vals GROUP BY cents
),
cum AS (
  SELECT cents, n1, n2, n3,
         coalesce(sum(n1) OVER w, 0) AS c1,
         coalesce(sum(n2) OVER w, 0) AS c2
  FROM per_val
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
agg AS (
  SELECT CAST(sum(n2*(2*c1+n1) + n3*(2*c1+n1) + n3*(2*c2+n2)) AS BIGINT) AS j2,
         CAST(sum(n1) AS BIGINT) AS m1,
         CAST(sum(n2) AS BIGINT) AS m2,
         CAST(sum(n3) AS BIGINT) AS m3
  FROM cum
),
base AS (
  SELECT m1 + m2 + m3 AS n_total, j2,
         (m1+m2+m3)*(m1+m2+m3) - (m1*m1 + m2*m2 + m3*m3) AS mean4,
         (m1+m2+m3)*(m1+m2+m3)*(2*(m1+m2+m3)+3)
           - (m1*m1*(2*m1+3) + m2*m2*(2*m2+3) + m3*m3*(2*m3+3)) AS var72
  FROM agg
)
SELECT n_total, j2, mean4,
       CASE WHEN 2*j2 > mean4 THEN 'increasing'
            WHEN 2*j2 < mean4 THEN 'decreasing' ELSE 'none' END AS direction,
       CAST(2*j2 - mean4 AS DOUBLE)
         / SQRT(CAST(var72 AS DOUBLE) * 16.0 / 72.0) AS z
FROM base
"""


# -- Cohen's kappa ----------------------------------------------------------------

KAPPA_CHAR_MIN = 500  # rater A: "long document" by character count
KAPPA_SPACE_MIN = 79  # rater B: "wordy document" by space count (~80 words)


def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected inter-rater agreement, the
    standard for labeling-pipeline QA (two annotators, or annotator vs
    model, over the same items): κ = (p_o − p_e)/(1 − p_e).  Here the two
    "raters" are deterministic document classifiers that should largely
    agree — rater A calls a doc long by characters (n_chars ≥ 500),
    rater B calls it wordy by space count (length arithmetic only, so
    both engines tokenize identically) — scored per source.

    Exactness: clearing p_o = a/n and p_e = (r₁c₁ + r₀c₀)/n² gives
    κ = (n·a − S)/(n² − S) with S = r₁c₁ + r₀c₀ — every term an exact
    integer from the 2×2 contingency counts; ONE sign-split ppm floor at
    the end, NULL when the raters are degenerate (p_e = 1, κ undefined).

    Scale shape: one map-side-combined aggregation per source building
    the 2×2 table (four conditional counts), scalar finisher — no
    shuffle beyond the groupBy, no row ever leaves the executor."""
    d = read_table(spark, sf_dir, "documents")
    a = (F.col("n_chars") >= KAPPA_CHAR_MIN).cast("long")
    b = (
        (F.length("text") - F.length(F.regexp_replace("text", " ", "")))
        >= KAPPA_SPACE_MIN
    ).cast("long")
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a * b).alias("n11"),
        F.sum(a * (1 - b)).alias("n10"),
        F.sum((1 - a) * b).alias("n01"),
        F.sum((1 - a) * (1 - b)).alias("n00"),
    )
    return agg.selectExpr(
        "source",
        "n AS n_docs",
        "n11 + n00 AS n_agree",
        "CAST((1000000 * (n11 + n00)) div n AS BIGINT) AS po_ppm",
        "CAST((1000000 * ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))"
        " div (n*n) AS BIGINT) AS pe_ppm",
        "CAST(CASE WHEN n*n = (n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)"
        " THEN NULL"
        " WHEN n*(n11+n00) >= (n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)"
        " THEN (1000000 * (n*(n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))"
        "      div (n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))"
        " ELSE -((1000000 * (((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) - n*(n11+n00)))"
        "      div (n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))"
        " END AS BIGINT) AS kappa_ppm",
    )


ORACLE_COHENS_KAPPA = f"""
WITH rated AS (
  SELECT source,
         CASE WHEN n_chars >= {KAPPA_CHAR_MIN} THEN 1 ELSE 0 END AS a,
         CASE WHEN length(text) - length(replace(text, ' ', ''))
                   >= {KAPPA_SPACE_MIN} THEN 1 ELSE 0 END AS b
  FROM documents
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a * b) AS BIGINT) AS n11,
         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         CAST(sum((1 - a) * b) AS BIGINT) AS n01,
         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM rated GROUP BY source
)
SELECT source, n AS n_docs, n11 + n00 AS n_agree,
       CAST((1000000 * (n11 + n00)) // n AS BIGINT) AS po_ppm,
       CAST((1000000 * ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))
            // (n*n) AS BIGINT) AS pe_ppm,
       CAST(CASE WHEN n*n = (n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)
            THEN NULL
            WHEN n*(n11+n00) >= (n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)
            THEN (1000000 * (n*(n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))
                 // (n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))
            ELSE -((1000000 * (((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) - n*(n11+n00)))
                 // (n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))
            END AS BIGINT) AS kappa_ppm
FROM agg ORDER BY source
"""


# -- Fleiss' kappa ----------------------------------------------------------------

FLEISS_DOT_MIN = 5  # rater C: "structured document" by sentence-period count


def stats_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa — Cohen's kappa generalized to n raters (the
    multi-annotator agreement score labeling campaigns report): three
    deterministic binary document raters (long-by-characters,
    wordy-by-spaces, structured-by-periods — pure length arithmetic, so
    both engines rate identically), scored per source.

    Exactness: with r_i raters voting 1 on item i (n = 3 raters, binary
    categories), the per-item agreement sum is Σ_j n_ij² = r_i² +
    (n−r_i)², so A = Σ_i(r_i² + (n−r_i)² − n), the category totals are
    c₁ = Σr_i and c₀ = Nn − c₁, and clearing every denominator gives

        κ = (A·(Nn)² − Nn(n−1)·(c₁² + c₀²))
            / (Nn(n−1)·(Nn)² − Nn(n−1)·(c₁² + c₀²))

    — all exact integers, ONE sign-split ppm floor, NULL at the p_e = 1
    degenerate point.

    Scale shape: per-item rater votes are column expressions; one
    map-side-combined rollup per source carries (N, Σr, Σ per-item
    agreement); scalar finisher."""
    d = read_table(spark, sf_dir, "documents")
    a = (F.col("n_chars") >= KAPPA_CHAR_MIN).cast("long")
    b = (
        (F.length("text") - F.length(F.regexp_replace("text", " ", "")))
        >= KAPPA_SPACE_MIN
    ).cast("long")
    c = (
        (F.length("text") - F.length(F.regexp_replace("text", "\\.", "")))
        >= FLEISS_DOT_MIN
    ).cast("long")
    r = (a + b + c).alias("r")
    agg = d.select(r.alias("r"), "source").groupBy("source").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("r").alias("c1"),
        F.sum(F.col("r") * F.col("r") + (3 - F.col("r")) * (3 - F.col("r")) - 3)
        .alias("a_sum"),
    )
    wide = agg.selectExpr(
        "source",
        "n_items",
        "c1",
        "CAST(n_items AS DECIMAL(38,0)) AS n_d",
        "CAST(c1 AS DECIMAL(38,0)) AS c1_d",
        "CAST(a_sum AS DECIMAL(38,0)) AS a_d",
    )
    # S = c1^2 + c0^2 with c0 = 3N - c1; C = 6N; (Nn)^2 = 9N^2 — cubes of N
    # overflow int64 past N ~ 5.5e5, so the products live in DECIMAL(38)
    return wide.selectExpr(
        "source",
        "n_items",
        "c1 AS n_votes_yes",
        "CAST(CASE"
        " WHEN 6*n_d*9*n_d*n_d = 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))"
        " THEN NULL"
        " WHEN a_d*9*n_d*n_d >= 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))"
        " THEN (1000000 * (a_d*9*n_d*n_d"
        "       - 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))))"
        "      div (6*n_d*9*n_d*n_d"
        "       - 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d)))"
        " ELSE -((1000000 * (6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))"
        "       - a_d*9*n_d*n_d))"
        "      div (6*n_d*9*n_d*n_d"
        "       - 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))))"
        " END AS BIGINT) AS fleiss_kappa_ppm",
    )


ORACLE_FLEISS_KAPPA = f"""
WITH rated AS (
  SELECT source,
         (CASE WHEN n_chars >= {KAPPA_CHAR_MIN} THEN 1 ELSE 0 END
          + CASE WHEN length(text) - length(replace(text, ' ', ''))
                      >= {KAPPA_SPACE_MIN} THEN 1 ELSE 0 END
          + CASE WHEN length(text) - length(replace(text, '.', ''))
                      >= {FLEISS_DOT_MIN} THEN 1 ELSE 0 END) AS r
  FROM documents
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(r) AS BIGINT) AS c1,
         CAST(sum(r*r + (3-r)*(3-r) - 3) AS BIGINT) AS a_sum
  FROM rated GROUP BY source
),
wide AS (
  SELECT source, n_items, c1,
         CAST(n_items AS HUGEINT) AS n_d,
         CAST(c1 AS HUGEINT) AS c1_d,
         CAST(a_sum AS HUGEINT) AS a_d
  FROM agg
)
SELECT source, n_items, c1 AS n_votes_yes,
       CAST(CASE
         WHEN 6*n_d*9*n_d*n_d = 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))
         THEN NULL
         WHEN a_d*9*n_d*n_d >= 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))
         THEN (1000000 * (a_d*9*n_d*n_d
               - 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))))
              // (6*n_d*9*n_d*n_d
               - 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d)))
         ELSE -((1000000 * (6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))
               - a_d*9*n_d*n_d))
              // (6*n_d*9*n_d*n_d
               - 6*n_d*(c1_d*c1_d + (3*n_d-c1_d)*(3*n_d-c1_d))))
         END AS BIGINT) AS fleiss_kappa_ppm
FROM wide ORDER BY source
"""


QUERIES = {
    "stats_weighted_median": stats_weighted_median,
    "stats_neyman_allocation": stats_neyman_allocation,
    "stats_neyman_sample": stats_neyman_sample,
    "stats_mann_whitney": stats_mann_whitney,
    "stats_kruskal_wallis": stats_kruskal_wallis,
    "stats_cohens_kappa": stats_cohens_kappa,
    "stats_jonckheere": stats_jonckheere,
    "stats_fleiss_kappa": stats_fleiss_kappa,
    "stats_mcnemar": stats_mcnemar,
    "stats_cochran_q": stats_cochran_q,
    "stats_cramers_v": stats_cramers_v,
    "stats_spearman_corr": stats_spearman_corr,
    "stats_trimmed_means": stats_trimmed_means,
    "stats_benford_test": stats_benford_test,
    "ivm_join_delta": ivm_join_delta,
    "band_join_close_prices": band_join_close_prices,
    "stats_ks_test": stats_ks_test,
    "q1_pricing_summary": q1_pricing_summary,
    "customer_rfm_segments": customer_rfm_segments,
    "stats_chi2_independence": stats_chi2_independence,
    "stats_mad_outliers": stats_mad_outliers,
    "stats_bootstrap_ci": stats_bootstrap_ci,
    "sketch_kmv_daily_rollup": sketch_kmv_daily_rollup,
    "unpivot_lineitem_measures": unpivot_lineitem_measures,
    "profile_orders": profile_orders,
    "skew_profile": skew_profile,
    "window_rolling_7day": window_rolling_7day,
    "window_feature_lags": window_feature_lags,
    "scd2_priority_history": scd2_priority_history,
    "scd2_pit_join": scd2_pit_join,
    "scd2_bitemporal_asknown": scd2_bitemporal_asknown,
    "window_customer_deciles": window_customer_deciles,
    "window_abc_analysis": window_abc_analysis,
    "salted_revenue_by_priority": salted_revenue_by_priority,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "window_top_orders": window_top_orders,
    "window_running_sum": window_running_sum,
    "rollup_cube_revenue": rollup_cube_revenue,
    "stats_percentiles_corr": stats_percentiles_corr,
    "rollup_revenue": rollup_revenue,
    "cube_quantity": cube_quantity,
    "range_join_price_bands": range_join_price_bands,
    "sketch_kmv_distinct_parts": sketch_kmv_distinct_parts,
    "sketch_theta_setops": sketch_theta_setops,
    "sketch_hll_mergeable": sketch_hll_mergeable,
    "sketch_histogram_quantiles": sketch_histogram_quantiles,
    "sketch_ddsketch_quantiles": sketch_ddsketch_quantiles,
    "interval_overlap_orders": interval_overlap_orders,
    "er_blocked_pairs": er_blocked_pairs,
    "er_fellegi_sunter": er_fellegi_sunter,
    "setop_active_building_customers": setop_active_building_customers,
    "anti_customers_without_orders": anti_customers_without_orders,
    "semi_parts_shipped": semi_parts_shipped,
    "above_customer_avg": above_customer_avg,
    "q4_order_priority": q4_order_priority,
    "q12_priority_by_linestatus": q12_priority_by_linestatus,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q22_wealthy_no_urgent": q22_wealthy_no_urgent,
    "stats_order_percentiles": stats_order_percentiles,
    "stats_price_quantity_corr": stats_price_quantity_corr,
}

ORACLES = {
    "unpivot_lineitem_measures": ORACLE_UNPIVOT,
    "profile_orders": ORACLE_PROFILE,
    "skew_profile": ORACLE_SKEW_PROFILE,
    "window_rolling_7day": ORACLE_ROLLING_7DAY,
    "window_feature_lags": ORACLE_FEATURE_LAGS,
    "stats_order_percentiles": ORACLE_PERCENTILES,
    "stats_price_quantity_corr": ORACLE_CORR,
    "q1_pricing_summary": ORACLE_Q1,
    "q3_shipping_priority": ORACLE_Q3,
    "q5_local_supplier_volume": ORACLE_Q5,
    "q6_forecast_revenue": ORACLE_Q6,
    "window_top_orders": ORACLE_WINDOW,
    "window_running_sum": ORACLE_RUNNING,
    "rollup_cube_revenue": ORACLE_ROLLUP_CUBE,
    "stats_percentiles_corr": ORACLE_PCT_CORR,
    "rollup_revenue": ORACLE_ROLLUP,
    "cube_quantity": ORACLE_CUBE,
    "range_join_price_bands": ORACLE_RANGE_JOIN,
    "sketch_kmv_distinct_parts": ORACLE_KMV,
    "sketch_theta_setops": ORACLE_THETA,
    "sketch_hll_mergeable": ORACLE_HLL,
    "sketch_histogram_quantiles": ORACLE_HISTOGRAM,
    "sketch_ddsketch_quantiles": ORACLE_DDSKETCH,
    "interval_overlap_orders": ORACLE_INTERVAL_OVERLAP,
    "er_blocked_pairs": ORACLE_ER_BLOCKED,
    "er_fellegi_sunter": ORACLE_FELLEGI_SUNTER,
    "setop_active_building_customers": ORACLE_SETOP,
    "anti_customers_without_orders": ORACLE_ANTI,
    "semi_parts_shipped": ORACLE_SEMI,
    "above_customer_avg": ORACLE_ABOVE_AVG,
    "q4_order_priority": ORACLE_Q4,
    "q12_priority_by_linestatus": ORACLE_Q12,
    "q14_promo_revenue": ORACLE_Q14,
    "q18_large_orders": ORACLE_Q18,
    "q22_wealthy_no_urgent": ORACLE_Q22,
    "scd2_priority_history": ORACLE_SCD2,
    "scd2_pit_join": ORACLE_SCD2_PIT,
    "customer_rfm_segments": ORACLE_RFM,
    "stats_chi2_independence": ORACLE_CHI2,
    "stats_ks_test": ORACLE_KS,
    "band_join_close_prices": ORACLE_BAND_JOIN,
    "ivm_join_delta": ORACLE_IVM,
    "stats_weighted_median": ORACLE_WEIGHTED_MEDIAN,
    "stats_neyman_allocation": ORACLE_NEYMAN,
    "stats_neyman_sample": ORACLE_NEYMAN_SAMPLE,
    "stats_mann_whitney": ORACLE_MANN_WHITNEY,
    "stats_kruskal_wallis": ORACLE_KRUSKAL_WALLIS,
    "stats_cohens_kappa": ORACLE_COHENS_KAPPA,
    "stats_jonckheere": ORACLE_JONCKHEERE,
    "stats_fleiss_kappa": ORACLE_FLEISS_KAPPA,
    "stats_mcnemar": ORACLE_MCNEMAR,
    "stats_cochran_q": ORACLE_COCHRAN_Q,
    "stats_cramers_v": ORACLE_CRAMERS_V,
    "stats_spearman_corr": ORACLE_SPEARMAN,
    "stats_trimmed_means": ORACLE_TRIMMED,
    "stats_benford_test": ORACLE_BENFORD,
    "scd2_bitemporal_asknown": ORACLE_BITEMPORAL,
    "window_customer_deciles": ORACLE_DECILES,
    "window_abc_analysis": ORACLE_ABC,
    "salted_revenue_by_priority": ORACLE_SALTED,
    "stats_mad_outliers": ORACLE_MAD,
    "stats_bootstrap_ci": ORACLE_BOOTSTRAP,
    "sketch_kmv_daily_rollup": ORACLE_KMV_ROLLUP,
}
