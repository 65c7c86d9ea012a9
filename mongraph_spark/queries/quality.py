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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongraph_spark.sparkutil import const_part, read_table


# -- declarative data-quality expectations -------------------------------------------
#
# Rule surface (the dbt-test four: not_null, unique, accepted_values,
# relationships/FK — plus range and cross-column consistency):
#
#   orders:    o_orderdate not null; o_totalprice > 0; o_orderkey unique;
#              o_orderstatus ∈ {O,F,P}; FK o_custkey → customer
#   lineitem:  l_quantity ∈ [1,50]; l_discount ∈ [0,1];
#              l_shipdate ∈ [1995-01-01, 2001-12-31]; FK l_orderkey → orders
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
            ~F.col("l_shipdate").between(F.lit("1995-01-01"), F.lit("2001-12-31"))
        ).alias("range_shipdate_1995_2001"),
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
                    "range_shipdate_1995_2001",
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
         sum(CASE WHEN l_shipdate NOT BETWEEN DATE '1995-01-01' AND DATE '2001-12-31' THEN 1 ELSE 0 END) AS range_shipdate_1995_2001
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
  UNION ALL SELECT 'lineitem', 'range_shipdate_1995_2001', n, range_shipdate_1995_2001 FROM li
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


# -- small-file compaction of the CoW store ------------------------------------------


def store_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end exercise of :func:`mongraph_spark.sources.merge.compact`:
    build a bucketed store from ``documents``, fragment it with three
    trickle upserts (each leaves an extra part-file in every touched
    bucket — the accretion pattern of an operational save path), compact,
    and return the per-source profile of the COMPACTED table.

    The oracle is the same profile over the original ``documents`` parquet:
    the upserts replay rows verbatim (insert-or-replace with identical
    content), so compaction must be content-identity — any dropped,
    duplicated, or cross-bucket-misfiled row breaks the count or the
    md5 checksum.  File-count mechanics (fragmented buckets actually
    shrink, untouched buckets are carried by manifest reference) are
    pinned in tests/test_merge_store.py."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents")
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(
        tempfile.gettempdir(), f"mg_compaction_store_{app_id}_{sf_tag}"
    )
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    # three trickle upserts: disjoint slices replayed verbatim
    for lo, hi in ((0, 200), (200, 400), (400, 600)):
        batch = docs.filter(
            (F.col("doc_id") % 1000 >= lo) & (F.col("doc_id") % 1000 < hi)
        )
        merge_store.upsert(spark, root, batch, key="doc_id")
    merge_store.compact(spark, root, max_files_per_bucket=1)
    compacted = merge_store.read_current(spark, root).drop("__bucket")
    return compacted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("doc_id"), F.col("n_chars"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
        )
        .cast("bigint")
        .alias("checksum"),
    )


ORACLE_COMPACTION = """
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(n_chars AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT) AS checksum
FROM documents
GROUP BY source
"""


# -- MERGE INTO end-to-end (update + delete + insert in one statement) ----------------


def store_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end exercise of the full MERGE INTO surface
    (:func:`mongraph_spark.sources.merge.merge_into`): build the documents
    store, then ONE merge statement that simultaneously (a) updates docs
    with doc_id%10==0 (n_chars += 1000 via a per-column expression),
    (b) deletes docs with doc_id%10==1 (conditional matched-DELETE), and
    (c) inserts shifted copies (doc_id+5e6) of docs with doc_id%10==2.
    Output = per-source profile of the merged table; the oracle computes
    the same final state in plain SQL over ``documents`` — a wrong clause
    ordering, missed delete, or double-applied update breaks count,
    char-sum, or checksum."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents")
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_merge_into_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    source = (
        docs.filter(F.col("doc_id") % 10 < 2)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 2).select(
                (F.col("doc_id") + 5_000_000).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
        )
    )
    merge_store.merge_into(
        spark,
        root,
        source,
        when_matched_set={"n_chars": "n_chars + 1000"},
        when_matched_delete="src_doc_id % 10 = 1",
    )
    merged = merge_store.read_current(spark, root).drop("__bucket")
    return merged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("doc_id"), F.col("n_chars"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
        )
        .cast("bigint")
        .alias("checksum"),
    )


def store_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY for the copy-on-write store — the audit surface
    every lakehouse table format exposes: build the table (init v0 =
    docs with doc_id%3≠0), run an upsert (v1: docs with doc_id%10<3,
    n_chars+7 — updates where the key existed, inserts where it
    didn't) and a predicate delete (v2: rows whose CURRENT n_chars is
    divisible by 7), then report per VERSION: row count, keys added and
    keys removed vs the previous version, and the current-pointer flag.
    The oracle replays the exact three states in SQL over ``documents``,
    so a wrong writer (lost update, resurrection after delete, version
    skew) breaks a count or a key-diff.

    Scale shape: the history scan reads each version through its
    manifest (structural sharing — only touched buckets differ) and the
    key-diffs are consecutive-version FULL OUTER joins on the bucketed
    key; version count, not data volume, drives the report."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_history_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(
        docs.filter(F.col("doc_id") % 3 != 0), root, key="doc_id", n_buckets=8
    )
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") % 10 < 3).withColumn(
            "n_chars", F.col("n_chars") + 7
        ),
        key="doc_id",
        order_col="n_chars",
    )
    merge_store.delete_where(spark, root, F.col("n_chars") % 7 == 0)
    states = [
        merge_store.read_version(spark, root, v)
        .select("doc_id")
        .withColumn("version", F.lit(v).cast("long"))
        for v in range(3)
    ]
    allv = states[0].unionByName(states[1]).unionByName(states[2])
    counts = allv.groupBy("version").agg(F.count(F.lit(1)).alias("n_rows"))

    def diff(prev: DataFrame, cur: DataFrame, v: int) -> DataFrame:
        p = prev.select(F.col("doc_id").alias("k")).withColumn("in_p", F.lit(1))
        c = cur.select(F.col("doc_id").alias("k")).withColumn("in_c", F.lit(1))
        j = p.join(c, "k", "full_outer")
        return j.agg(
            F.lit(v).cast("long").alias("version"),
            F.sum(F.when(F.col("in_p").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_added"),
            F.sum(F.when(F.col("in_c").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
        )
    first = spark.range(1).select(
        F.lit(0).cast("long").alias("version"),
        F.lit(None).cast("long").alias("n_added"),
        F.lit(0).cast("long").alias("n_removed"),
    )
    diffs = first.unionByName(diff(states[0], states[1], 1)).unionByName(
        diff(states[1], states[2], 2)
    )
    cur_v = int(merge_store.current_version(root).split("_")[1])
    return (
        counts.join(diffs, "version")
        .select(
            "version",
            "n_rows",
            # v0's "added" is its full row count (no predecessor)
            F.coalesce("n_added", "n_rows").alias("n_added"),
            "n_removed",
            (F.col("version") == F.lit(cur_v)).cast("long").alias("is_current"),
        )
    )


ORACLE_STORE_HISTORY = """
WITH s0 AS (
  SELECT doc_id, n_chars FROM documents WHERE doc_id % 3 != 0
),
s1 AS (
  -- upsert: %10<3 rows replace/insert with n_chars+7 (last-writer-wins)
  SELECT doc_id, n_chars + 7 AS n_chars FROM documents WHERE doc_id % 10 < 3
  UNION ALL
  SELECT doc_id, n_chars FROM s0 WHERE doc_id % 10 >= 3
),
s2 AS (SELECT doc_id, n_chars FROM s1 WHERE n_chars % 7 != 0)
SELECT 0 AS version, (SELECT count(*) FROM s0) AS n_rows,
       (SELECT count(*) FROM s0) AS n_added, 0 AS n_removed,
       CAST(0 AS BIGINT) AS is_current
UNION ALL
SELECT 1, (SELECT count(*) FROM s1),
       (SELECT count(*) FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM s0)),
       (SELECT count(*) FROM s0 WHERE doc_id NOT IN (SELECT doc_id FROM s1)),
       CAST(0 AS BIGINT)
UNION ALL
SELECT 2, (SELECT count(*) FROM s2),
       (SELECT count(*) FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM s1)),
       (SELECT count(*) FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM s2)),
       CAST(1 AS BIGINT)
"""


def store_conflict_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency contract of the CoW store, end to end: a
    SECOND live writer racing the same snapshot must get a typed
    :class:`mongraph_spark.sources.merge.CommitConflict` at claim time
    (fail-fast, before spending compute), and its clean retry via
    :func:`mongraph_spark.sources.merge.commit_with_retry` must recompute
    against the winner's committed snapshot — the Delta-style conflict
    protocol, driver-verifiable.

    Deterministic replay of the race: writer A claims the next version
    (``_next_version``) and stalls; writer B's upsert (+3 n_chars on
    doc_id%10==4) raises CommitConflict — counted — then A "crashes" (its
    claim is aged past CLAIM_TTL_S) and B's retry takes the stale claim
    over, clears A's leftover, and commits.  A second, uncontended upsert
    (+5 on doc_id%10==5) then advances the table again.  Output = final
    per-source profile + the observed conflict count + final version
    number; the oracle replays the expected final state in SQL, so a lost
    update, double-applied batch, or resurrected row breaks the hash.

    At scale the claim file is one O_EXCL create per commit on the table
    root (an object-store conditional PUT in production) — contention cost
    is per-COMMIT, never per-row, and losers fail before reading data."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_conflict_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)

    # writer A: claims v1, then stalls (simulated live writer mid-commit)
    ver_a = merge_store._next_version(root)
    batch_b = docs.filter(F.col("doc_id") % 10 == 4).withColumn(
        "n_chars", F.col("n_chars") + 3
    )
    n_conflicts = 0

    def b_upsert():
        return merge_store.upsert(spark, root, batch_b, key="doc_id")

    try:
        b_upsert()
    except merge_store.CommitConflict:
        n_conflicts += 1
    # A crashes; its claim ages out, B's retry takes over and commits
    claim = merge_store._claim_path(root, ver_a)
    os.utime(claim, (10.0, 10.0))
    merge_store.commit_with_retry(b_upsert, max_retries=3, backoff_s=0.01)
    # an uncontended follow-up commit
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") % 10 == 5).withColumn(
            "n_chars", F.col("n_chars") + 5
        ),
        key="doc_id",
    )
    final_v = int(merge_store.current_version(root).split("_")[1])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("doc_id"), F.col("n_chars"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
        )
        .cast("bigint")
        .alias("checksum"),
        F.lit(n_conflicts).cast("bigint").alias("n_conflicts"),
        F.lit(final_v).cast("bigint").alias("final_version"),
    )


def ivm_build_history(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """Build the canonical 3-version CoW history both IVM operators maintain
    against: v0 = documents (doc_id, source, n_chars); v1 = one upsert with
    value updates (doc_id%10==0: n_chars+13), GROUP-CHANGING updates
    (doc_id%10==1: source → 'moved') and inserts (doc_id%10==7 cloned at
    +IVM_ID_SHIFT, n_chars+1); v2 = a predicate delete (n_chars%5==0 on the
    current state).  Returns the store root (app-id + sf + tag namespaced;
    the history is READ-ONLY once built, so a completed build — marked by a
    ``_HISTORY_DONE`` sentinel written after v2 commits — is reused as-is:
    both IVM twins share one "shared"-tagged build per session instead of
    re-running the ~10-job 3-version construction each, and repeat runs of
    either skip it entirely.  A crashed partial build has no sentinel and
    is torn down and rebuilt."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(
        tempfile.gettempdir(), f"mg_ivm_{tag}_{app_id}_{sf_tag}"
    )
    done = os.path.join(root, "_HISTORY_DONE")
    if os.path.exists(done):
        return root
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)  # v0
    batch = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("n_chars", F.col("n_chars") + 13)
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 1).withColumn(
                "source", F.lit("moved")
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 7).select(
                (F.col("doc_id") + IVM_ID_SHIFT).alias("doc_id"),
                "source",
                (F.col("n_chars") + 1).alias("n_chars"),
            )
        )
    )
    merge_store.upsert(spark, root, batch, key="doc_id")  # v1
    merge_store.delete_where(spark, root, F.col("n_chars") % 5 == 0)  # v2
    with open(done, "w") as f:
        f.write("ok\n")
    return root


def ivm_signed_contribs(old_v: DataFrame, new_v: DataFrame) -> DataFrame:
    """CDC diff of two store versions exploded into SIGNED group
    contributions — the old row's group gets (−1, −old.n_chars), the new
    row's group gets (+1, +new.n_chars), unchanged rows emit nothing — so a
    group change is a −/+ pair landing in different groups.  ≤2 rows per
    CHANGED key, 0 per unchanged: refresh cost tracks the delta, never the
    base."""
    v0 = old_v.alias("old")
    v2 = new_v.alias("new")
    diff = v2.join(v0, F.col("new.doc_id") == F.col("old.doc_id"), "full_outer")
    changed = diff.filter(
        F.col("old.doc_id").isNull()
        | F.col("new.doc_id").isNull()
        | (F.col("new.source") != F.col("old.source"))
        | (F.col("new.n_chars") != F.col("old.n_chars"))
    )
    return changed.select(
        F.explode(
            F.array_compact(
                F.array(
                    F.when(
                        F.col("old.doc_id").isNotNull(),
                        F.struct(
                            F.col("old.source").alias("source"),
                            F.lit(-1).cast("long").alias("dc"),
                            (-F.col("old.n_chars")).cast("long").alias("dch"),
                        ),
                    ),
                    F.when(
                        F.col("new.doc_id").isNotNull(),
                        F.struct(
                            F.col("new.source").alias("source"),
                            F.lit(1).cast("long").alias("dc"),
                            F.col("new.n_chars").cast("long").alias("dch"),
                        ),
                    ),
                )
            )
        ).alias("c")
    ).select("c.source", "c.dc", "c.dch")


def ivm_agg_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an AGGREGATE view over the CoW store —
    the materialized-view refresh real pipelines run (the groupBy/agg
    sibling of relational.ivm_join_delta's join algebra): the view
    V(source) = (count(*), sum(n_chars)) is maintained from the store's
    CDC diff alone, never from a rescan of the base.

    Three-version history exercising every CDC class: v0 = documents;
    v1 = one upsert carrying value updates (doc_id%10==0: n_chars+13),
    GROUP-CHANGING updates (doc_id%10==1: source -> 'moved' — the case
    naive per-group arithmetic silently corrupts), and inserts
    (doc_id%10==7 cloned at +{IVM_ID_SHIFT} with n_chars+1); v2 = a
    predicate delete (n_chars%5==0 on the CURRENT state).  The CDC diff
    (full-outer join of read_version(0) and read_version(2) on the store
    key) is exploded into SIGNED group contributions — the old row's
    group gets (−1, −old.n_chars), the new row's group gets
    (+1, +new.n_chars), unchanged rows emit nothing — so a group change
    is just a −/+ pair landing in different groups.  ΔV is one agg over
    the contributions; maintained = V0 + ΔV is checked per group against
    the full recompute, with the equality emitted as ``identity_holds``.

    Scale shape: the diff joins two versions of the compacted keyed table
    (manifest-shared buckets; both sides co-bucketed on the key), the
    contribution explode is a map-only flatten (≤2 rows per CHANGED key,
    0 per unchanged), and ΔV aggregates |changed keys| rows — refresh
    cost tracks the delta, never the base, which is the entire point of
    IVM at 100 TB."""
    from mongraph_spark.sources import merge as merge_store

    root = ivm_build_history(spark, sf_dir, tag="shared")
    v0 = merge_store.read_version(spark, root, 0).drop("__bucket")
    v2 = merge_store.read_version(spark, root, 2).drop("__bucket")
    contribs = ivm_signed_contribs(v0, v2)
    dv = contribs.groupBy("source").agg(
        F.sum("dc").cast("long").alias("d_docs"),
        F.sum("dch").cast("long").alias("d_chars"),
    )
    view0 = v0.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_v0"),
        F.sum("n_chars").cast("long").alias("sum_chars_v0"),
    )
    full = v2.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_full"),
        F.sum("n_chars").cast("long").alias("sum_chars_full"),
    )
    out = (
        view0.join(full, "source", "full_outer")
        .join(dv, "source", "left")
        .na.fill(
            0,
            [
                "n_docs_v0",
                "sum_chars_v0",
                "n_docs_full",
                "sum_chars_full",
                "d_docs",
                "d_chars",
            ],
        )
    )
    maintained_n = F.col("n_docs_v0") + F.col("d_docs")
    maintained_s = F.col("sum_chars_v0") + F.col("d_chars")
    return out.select(
        "source",
        "n_docs_v0",
        "sum_chars_v0",
        "d_docs",
        "d_chars",
        maintained_n.cast("long").alias("n_docs_maintained"),
        maintained_s.cast("long").alias("sum_chars_maintained"),
        "n_docs_full",
        "sum_chars_full",
        (
            (maintained_n == F.col("n_docs_full"))
            & (maintained_s == F.col("sum_chars_full"))
        ).alias("identity_holds"),
    ).filter(  # drop all-zero phantom groups (group vanished in BOTH states)
        (F.col("n_docs_v0") != 0) | (F.col("n_docs_full") != 0)
    )


IVM_ID_SHIFT = 7_000_000

ORACLE_IVM_AGG = f"""
WITH s0 AS (SELECT doc_id, source, n_chars FROM documents),
s1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 1 THEN 'moved' ELSE source END AS source,
         CASE WHEN doc_id % 10 = 0 THEN n_chars + 13 ELSE n_chars END AS n_chars
  FROM s0
  UNION ALL
  SELECT doc_id + {IVM_ID_SHIFT}, source, n_chars + 1
  FROM s0 WHERE doc_id % 10 = 7
),
s2 AS (SELECT * FROM s1 WHERE n_chars % 5 != 0),
v0 AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_v0,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars_v0
  FROM s0 GROUP BY source
),
fullv AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_full,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars_full
  FROM s2 GROUP BY source
)
SELECT coalesce(v.source, f.source) AS source,
       coalesce(v.n_docs_v0, 0) AS n_docs_v0,
       coalesce(v.sum_chars_v0, 0) AS sum_chars_v0,
       coalesce(f.n_docs_full, 0) - coalesce(v.n_docs_v0, 0) AS d_docs,
       coalesce(f.sum_chars_full, 0) - coalesce(v.sum_chars_v0, 0) AS d_chars,
       coalesce(f.n_docs_full, 0) AS n_docs_maintained,
       coalesce(f.sum_chars_full, 0) AS sum_chars_maintained,
       coalesce(f.n_docs_full, 0) AS n_docs_full,
       coalesce(f.sum_chars_full, 0) AS sum_chars_full,
       TRUE AS identity_holds
FROM v0 v FULL OUTER JOIN fullv f ON v.source = f.source
"""


def store_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 assembled from the store's own
    change feed (round 10 — ``sources.merge.scd2_history`` over
    ``read_changes``): the warehouse dimension-build pattern, one row
    per (key, value-interval) with `_valid_from`/`_valid_to` commit
    versions and `_is_current`, derived with one bounded per-key window
    over the CDF event sequence.

    Over the canonical 3-version IVM history every interval class
    appears: born-at-init current rows, init rows closed by the v1
    update (never current), v1 states still current, v1 states closed by
    the v2 delete, init rows deleted at v2 untouched in between, and v1
    inserts.  Hash-asserted per (valid_from, valid_to, is_current):
    interval counts and n_chars sums — one misclassified interval moves
    two groups."""
    from mongraph_spark.sources import merge as merge_store

    root = ivm_build_history(spark, sf_dir, tag="shared")
    dim = merge_store.scd2_history(spark, root)
    return dim.groupBy("_valid_from", "_valid_to", "_is_current").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    ).select(
        F.col("_valid_from").alias("valid_from"),
        F.coalesce(F.col("_valid_to"), F.lit(-1)).cast("long").alias("valid_to"),
        F.col("_is_current").alias("is_current"),
        "n_intervals",
        "sum_chars",
    )


ORACLE_SCD2 = f"""
WITH s0 AS (SELECT doc_id, source, n_chars FROM documents),
s1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 1 THEN 'moved' ELSE source END AS source,
         CASE WHEN doc_id % 10 = 0 THEN n_chars + 13 ELSE n_chars END AS n_chars
  FROM s0
  UNION ALL
  SELECT doc_id + {IVM_ID_SHIFT}, source, n_chars + 1
  FROM s0 WHERE doc_id % 10 = 7
),
-- keys whose v1 upsert actually changed the row (opens a new interval)
chg AS (
  SELECT doc_id FROM s0
  WHERE doc_id % 10 = 0 OR (doc_id % 10 = 1 AND source <> 'moved')
),
dead AS (SELECT doc_id FROM s1 WHERE n_chars % 5 = 0),
intervals AS (
  -- init rows of unchanged keys: closed only by the v2 delete (if dead)
  SELECT 0 AS valid_from,
         CASE WHEN d.doc_id IS NOT NULL THEN 2 ELSE -1 END AS valid_to,
         d.doc_id IS NULL AS is_current, s0.n_chars
  FROM s0 LEFT JOIN dead d USING (doc_id)
  WHERE doc_id NOT IN (SELECT doc_id FROM chg)
  UNION ALL
  -- init rows of changed keys: closed by the v1 update, never current
  SELECT 0, 1, FALSE, n_chars FROM s0 WHERE doc_id IN (SELECT doc_id FROM chg)
  UNION ALL
  -- v1 states of changed keys + v1 inserts: closed by v2 delete if dead
  SELECT 1,
         CASE WHEN d.doc_id IS NOT NULL THEN 2 ELSE -1 END,
         d.doc_id IS NULL, s1.n_chars
  FROM s1 LEFT JOIN dead d USING (doc_id)
  WHERE s1.doc_id IN (SELECT doc_id FROM chg)
     OR s1.doc_id > {IVM_ID_SHIFT}
)
SELECT CAST(valid_from AS BIGINT) AS valid_from,
       CAST(valid_to AS BIGINT) AS valid_to,
       is_current,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM intervals GROUP BY 1, 2, 3
"""


def store_merge_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE schema evolution (round 10 — the Delta ``mergeSchema``
    behavior) composed with drop-column reincarnation, driver-verifiable:
    v0 init (doc_id, source, n_chars) → v1 ``drop_column('n_chars')``
    (tombstoned; original bytes still on disk) → a single
    ``merge_into(..., schema_evolution=True)`` whose source carries the
    dropped name back: the evolution auto-re-adds the column through the
    add_column claim protocol (v2, NULL version-fenced default — safe
    REINCARNATION, not resurrection) and the merge itself commits as v3,
    setting n_chars = 5 for doc_id % 10 == 3 and inserting one shifted
    doc carrying 77.

    Hash-asserted per source: doc counts, how many docs carry a value
    (exactly the %10==3 set + the insert — if ONE original n_chars byte
    resurrected, n_with_val explodes), the value sum, the v1/v2/v3 op
    sequence proving the evolution rode the standard protocol, final
    version 3."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_mrgevo_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.drop_column(root, "n_chars")
    src = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .select("doc_id", "source", F.lit(5).cast("long").alias("n_chars"))
        .unionByName(
            spark.createDataFrame(
                [(IVM_ID_SHIFT + 1, "evolved", 77)],
                "doc_id long, source string, n_chars long",
            )
        )
    )
    merge_store.merge_into(
        spark,
        root,
        src,
        when_matched_set={"n_chars": "src_n_chars"},
        schema_evolution=True,
    )
    ops = [
        (merge_store._read_commit(root, f"v_0000{n}") or {}).get("op", "")
        for n in (1, 2, 3)
    ]
    final_v = int(merge_store.current_version(root).split("_")[1])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("n_chars").cast("bigint").alias("n_with_val"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("bigint").alias("sum_vals"),
        F.lit("|".join(ops)).alias("op_sequence"),
        F.lit(final_v).cast("bigint").alias("final_version"),
    )


ORACLE_MERGE_EVOLVE = f"""
WITH final AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 3 THEN 5 END AS n_chars
  FROM documents
  UNION ALL
  SELECT {IVM_ID_SHIFT} + 1, 'evolved', 77
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(n_chars) AS BIGINT) AS n_with_val,
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_vals,
       'drop_column|add_column|merge' AS op_sequence,
       CAST(3 AS BIGINT) AS final_version
FROM final GROUP BY source
"""


def store_read_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store's first-class Change Data Feed (round 10 —
    ``sources.merge.read_changes``, the Delta ``table_changes`` shape)
    over the canonical 3-version IVM history: the feed for
    ``(since_version=0, current]`` must classify v1's upsert into exact
    insert / update_preimage / update_postimage rows (unchanged-in-place
    rows never appear — the bucket-scoped diff drops them) and v2's
    predicate delete into delete rows carrying the preimage values.

    Hash-asserted per (commit_version, change_type): row count and
    n_chars sum — the preimage/postimage split means a single off-by-one
    in the diff classification shifts two groups at once.

    Scale shape: each transition reads ONLY the commit's touched buckets
    of the two adjacent versions (manifest-filtered) and full-outer
    joins them on the bucket key — at 100 TB a trickle commit's feed
    costs two bucket reads, never two table scans."""
    from mongraph_spark.sources import merge as merge_store

    root = ivm_build_history(spark, sf_dir, tag="shared")
    feed = merge_store.read_changes(spark, root, since_version=0)
    return (
        feed.groupBy("_commit_version", "_change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .select(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
            "n_rows",
            "sum_chars",
        )
    )


ORACLE_READ_CHANGES = f"""
WITH s0 AS (SELECT doc_id, source, n_chars FROM documents),
s1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 1 THEN 'moved' ELSE source END AS source,
         CASE WHEN doc_id % 10 = 0 THEN n_chars + 13 ELSE n_chars END AS n_chars
  FROM s0
  UNION ALL
  SELECT doc_id + {IVM_ID_SHIFT}, source, n_chars + 1
  FROM s0 WHERE doc_id % 10 = 7
),
ch1 AS (
  SELECT 'update_preimage' AS change_type, n_chars FROM s0 WHERE doc_id % 10 = 0
  UNION ALL
  SELECT 'update_postimage', n_chars + 13 FROM s0 WHERE doc_id % 10 = 0
  UNION ALL
  SELECT 'update_preimage', n_chars FROM s0
  WHERE doc_id % 10 = 1 AND source <> 'moved'
  UNION ALL
  SELECT 'update_postimage', n_chars FROM s0
  WHERE doc_id % 10 = 1 AND source <> 'moved'
  UNION ALL
  SELECT 'insert', n_chars + 1 FROM s0 WHERE doc_id % 10 = 7
),
ch2 AS (SELECT 'delete' AS change_type, n_chars FROM s1 WHERE n_chars % 5 = 0)
SELECT CAST(1 AS BIGINT) AS commit_version, change_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM ch1 GROUP BY change_type
UNION ALL
SELECT CAST(2 AS BIGINT), change_type,
       CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT)
FROM ch2 GROUP BY change_type
"""


ORACLE_CONFLICT_RETRY = """
WITH final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id % 10 = 4 THEN 3
                        WHEN doc_id % 10 = 5 THEN 5 ELSE 0 END AS n_chars
  FROM documents
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(n_chars AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT) AS checksum,
       CAST(1 AS BIGINT) AS n_conflicts,
       CAST(2 AS BIGINT) AS final_version
FROM final
GROUP BY source
"""


ORACLE_MERGE_INTO = """
WITH merged AS (
  -- survivors: not deleted; %10==0 rows updated
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id % 10 != 1
  UNION ALL
  -- inserts: shifted copies of %10==2 (no target match at doc_id+5e6)
  SELECT doc_id + 5000000 AS doc_id, source, n_chars
  FROM documents WHERE doc_id % 10 = 2
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(n_chars AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT) AS checksum
FROM merged GROUP BY source
"""


def store_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end exercise of merge-on-read DELETE
    (:func:`mongraph_spark.sources.merge.delete_where_dv`): build the
    documents store, vector-delete every doc whose n_chars is divisible
    by 7 (NO bucket is rewritten — the data files carry forward by
    manifest reference and a per-bucket key sidecar masks the rows),
    upsert shifted %10==3 docs (n_chars+1000 — which RESURRECTS the
    vector-deleted keys among them: the upsert applies-and-clears its
    buckets' vectors), then vector-delete lang='de' on top (vectors
    accumulate across versions).  Output = per-source profile of the
    final logical table; the oracle replays the three mutations in plain
    SQL over ``documents``, so a reader that misses a vector, a writer
    that fails to clear one (killing the resurrected keys), or a carry
    that drops one breaks count, char-sum, or checksum.

    Scale posture: the whole point — the first delete touches ~1/7 of
    rows spread over EVERY bucket, which copy-on-write would answer with
    a full-table rewrite; the vector write is one predicate scan plus a
    KB-scale sidecar, and ``compact`` materializes at maintenance time
    (pinned in tests, not here)."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents")
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_dv_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.delete_where_dv(spark, root, F.col("n_chars") % 7 == 0)
    updates = docs.filter(F.col("doc_id") % 10 == 3).withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    merge_store.upsert(spark, root, updates, key="doc_id")
    merge_store.delete_where_dv(spark, root, F.col("lang") == "de")
    final = merge_store.read_current(spark, root).drop("__bucket")
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("doc_id"), F.col("n_chars"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
        )
        .cast("bigint")
        .alias("checksum"),
    )


ORACLE_DELETION_VECTORS = """
WITH after_dv1 AS (
  SELECT * FROM documents WHERE NOT (n_chars % 7 = 0)
),
upserted AS (
  -- upsert replaces by key over the DV-applied state: survivors that are
  -- not update keys, plus ALL update rows (resurrection included)
  SELECT doc_id, lang, source, n_chars FROM after_dv1 WHERE doc_id % 10 != 3
  UNION ALL
  SELECT doc_id, lang, source, n_chars + 1000 AS n_chars
  FROM documents WHERE doc_id % 10 = 3
),
final AS (
  SELECT * FROM upserted WHERE NOT (lang = 'de')
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(n_chars AS VARCHAR)), 1, 8))::BIGINT) AS BIGINT) AS checksum
FROM final GROUP BY source
"""


# -- Z-order layout & data skipping ---------------------------------------------------

ZORDER_BITS = 4  # 16 levels per dimension -> 256 z-cells -> 64 files


def _interleave(cd, cp):
    """Bit-interleave two 4-bit codes (cd gets odd positions) using pure
    integer arithmetic — ``(code div 2^i) mod 2 * 2^k`` — identical in
    Spark and DuckDB, no engine-specific bit operators."""
    z = F.lit(0)
    for i in range(ZORDER_BITS):
        z = z + ((cd / F.lit(2**i)).cast("long") % 2) * F.lit(2 ** (2 * i + 1))
        z = z + ((cp / F.lit(2**i)).cast("long") % 2) * F.lit(2 ** (2 * i))
    return z


def zorder_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout planning over lineitem on
    (l_shipdate, l_partkey) with the resulting per-file min/max zone map —
    the data-skipping foundation under Delta OPTIMIZE ZORDER / Iceberg
    sort orders: interleaving the bits of both dimension codes makes file
    ranges tight in BOTH dimensions at once, so a predicate on EITHER
    column prunes ~sqrt of the files a single-column sort would leave hot.

    Scale shape: one 6-value min/max aggregation (broadcast back as a
    1-row cross join), then the code/z-value/file assignment is pure
    map-side integer arithmetic — NO global sort: files are equal z-RANGES
    (``z div 4``), so the layout decision is embarrassingly parallel and
    a real writer range-partitions on z with the same key.  The output is
    the zone map itself (per-file min/max of both dims + row count): the
    judge of layout quality, and exactly the metadata a scan planner
    reads to skip files.  All-integer arithmetic end to end — exact
    cross-engine hashes, no float rounding anywhere."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01")).alias("d"),
        F.col("l_partkey").alias("p"),
    )
    rng = li.agg(
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
        F.min("p").alias("pmin"),
        F.max("p").alias("pmax"),
    )
    # `div` (true integer division) — a double `/` + cast could land one
    # off DuckDB's `//` when the quotient is exactly integral
    coded = li.crossJoin(F.broadcast(rng)).select(
        "d",
        "p",
        F.expr(f"(d - dmin) * {2**ZORDER_BITS} div (dmax - dmin + 1)").alias("cd"),
        F.expr(f"(p - pmin) * {2**ZORDER_BITS} div (pmax - pmin + 1)").alias("cp"),
    )
    return (
        coded.withColumn("z", _interleave(F.col("cd"), F.col("cp")))
        .withColumn("file_id", (F.col("z") / 4).cast("long"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("d").alias("min_day"),
            F.max("d").alias("max_day"),
            F.min("p").cast("bigint").alias("min_part"),
            F.max("p").cast("bigint").alias("max_part"),
        )
    )


def _zorder_oracle() -> str:
    z_terms = []
    for i in range(ZORDER_BITS):
        z_terms.append(f"((cd // {2**i}) % 2) * {2 ** (2 * i + 1)}")
        z_terms.append(f"((cp // {2**i}) % 2) * {2 ** (2 * i)}")
    z_sql = " + ".join(z_terms)
    lv = 2**ZORDER_BITS
    return f"""
WITH dims AS (
  SELECT datediff('day', DATE '1992-01-01', l_shipdate) AS d, l_partkey AS p
  FROM lineitem
),
rng AS (SELECT min(d) AS dmin, max(d) AS dmax, min(p) AS pmin, max(p) AS pmax FROM dims),
coded AS (
  SELECT d, p,
         CAST((d - dmin) * {lv} // (dmax - dmin + 1) AS BIGINT) AS cd,
         CAST((p - pmin) * {lv} // (pmax - pmin + 1) AS BIGINT) AS cp
  FROM dims, rng
),
zed AS (SELECT d, p, ({z_sql}) AS z FROM coded)
SELECT CAST(z // 4 AS BIGINT) AS file_id, count(*) AS n_rows,
       min(d) AS min_day, max(d) AS max_day,
       CAST(min(p) AS BIGINT) AS min_part, CAST(max(p) AS BIGINT) AS max_part
FROM zed
GROUP BY 1
"""


ORACLE_ZORDER = _zorder_oracle()


# -- measured pruning benefit: z-order vs single-column sort ----------------------

PRUNE_FILES = 256  # files per layout (equal counts -> fair comparison)
PRUNE_QUERIES = 20  # deterministic 2-D box workload
PRUNE_DAY_SPAN = 30  # box: 30-day window ...
PRUNE_PART_PCT = 10  # ... x 10% of the part-key range


def zorder_pruning_benefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured data-skipping benefit — the companion that justifies
    zorder_data_skipping with a NUMBER instead of an argument: build the
    per-file zone maps of two equal-file-count layouts (Morton z-order vs
    a plain sort on ship-day), replay a deterministic workload of
    {PRUNE_QUERIES} two-dimensional box queries (30-day × 10%-of-parts),
    and count the files whose zone map each query must scan.  The
    skip-rate gap is exactly what Delta/Iceberg OPTIMIZE ZORDER buys on
    multi-dimensional predicates; the day-sorted layout wins only if
    queries never constrain the second column.

    All-integer: codes, z-values, file ids, box bounds, and the
    intersects test; the workload derives from the same 1-row min/max
    agg as the layout.  The linear layout's row_number IS a global sort —
    that is what a sort-by-day writer does (and the z-order side's
    equal-z-range files need none; the contrast is part of the point)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01")).alias("d"),
        F.col("l_partkey").alias("p"),
    )
    rng = li.agg(
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
        F.min("p").alias("pmin"),
        F.max("p").alias("pmax"),
        F.count(F.lit(1)).alias("nrows"),
    )
    lv = 2**ZORDER_BITS
    coded = li.crossJoin(F.broadcast(rng)).select(
        "d",
        "p",
        "dmin",
        "dmax",
        "pmin",
        "pmax",
        "nrows",
        F.expr(f"(d - dmin) * {lv} div (dmax - dmin + 1)").alias("cd"),
        F.expr(f"(p - pmin) * {lv} div (pmax - pmin + 1)").alias("cp"),
    )
    zfiles = (
        coded.withColumn("z", _interleave(F.col("cd"), F.col("cp")))
        .withColumn(
            "file_id", F.expr(f"z * {PRUNE_FILES} div {lv * lv}").cast("long")
        )
        .groupBy("file_id")
        .agg(
            F.min("d").alias("min_d"),
            F.max("d").alias("max_d"),
            F.min("p").alias("min_p"),
            F.max("p").alias("max_p"),
        )
        .withColumn("layout", F.lit("zorder"))
    )
    w = Window.partitionBy(const_part(F.col("d"))).orderBy("d", "p")
    lfiles = (
        coded.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "file_id",
            F.expr(f"(rn - 1) * {PRUNE_FILES} div nrows").cast("long"),
        )
        .groupBy("file_id")
        .agg(
            F.min("d").alias("min_d"),
            F.max("d").alias("max_d"),
            F.min("p").alias("min_p"),
            F.max("p").alias("max_p"),
        )
        .withColumn("layout", F.lit("day_sorted"))
    )
    zones = zfiles.unionByName(lfiles)
    queries = (
        spark.range(PRUNE_QUERIES)
        .select(F.col("id").cast("long").alias("q"))
        .crossJoin(F.broadcast(rng))
        .select(
            "q",
            (F.col("dmin") + (F.col("q") * 37) % (F.col("dmax") - F.col("dmin") - PRUNE_DAY_SPAN + 1)).alias("q_dlo"),
            F.expr("pmin + ((q * 53) % 90) * (pmax - pmin) DIV 100").cast("long").alias("q_plo"),
            F.expr(f"(pmax - pmin) * {PRUNE_PART_PCT} DIV 100").cast("long").alias("q_pw"),
        )
        .select(
            "q",
            "q_dlo",
            (F.col("q_dlo") + PRUNE_DAY_SPAN - 1).alias("q_dhi"),
            "q_plo",
            (F.col("q_plo") + F.col("q_pw")).alias("q_phi"),
        )
    )
    hits = zones.crossJoin(F.broadcast(queries)).filter(
        (F.col("min_d") <= F.col("q_dhi"))
        & (F.col("max_d") >= F.col("q_dlo"))
        & (F.col("min_p") <= F.col("q_phi"))
        & (F.col("max_p") >= F.col("q_plo"))
    )
    per_layout_files = zones.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_files")
    )
    return (
        hits.groupBy("layout")
        .agg(F.count(F.lit(1)).alias("files_scanned_total"))
        .join(per_layout_files, "layout")
        .select(
            "layout",
            "n_files",
            F.lit(PRUNE_QUERIES).cast("bigint").alias("n_queries"),
            "files_scanned_total",
            F.expr(
                f"CAST(10000 - (10000 * files_scanned_total) "
                f"DIV (n_files * {PRUNE_QUERIES}) AS BIGINT)"
            ).alias("skip_bp"),
        )
    )


def _pruning_oracle() -> str:
    z_terms = []
    for i in range(ZORDER_BITS):
        z_terms.append(f"((cd // {2**i}) % 2) * {2 ** (2 * i + 1)}")
        z_terms.append(f"((cp // {2**i}) % 2) * {2 ** (2 * i)}")
    z_sql = " + ".join(z_terms)
    lv = 2**ZORDER_BITS
    return f"""
WITH dims AS (
  SELECT datediff('day', DATE '1992-01-01', l_shipdate) AS d, l_partkey AS p
  FROM lineitem
),
rng AS (SELECT min(d) AS dmin, max(d) AS dmax, min(p) AS pmin, max(p) AS pmax,
               count(*) AS nrows FROM dims),
coded AS (
  SELECT d, p, dmin, dmax, pmin, pmax, nrows,
         CAST((d - dmin) * {lv} // (dmax - dmin + 1) AS BIGINT) AS cd,
         CAST((p - pmin) * {lv} // (pmax - pmin + 1) AS BIGINT) AS cp
  FROM dims, rng
),
zfiles AS (
  SELECT 'zorder' AS layout, CAST(z * {PRUNE_FILES} // {lv * lv} AS BIGINT) AS file_id,
         min(d) AS min_d, max(d) AS max_d, min(p) AS min_p, max(p) AS max_p
  FROM (SELECT d, p, ({z_sql}) AS z FROM coded) GROUP BY 2
),
lfiles AS (
  SELECT 'day_sorted' AS layout,
         CAST((rn - 1) * {PRUNE_FILES} // nrows AS BIGINT) AS file_id,
         min(d) AS min_d, max(d) AS max_d, min(p) AS min_p, max(p) AS max_p
  FROM (SELECT d, p, nrows,
               row_number() OVER (ORDER BY d, p) AS rn FROM coded)
  GROUP BY 2
),
zones AS (SELECT * FROM zfiles UNION ALL SELECT * FROM lfiles),
queries AS (
  SELECT q,
         q_dlo, q_dlo + {PRUNE_DAY_SPAN} - 1 AS q_dhi,
         q_plo, q_plo + q_pw AS q_phi
  FROM (
    SELECT q,
           dmin + (q * 37) % (dmax - dmin - {PRUNE_DAY_SPAN} + 1) AS q_dlo,
           CAST(pmin + ((q * 53) % 90) * (pmax - pmin) // 100 AS BIGINT) AS q_plo,
           CAST((pmax - pmin) * {PRUNE_PART_PCT} // 100 AS BIGINT) AS q_pw
    FROM (SELECT unnest(range({PRUNE_QUERIES})) AS q), rng
  )
),
hits AS (
  SELECT z.layout FROM zones z, queries qq
  WHERE z.min_d <= qq.q_dhi AND z.max_d >= qq.q_dlo
    AND z.min_p <= qq.q_phi AND z.max_p >= qq.q_plo
),
pf AS (SELECT layout, count(*) AS n_files FROM zones GROUP BY layout)
SELECT h.layout, pf.n_files,
       CAST({PRUNE_QUERIES} AS BIGINT) AS n_queries,
       count(*) AS files_scanned_total,
       CAST(10000 - (10000 * count(*)) // (pf.n_files * {PRUNE_QUERIES}) AS BIGINT)
         AS skip_bp
FROM hits h JOIN pf ON h.layout = pf.layout
GROUP BY h.layout, pf.n_files
"""


ORACLE_PRUNING = _pruning_oracle()


# -- population-stability-index drift monitor ------------------------------------

PSI_BINS = 10
PSI_SPLIT = "2024-01-16"  # ref = first half of the window, cur = second
PSI_ALERT_X1E6 = 100_000  # the standard PSI > 0.1 "investigate" threshold


def quality_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type: the production drift
    metric for ML feature monitoring —  PSI = Σ_bins (p−q)·ln(p/q)  over a
    10-bin equi-width histogram of the value column, reference window vs
    current window (fixed mid-month split), with add-one smoothing so
    empty bins stay defined.  PSI > 0.1 flags the type for investigation,
    > 0.25 means the feature shifted.

    Engine-deterministic: bins are integer (exact-cents snap, one global
    min/max), shares are single divides of exact integers, each bin's term
    is floored to ×1e6 BEFORE summation (integer sum — no accumulation-
    order exposure), and the per-term ln/multiply chain is the identical
    expression tree in both engines.

    Scale shape: ONE (type, window, bin) combiner-friendly aggregation —
    the same O(scopes × bins) exchange as the histogram sketch — then
    |types|×bins rows of constant arithmetic.  This runs per-day against
    100 TB exactly this cheaply; the alternative (KS tests on raw data)
    needs a sort per feature."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("ts").cast("date") < F.lit(PSI_SPLIT)).cast("int").alias("is_ref"),
    )
    rng = ev.agg(F.min("cents").alias("minc"), F.max("cents").alias("maxc"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        "event_type",
        "is_ref",
        F.expr(f"(cents - minc) * {PSI_BINS} div (maxc - minc + 1)").alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("is_ref").cast("long").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("long").alias("n_cur"),
    )
    # add-one smoothing + per-type totals; every bin 0..9 must exist, so
    # build the full (type, bin) grid before the term arithmetic
    types = counts.select("event_type").distinct()
    grid = types.crossJoin(
        spark.range(PSI_BINS).select(F.col("id").cast("long").alias("bin"))
    )
    full = grid.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        (F.coalesce("n_ref", F.lit(0)) + 1).alias("r"),
        (F.coalesce("n_cur", F.lit(0)) + 1).alias("c"),
    )
    tot = full.groupBy("event_type").agg(
        F.sum("r").alias("tr"), F.sum("c").alias("tc")
    )
    term = (
        (F.col("r") / F.col("tr") - F.col("c") / F.col("tc"))
        * F.log((F.col("r") / F.col("tr")) / (F.col("c") / F.col("tc")))
    )
    return (
        full.join(tot, "event_type")
        .withColumn("term_x1e6", F.floor(F.lit(1e6) * term).cast("long"))
        .groupBy("event_type")
        .agg(
            F.sum("term_x1e6").cast("long").alias("psi_x1e6"),
            (F.sum("r") - PSI_BINS).cast("long").alias("n_ref"),
            (F.sum("c") - PSI_BINS).cast("long").alias("n_cur"),
        )
        .withColumn(
            "drift_flag", (F.col("psi_x1e6") > PSI_ALERT_X1E6).cast("int")
        )
    )


ORACLE_PSI = f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN CAST(ts AS DATE) < DATE '{PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
  FROM events
), rng AS (SELECT min(cents) AS minc, max(cents) AS maxc FROM ev),
binned AS (
  SELECT event_type, is_ref,
         (cents - minc) * {PSI_BINS} // (maxc - minc + 1) AS bin
  FROM ev CROSS JOIN rng
), counts AS (
  SELECT event_type, bin,
         CAST(sum(is_ref) AS BIGINT) AS n_ref,
         CAST(sum(1 - is_ref) AS BIGINT) AS n_cur
  FROM binned GROUP BY 1, 2
), grid AS (
  SELECT event_type, g.bin
  FROM (SELECT DISTINCT event_type FROM counts)
  CROSS JOIN (SELECT unnest(range({PSI_BINS})) AS bin) g
), full_g AS (
  SELECT g.event_type, g.bin,
         coalesce(c.n_ref, 0) + 1 AS r, coalesce(c.n_cur, 0) + 1 AS c
  FROM grid g LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.bin = g.bin
), tot AS (
  SELECT event_type, sum(r) AS tr, sum(c) AS tc FROM full_g GROUP BY 1
)
SELECT f.event_type,
       CAST(sum(CAST(floor(1000000.0 *
         ((r / CAST(tr AS DOUBLE) - c / CAST(tc AS DOUBLE))
          * ln((r / CAST(tr AS DOUBLE)) / (c / CAST(tc AS DOUBLE)))))
         AS BIGINT)) AS BIGINT) AS psi_x1e6,
       CAST(sum(r) - {PSI_BINS} AS BIGINT) AS n_ref,
       CAST(sum(c) - {PSI_BINS} AS BIGINT) AS n_cur,
       CAST(CASE WHEN sum(CAST(floor(1000000.0 *
         ((r / CAST(tr AS DOUBLE) - c / CAST(tc AS DOUBLE))
          * ln((r / CAST(tr AS DOUBLE)) / (c / CAST(tc AS DOUBLE)))))
         AS BIGINT)) > {PSI_ALERT_X1E6} THEN 1 ELSE 0 END AS INT) AS drift_flag
FROM full_g f JOIN tot t ON f.event_type = t.event_type
GROUP BY f.event_type
"""


# -- bloom-filter data skipping --------------------------------------------------

BLOOM_NB = 16  # store buckets (o_custkey % 16)
BLOOM_WORDS = 16
BLOOM_WBITS = 62  # bits per word kept < 2^62 so masks stay positive BIGINT
BLOOM_M = BLOOM_WORDS * BLOOM_WBITS  # 992 bits (~10+ bits/key at sf0.01)
BLOOM_PROBES = 30  # 30 present custkeys + 30 absent ones


def bloom_filter_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter data skipping for point lookups — the metadata that
    min/max zone maps (see :func:`zorder_data_skipping`) cannot provide
    for high-cardinality keys: per-bucket 248-bit blooms (4×62-bit words,
    2 md5-derived hashes) over o_custkey, probed with 60 keys.  Each probe
    reports how many of the 16 buckets the bloom says MAY contain the key
    vs. the single bucket that actually does — i.e. exactly how many
    bucket reads the filter skips, false positives included.

    Engine-deterministic: hashes are md5 prefixes, bit masks are exact
    powers of two ≤ 2^61, and the filter words are integer bit_or
    aggregates — no floats anywhere.

    Scale shape: the build is one combiner-friendly (bucket, word) bit_or
    aggregation over the distinct keys (bloom words OR associatively, so
    partial aggregation absorbs everything map-side — this mergeability
    is why blooms work as distributed file metadata); the probe is a
    16-row broadcast against the probe set.  At 100 TB the bloom table
    stays bytes-per-file while the data grows — the whole point."""
    orders = read_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_custkey").alias("key")).distinct().withColumn(
        "bucket", F.col("key") % BLOOM_NB
    )

    def bit_of(col: F.Column, salt: int) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"#{salt}"))), 1, 8),
                16,
                10,
            ).cast("long")
            % BLOOM_M
        )

    def word_mask(bit: F.Column) -> tuple[F.Column, F.Column]:
        return (
            F.floor(bit / BLOOM_WBITS).cast("int"),
            F.pow(F.lit(2.0), bit % BLOOM_WBITS).cast("long"),
        )

    bits = keys.select(
        "bucket", F.explode(F.array(bit_of(F.col("key"), 1), bit_of(F.col("key"), 2))).alias("bit")
    )
    w, m = word_mask(F.col("bit"))
    blooms = (
        bits.select("bucket", w.alias("word"), m.alias("mask"))
        .groupBy("bucket")
        .agg(
            *[
                F.bit_or(
                    F.when(F.col("word") == i, F.col("mask")).otherwise(F.lit(0))
                ).alias(f"w{i}")
                for i in range(BLOOM_WORDS)
            ]
        )
    )
    probes = (
        spark.range(1, BLOOM_PROBES + 1)
        .union(spark.range(1_000_001, 1_000_001 + BLOOM_PROBES))
        .select(F.col("id").alias("probe_key"))
    )
    b1, b2 = bit_of(F.col("probe_key"), 1), bit_of(F.col("probe_key"), 2)
    w1, m1 = word_mask(b1)
    w2, m2 = word_mask(b2)
    probed = probes.crossJoin(F.broadcast(blooms)).select(
        "probe_key",
        "bucket",
        (
            (F.element_at(F.array(*[F.col(f"w{i}") for i in range(BLOOM_WORDS)]), w1 + 1).bitwiseAND(m1) != 0)
            & (F.element_at(F.array(*[F.col(f"w{i}") for i in range(BLOOM_WORDS)]), w2 + 1).bitwiseAND(m2) != 0)
        ).cast("long").alias("maybe"),
    )
    actual = keys.select(F.col("key").alias("probe_key")).withColumn(
        "n_actual", F.lit(1).cast("long")
    )
    return (
        probed.groupBy("probe_key")
        .agg(F.sum("maybe").cast("long").alias("n_maybe"))
        .join(actual, "probe_key", "left")
        .select(
            "probe_key",
            F.coalesce("n_actual", F.lit(0)).cast("long").alias("n_actual"),
            "n_maybe",
            (F.lit(BLOOM_NB) - F.col("n_maybe")).cast("long").alias("n_skipped"),
        )
    )


def _bloom_oracle() -> str:
    def bit_sql(expr: str, salt: int) -> str:
        return (
            f"(('0x' || substr(md5(CAST({expr} AS VARCHAR) || '#{salt}'), 1, 8))::BIGINT"
            f" % {BLOOM_M})"
        )

    words_sel = ", ".join(
        f"bit_or(CASE WHEN bit // {BLOOM_WBITS} = {i}"
        f" THEN CAST(pow(2.0, bit % {BLOOM_WBITS}) AS BIGINT) ELSE 0 END) AS w{i}"
        for i in range(BLOOM_WORDS)
    )
    warr = "[" + ", ".join(f"w{i}" for i in range(BLOOM_WORDS)) + "]"
    b1, b2 = bit_sql("probe_key", 1), bit_sql("probe_key", 2)
    return f"""
WITH keys AS (
  SELECT DISTINCT o_custkey AS key, o_custkey % {BLOOM_NB} AS bucket FROM orders
), bits AS (
  SELECT bucket, {bit_sql("key", 1)} AS bit FROM keys
  UNION ALL
  SELECT bucket, {bit_sql("key", 2)} AS bit FROM keys
), blooms AS (
  SELECT bucket, {words_sel} FROM bits GROUP BY bucket
), probes AS (
  SELECT unnest(range(1, {BLOOM_PROBES + 1})) AS probe_key
  UNION ALL
  SELECT unnest(range(1000001, {1000001 + BLOOM_PROBES})) AS probe_key
), probed AS (
  SELECT probe_key, bucket,
         CASE WHEN ({warr}[CAST({b1} // {BLOOM_WBITS} AS INT) + 1]
                    & CAST(pow(2.0, {b1} % {BLOOM_WBITS}) AS BIGINT)) <> 0
               AND ({warr}[CAST({b2} // {BLOOM_WBITS} AS INT) + 1]
                    & CAST(pow(2.0, {b2} % {BLOOM_WBITS}) AS BIGINT)) <> 0
              THEN 1 ELSE 0 END AS maybe
  FROM probes CROSS JOIN blooms
)
SELECT p.probe_key,
       CAST(CASE WHEN k.key IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS n_actual,
       CAST(sum(maybe) AS BIGINT) AS n_maybe,
       CAST({BLOOM_NB} - sum(maybe) AS BIGINT) AS n_skipped
FROM probed p LEFT JOIN keys k ON p.probe_key = k.key
GROUP BY p.probe_key, k.key
"""


ORACLE_BLOOM = _bloom_oracle()


def store_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based VACUUM + orphan GC for the CoW store, driver-verifiable —
    the ``VACUUM ... RETAIN n HOURS`` operational contract a shared 100 TB
    table needs (count-based ``store_history`` vacuuming keeps N versions;
    real deployments reason in wall-clock).

    Deterministic scenario (injected ``now``, injected commit-record
    timestamps — the one clock ``read_as_of`` also travels on): build
    v0 init → v1 rebucket (full rewrite: v0 becomes unreferenced) →
    v2 upsert (+11 n_chars on doc_id==1 — ONE key, so exactly bucket 2 of
    8 rewrites and the other 7 keep referencing v1: the structural-sharing
    retention is pinned at every SF, not a row-count accident), tag
    "checkpoint" → v3 upsert (+13 on doc_id==2, bucket 5, committed
    through the REBASE OCC path — the staging + serializability-check
    protocol, uncontended here), age
    v0/v1/v2 out of the window, plant an aged crashed-writer orphan
    (claimed v4 dir + claim file), then ``vacuum_retention``.  Expected,
    all asserted through the oracle hash: v0 removed (age), v1 retained
    (structural sharing — v3's manifest still references its untouched
    buckets), v2 retained (tag), v3 retained (current), the orphan
    collected, the tag still readable, and time travel to v0 now failing.

    At 100 TB this is O(#versions + #tags) metadata work plus unlinks —
    no data scan; the query's Spark work is only the final-state profile."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_vacret_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=16)
    merge_store.rebucket(spark, root, n_buckets=8)
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 1).withColumn(
            "n_chars", F.col("n_chars") + 11
        ),
        key="doc_id",
    )
    merge_store.create_tag(root, "checkpoint")
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 2).withColumn(
            "n_chars", F.col("n_chars") + 13
        ),
        key="doc_id",
        occ="rebase",
    )
    now, old = 1_000_000.0, 500.0
    for v in ("v_00000", "v_00001", "v_00002"):
        # age via the commit record — vacuum_retention and read_as_of share
        # ONE commit clock (_commit_ts); manifest mtime no longer moves it
        merge_store._set_commit_ts(root, v, old)
    # aged crashed writer: claimed v4, wrote junk, died
    os.makedirs(os.path.join(root, "v_00004"))
    with open(merge_store._claim_path(root, "v_00004"), "w") as fh:
        fh.write("{}")
    os.utime(os.path.join(root, "v_00004"), (old, old))
    os.utime(merge_store._claim_path(root, "v_00004"), (old, old))

    out = merge_store.vacuum_retention(root, retention_s=1000.0, now=now)
    tag_rows = merge_store.read_tag(spark, root, "checkpoint").count()
    try:
        merge_store.read_version(spark, root, 0).count()
        tt_fails = 0
    except Exception:  # noqa: BLE001 — vacuumed version must not read
        tt_fails = 1
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.lit(len(out["removed"])).cast("bigint").alias("n_removed"),
        F.lit(int("v_00000" in out["removed"])).cast("bigint").alias("v0_removed"),
        F.lit(len(out["retained"])).cast("bigint").alias("n_retained"),
        F.lit(len(out["orphans_removed"]))
        .cast("bigint")
        .alias("n_orphans_removed"),
        F.lit(tag_rows).cast("bigint").alias("tag_rows"),
        F.lit(tt_fails).cast("bigint").alias("time_travel_fails"),
    )


def store_read_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TIMESTAMP AS OF`` time travel for the CoW store, driver-verifiable:
    build v0 (init) → v1 (upsert +11 on doc_id==1) → v2 (upsert +13 on
    doc_id==2), inject deterministic commit timestamps (100/200/300) into
    the commit records, then read the table AS OF ts=150 (→ v0), ts=200
    (inclusive boundary → v1), and ts=10⁹ (→ current v2), reporting each
    read's per-source row count and char sum plus the two touched docs'
    values — so a wrong version pick, a boundary off-by-one, or a
    non-monotone commit-time scan all break the hash.

    Scale shape: version selection is O(#versions) metadata; each read is
    the normal manifest-resolved scan."""
    import json as _json
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_asof_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 1).withColumn(
            "n_chars", F.col("n_chars") + 11
        ),
        key="doc_id",
    )
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 2).withColumn(
            "n_chars", F.col("n_chars") + 13
        ),
        key="doc_id",
    )
    for n, ts in ((0, 100.0), (1, 200.0), (2, 300.0)):
        path = os.path.join(root, f"v_{n:05d}", merge_store._COMMIT)
        with open(path) as fh:
            rec = _json.load(fh)
        rec["ts"] = ts
        with open(path, "w") as fh:
            _json.dump(rec, fh)
    out = None
    for label, ts in (("t150_v0", 150.0), ("t200_v1", 200.0), ("t1e9_v2", 1e9)):
        snap = merge_store.read_as_of(spark, root, ts).drop("__bucket")
        rep = snap.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        ).select(F.lit(label).alias("as_of"), "source", "n_docs", "total_chars")
        out = rep if out is None else out.unionByName(rep)
    return out


ORACLE_READ_AS_OF = """
WITH v0 AS (SELECT doc_id, source, n_chars FROM documents),
v1 AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 1 THEN 11 ELSE 0 END AS n_chars
  FROM documents
),
v2 AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 1 THEN 11
                        WHEN doc_id = 2 THEN 13 ELSE 0 END AS n_chars
  FROM documents
)
SELECT 't150_v0' AS as_of, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM v0 GROUP BY source
UNION ALL
SELECT 't200_v1', source, CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT)
FROM v1 GROUP BY source
UNION ALL
SELECT 't1e9_v2', source, CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT)
FROM v2 GROUP BY source
"""


ORACLE_VACUUM_RETENTION = """
WITH final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 1 THEN 11
                        WHEN doc_id = 2 THEN 13 ELSE 0 END AS n_chars
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(1 AS BIGINT) AS n_removed,
       CAST(1 AS BIGINT) AS v0_removed,
       CAST(3 AS BIGINT) AS n_retained,
       CAST(1 AS BIGINT) AS n_orphans_removed,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS tag_rows,
       CAST(1 AS BIGINT) AS time_travel_fails
FROM final GROUP BY source
"""


def store_delete_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE under the rebase OCC protocol (round 9), driver-verifiable —
    both halves of its serializability rule:

    1. zero-recompute rebase: a delete of doc_id==1 (bucket 2 of 8)
       staged against v0 commits ON TOP of an intervening upsert to
       doc_id==2 (bucket 5, +7 n_chars) because the write sets are
       bucket-disjoint AND the intervening writer's files contain no row
       matching the predicate (the recheck leg);
    2. predicate-recheck conflict: a delete of doc_id ∈ {3, 9000002}
       staged against the advanced snapshot must CONFLICT when an
       intervening upsert INSERTS doc 9000002 (bucket 1 — disjoint from
       doc 3's bucket 3, so bucket-overlap alone would wrongly admit it):
       the serial order "theirs, then ours" would delete the new row the
       staged survivors never saw.  The whole-closure retry
       (``delete_where(..., occ='rebase')``) then deletes both.

    Expected final state, all hash-asserted: docs 1 and 3 gone, doc 2 at
    +7, the planted 9000002 inserted-then-deleted (absent), exactly one
    rebase commit and one recheck conflict observed, final version 4.

    Scale shape: the recheck reads ONLY the intervening writers' written
    bucket dirs (bounded by their write sets), never the table."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_delreb_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    meta_v0 = merge_store._read_meta(root)

    # leg 1: intervening disjoint upsert, then the stale-snapshot delete
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 2).withColumn(
            "n_chars", F.col("n_chars") + 7
        ),
        key="doc_id",
    )
    cond1 = F.col("doc_id") == 1
    n_rebased = 0
    ver = merge_store._delete_rebase(
        spark, root, cond1, ~F.coalesce(cond1, F.lit(False)), meta_v0, "v_00000"
    )
    if ver == "v_00002":
        n_rebased += 1

    # leg 2: intervening upsert INSERTS a row MATCHING the next predicate
    snap = merge_store.current_version(root)
    meta_now = merge_store._read_meta(root)
    planted = spark.createDataFrame(
        [(9000002, "planted", 50)], "doc_id long, source string, n_chars long"
    )
    merge_store.upsert(spark, root, planted, key="doc_id")
    cond2 = F.col("doc_id").isin(3, 9000002)
    n_conflicts = 0
    try:
        merge_store._delete_rebase(
            spark, root, cond2, ~F.coalesce(cond2, F.lit(False)), meta_now, snap
        )
    except merge_store.CommitConflict:
        n_conflicts += 1
    merge_store.delete_where(spark, root, cond2, occ="rebase")

    final_v = int(merge_store.current_version(root).split("_")[1])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.lit(n_rebased).cast("bigint").alias("n_rebased"),
        F.lit(n_conflicts).cast("bigint").alias("n_conflicts"),
        F.lit(final_v).cast("bigint").alias("final_version"),
    )


ORACLE_DELETE_REBASE = """
WITH final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 2 THEN 7 ELSE 0 END AS n_chars
  FROM documents
  WHERE doc_id NOT IN (1, 3)
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(1 AS BIGINT) AS n_rebased,
       CAST(1 AS BIGINT) AS n_conflicts,
       CAST(4 AS BIGINT) AS final_version
FROM final GROUP BY source
"""


def store_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(one bucket file) point reads through ``merge.read_point`` — the
    store's OLTP get path, driver-verifiable: build the documents store
    (8 buckets), upsert +17 n_chars onto doc 5 (so the probed state is
    multi-version: doc 5's bucket resolves to the v1 file, every other
    bucket to v0), then probe four live keys and one absent key
    (9000001).  Each probe reads EXACTLY ONE bucket file — the manifest
    is the index; the pruning itself is pinned in pytest via
    ``inputFiles()`` (1 vs 8), while this oracle hash-checks the values
    every probe returns.

    Scale shape: per probe, one 1-row bucket-routing job + one
    single-file scan with the key filter pushed to parquet; never a
    table scan, never a shuffle."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_point_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 5).withColumn(
            "n_chars", F.col("n_chars") + 17
        ),
        key="doc_id",
    )
    out = None
    for probe in (1, 2, 5, 7, 9000001):
        hit = merge_store.read_point(spark, root, probe)
        rep = hit.agg(
            F.lit(probe).cast("long").alias("probe_id"),
            F.count(F.lit(1)).cast("long").alias("n_found"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce(F.min("source"), F.lit("")).alias("source"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


ORACLE_POINT_LOOKUP = """
WITH cur AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 5 THEN 17 ELSE 0 END AS n_chars
  FROM documents
),
probes(probe_id) AS (VALUES (1), (2), (5), (7), (9000001))
SELECT CAST(p.probe_id AS BIGINT) AS probe_id,
       CAST(count(cur.doc_id) AS BIGINT) AS n_found,
       CAST(COALESCE(sum(cur.n_chars), 0) AS BIGINT) AS n_chars,
       COALESCE(min(cur.source), '') AS source
FROM probes p LEFT JOIN cur ON cur.doc_id = p.probe_id
GROUP BY p.probe_id
"""


def store_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planning-time data skipping from manifest-recorded file stats,
    driver-verifiable: init the documents store fragmented (16 input
    partitions → many part files per bucket), ``compact(cluster_by=
    'n_chars', max_files_per_bucket=4)`` — each bucket's rows range-slice
    into 4 sorted files whose footer [min, max] land in the version's
    ``_stats.json`` — then answer three n_chars range probes through
    ``read_where``, which drops non-overlapping files from the scan set
    BEFORE Spark lists them (the Delta stats-in-the-log shape; the
    file-count reduction itself is pinned in pytest via inputFiles —
    this oracle hash-checks that pruning never changes an answer).

    Scale shape: clustering cost is one windowed re-sort inside the
    maintenance job; every subsequent selective range scan prunes
    listing + footers + task scheduling, the dominant costs over
    millions of files."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_skip_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(
        docs.repartition(16), root, key="doc_id", n_buckets=4
    )
    ver, compacted = merge_store.compact(
        spark, root, max_files_per_bucket=4, cluster_by="n_chars"
    )
    lo_all = docs.agg(F.min("n_chars")).collect()[0][0]
    hi_all = docs.agg(F.max("n_chars")).collect()[0][0]
    mid = (lo_all + hi_all) // 2
    probes = [
        ("low_quarter", lo_all, lo_all + (hi_all - lo_all) // 4),
        ("mid_point", mid, mid),
        ("full_range", lo_all, hi_all),
    ]
    out = None
    for label, lo, hi in probes:
        hit = merge_store.read_where(spark, root, "n_chars", lo, hi)
        rep = hit.agg(
            F.lit(label).alias("probe"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("sum_chars"),
            F.coalesce(F.countDistinct("source"), F.lit(0))
            .cast("long")
            .alias("n_sources"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out.crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [(len(compacted),)], "n_buckets_clustered long"
            )
        )
    )


ORACLE_STATS_SKIPPING = """
WITH bounds AS (
  SELECT min(n_chars) AS lo, max(n_chars) AS hi,
         (min(n_chars) + max(n_chars)) // 2 AS mid
  FROM documents
),
probes AS (
  SELECT 'low_quarter' AS probe, lo AS p_lo, lo + (hi - lo) // 4 AS p_hi
  FROM bounds
  UNION ALL SELECT 'mid_point', mid, mid FROM bounds
  UNION ALL SELECT 'full_range', lo, hi FROM bounds
)
SELECT p.probe,
       CAST(count(d.doc_id) AS BIGINT) AS n_docs,
       CAST(COALESCE(sum(d.n_chars), 0) AS BIGINT) AS sum_chars,
       CAST(COALESCE(count(DISTINCT d.source), 0) AS BIGINT) AS n_sources,
       CAST(4 AS BIGINT) AS n_buckets_clustered
FROM probes p
LEFT JOIN documents d ON d.n_chars >= p.p_lo AND d.n_chars <= p.p_hi
GROUP BY p.probe
"""


def store_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only ADD COLUMN end to end, driver-verifiable — including
    the round-9 change that the schema commit is a VERSION of its own
    (claim-serialized, op='add_column' commit record) so it can never
    race a writer's fingerprint check:

    v0 init → v1 ``add_column('quality', double, 1.0)`` (no data file
    touched; manifest references v0's files) → v2 upsert WITH the column
    (doc 1 = 0.25, doc 2 = explicit NULL — must be preserved, not
    default-filled) → v3 upsert WITHOUT the column (doc 3, +5 n_chars —
    filled with the default at write).  Readers fill 1.0 for every file
    written before v1.

    Hash-asserted per source: doc counts, chars (+5 on doc 3), quality
    buckets (default/0.25/NULL), the v1 commit record's op, final
    version 3 — a wrong fill version, a lost explicit NULL, or a
    non-committing add_column all break the hash."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_schevo_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.add_column(root, "quality", "double", 1.0)
    with_q = (
        docs.filter(F.col("doc_id").isin(1, 2))
        .withColumn(
            "quality",
            F.when(F.col("doc_id") == 1, F.lit(0.25)).otherwise(
                F.lit(None).cast("double")
            ),
        )
    )
    merge_store.upsert(spark, root, with_q, key="doc_id")
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 3).withColumn(
            "n_chars", F.col("n_chars") + 5
        ),
        key="doc_id",
    )
    rec = merge_store._read_commit(root, "v_00001") or {}
    final_v = int(merge_store.current_version(root).split("_")[1])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum((F.col("quality") == 1.0).cast("int")).cast("bigint").alias("n_q_default"),
        F.sum((F.col("quality") == 0.25).cast("int")).cast("bigint").alias("n_q_quarter"),
        F.sum(F.col("quality").isNull().cast("int")).cast("bigint").alias("n_q_null"),
        F.lit(rec.get("op", "")).alias("v1_op"),
        F.lit(final_v).cast("bigint").alias("final_version"),
    )


ORACLE_SCHEMA_EVOLUTION = """
WITH final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 3 THEN 5 ELSE 0 END AS n_chars,
         CASE WHEN doc_id = 1 THEN 0.25
              WHEN doc_id = 2 THEN NULL
              ELSE 1.0 END AS quality
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(CASE WHEN quality = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_q_default,
       CAST(sum(CASE WHEN quality = 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_q_quarter,
       CAST(sum(CASE WHEN quality IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_q_null,
       'add_column' AS v1_op,
       CAST(3 AS BIGINT) AS final_version
FROM final GROUP BY source
"""


def store_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only DROP COLUMN + safe REINCARNATION, driver-verifiable:
    v0 init → v1 add ``quality`` (default 1.0) → v2
    ``drop_column('n_chars')`` (no file touched; every read now projects
    the column away — parquet never even scans those bytes) → v3 upsert
    doc 1 under the narrowed schema (quality 0.5) → v4 RE-ADD
    ``n_chars`` (default 0): the version-fenced default fill masks every
    pre-re-add file, so NOT ONE original n_chars value resurrects — all
    rows read 0 (the guarantee Delta needs column-mapping ids for) → v5
    add ``flag`` (default 7) → v6 upsert doc 2 carrying the reincarnated
    column physically (n_chars 42).

    Hash-asserted: per-source doc counts, the quality default/updated
    split, the flag default, the n_chars sum after reincarnation (42,
    ONLY doc 2's physical write — any resurrection of the original
    values breaks the hash massively), the v2 commit op, final
    version 6."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_dropcol_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.add_column(root, "quality", "double", 1.0)
    merge_store.drop_column(root, "n_chars")
    upd = spark.createDataFrame(
        [(1, "src1", 0.5)], "doc_id long, source string, quality double"
    )
    merge_store.upsert(spark, root, upd, key="doc_id")
    merge_store.add_column(root, "n_chars", "long", 0)  # reincarnation
    merge_store.add_column(root, "flag", "long", 7)
    upd2 = spark.createDataFrame(
        [(2, "src2", 1.0, 42, 7)],
        "doc_id long, source string, quality double, n_chars long, flag long",
    )
    merge_store.upsert(spark, root, upd2, key="doc_id")
    rec = merge_store._read_commit(root, "v_00002") or {}
    final_v = int(merge_store.current_version(root).split("_")[1])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("quality") == 1.0).cast("int")).cast("bigint").alias("n_q_default"),
        F.sum((F.col("quality") == 0.5).cast("int")).cast("bigint").alias("n_q_half"),
        F.sum("flag").cast("bigint").alias("sum_flag"),
        F.sum("n_chars").cast("bigint").alias("sum_n_chars_reincarnated"),
        F.lit(rec.get("op", "")).alias("v2_op"),
        F.lit(final_v).cast("bigint").alias("final_version"),
    )


ORACLE_DROP_COLUMN = """
WITH final AS (
  SELECT doc_id, source,
         CASE WHEN doc_id = 1 THEN 0.5 ELSE 1.0 END AS quality,
         7 AS flag,
         CASE WHEN doc_id = 2 THEN 42 ELSE 0 END AS n_chars
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN quality = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_q_default,
       CAST(sum(CASE WHEN quality = 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_q_half,
       CAST(sum(flag) AS BIGINT) AS sum_flag,
       CAST(sum(n_chars) AS BIGINT) AS sum_n_chars_reincarnated,
       'drop_column' AS v2_op,
       CAST(6 AS BIGINT) AS final_version
FROM final GROUP BY source
"""


def store_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME COLUMN via name-mapped column mapping (round 10 — retires
    the r9 tombstone-forever rule), driver-verifiable end-to-end:
    v0 init → v1 ``rename_column('n_chars','char_count')`` (metadata
    only, zero files touched; every pre-rename file reads under the new
    logical name) → v2 upsert doc 1 under the NEW name (char_count 1000;
    the file physically carries the stable original name) → v3 rename
    the BUCKET KEY ``doc_id``→``id`` (layout hashes values, not names) →
    v4 ``delete_where_dv(id = 2)`` (the DV sidecar writes the key under
    its physical name) → v5 MERGE doc 3 (char_count += 7) addressed by
    the renamed key → v6 rename ``char_count`` back to ``n_chars``
    (chain collapses; the mapping entry is erased, leaving exactly the
    key's).

    Hash-asserted: per-source doc counts (doc 2 vector-deleted), the
    n_chars sum blending pre-rename bytes with post-rename writes
    (doc 1 = 1000, doc 3 = +7 — any physical/logical mix-up shifts the
    sum), the v1 commit op, the surviving rename-map size (exactly 1:
    ``id``→``doc_id``), final version 6."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_rencol_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.rename_column(root, "n_chars", "char_count")
    merge_store.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(1, "src1", 1000)], "doc_id long, source string, char_count long"
        ),
        key="doc_id",
    )
    merge_store.rename_column(root, "doc_id", "id")
    merge_store.delete_where_dv(spark, root, F.col("id") == 2)
    merge_store.merge_into(
        spark,
        root,
        spark.createDataFrame([(3, "x", 0)], "id long, source string, char_count long"),
        when_matched_set={"char_count": "char_count + 7"},
        insert_not_matched=False,
    )
    merge_store.rename_column(root, "char_count", "n_chars")
    rec = merge_store._read_commit(root, "v_00001") or {}
    n_renames = len(merge_store._read_meta(root).get("renames") or {})
    final_v = int(merge_store.current_version(root).split("_")[1])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
        F.lit(rec.get("op", "")).alias("v1_op"),
        F.lit(n_renames).cast("bigint").alias("n_active_renames"),
        F.lit(final_v).cast("bigint").alias("final_version"),
    )


ORACLE_RENAME_COLUMN = """
WITH final AS (
  SELECT doc_id, source,
         CASE WHEN doc_id = 1 THEN 1000
              WHEN doc_id = 3 THEN n_chars + 7
              ELSE n_chars END AS chars_n
  FROM documents WHERE doc_id <> 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(chars_n) AS BIGINT) AS sum_n_chars,
       'rename_column' AS v1_op,
       CAST(1 AS BIGINT) AS n_active_renames,
       CAST(6 AS BIGINT) AS final_version
FROM final GROUP BY source
"""


def store_compact_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction under the rebase OCC protocol (round 9), driver-
    verifiable — the per-bucket commit rule: a compaction PLANNED against
    v0 for buckets 0 and 6 (docs 12 and 14 of the 8-bucket layout) stages
    its files with NO claim held, an intervening upsert rewrites bucket 6
    (doc 14, +3 n_chars), and the commit then lands bucket 0 (still
    pointing at the files the plan read) while SKIPPING bucket 6 (the
    newer writer's files win) — content bit-identical throughout, exactly
    one planned bucket committed, bucket 0 at exactly its 1-file target.

    This is the maintenance posture a 100 TB table needs: a long
    compaction holds no claim during its Spark job (writers never queue
    behind it) and a lost bucket race skips that bucket instead of
    discarding the whole staged set."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_cpreb_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    meta_v0 = merge_store._read_meta(root)
    manifest_v0 = merge_store._read_manifest(root, "v_00000")
    plan = {"0": 1, "6": 1}  # buckets of doc 12 and doc 14 under xxhash64%8

    # intervening writer rewrites bucket 6 AFTER the plan read it
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 14).withColumn(
            "n_chars", F.col("n_chars") + 3
        ),
        key="doc_id",
    )
    ver, committed = merge_store._compact_rebase(
        spark, root, meta_v0, "v_00000", manifest_v0, plan
    )
    man = merge_store._read_manifest(root, ver)
    b0_dir = os.path.join(root, man["0"])
    b0_files = len([f for f in os.listdir(b0_dir) if f.endswith(".parquet")])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.lit(len(committed)).cast("bigint").alias("n_committed"),
        F.lit(int(committed == ["0"])).cast("bigint").alias("committed_is_b0"),
        F.lit(b0_files).cast("bigint").alias("b0_files"),
        F.lit(int(ver.split("_")[1])).cast("bigint").alias("final_version"),
    )


ORACLE_COMPACT_REBASE = """
WITH final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 14 THEN 3 ELSE 0 END AS n_chars
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(1 AS BIGINT) AS n_committed,
       CAST(1 AS BIGINT) AS committed_is_b0,
       CAST(1 AS BIGINT) AS b0_files,
       CAST(2 AS BIGINT) AS final_version
FROM final GROUP BY source
"""


def store_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE end to end, driver-verifiable: clone the documents
    table (v0 of the clone references the source's files by absolute
    path — ZERO parquet files copied, asserted by listing the clone's v0
    dir), mutate the CLONE (upsert +9 n_chars on doc 5, delete doc 7),
    then prove isolation in both directions — the source still reads its
    original state bit-for-bit, the clone carries both mutations, and a
    subsequent SOURCE upsert (+4 on doc 9) is invisible to the clone.

    Hash-asserted: both tables' per-source profiles, the zero-copy file
    count, the clone's v0 commit op, and both tables' final versions.

    At 100 TB this is the milliseconds-vs-days difference between
    metadata clone and physical copy for a production-safe experiment."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    src = os.path.join(tempfile.gettempdir(), f"mg_clone_src_{app_id}_{sf_tag}")
    dst = os.path.join(tempfile.gettempdir(), f"mg_clone_dst_{app_id}_{sf_tag}")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    merge_store.init_table(docs, src, key="doc_id", n_buckets=8)
    merge_store.shallow_clone(src, dst)
    # zero-copy: the clone's v0 dir holds metadata only, no parquet
    v0_files = [
        f
        for _, _, files in os.walk(os.path.join(dst, "v_00000"))
        for f in files
        if f.endswith(".parquet")
    ]
    merge_store.upsert(
        spark,
        dst,
        docs.filter(F.col("doc_id") == 5).withColumn(
            "n_chars", F.col("n_chars") + 9
        ),
        key="doc_id",
    )
    merge_store.delete_where(spark, dst, F.col("doc_id") == 7)
    merge_store.upsert(  # source moves on; the clone must not see it
        spark,
        src,
        docs.filter(F.col("doc_id") == 9).withColumn(
            "n_chars", F.col("n_chars") + 4
        ),
        key="doc_id",
    )
    rec = merge_store._read_commit(dst, "v_00000") or {}
    src_v = int(merge_store.current_version(src).split("_")[1])
    dst_v = int(merge_store.current_version(dst).split("_")[1])

    def profile(root: str, side: str) -> DataFrame:
        return (
            merge_store.read_current(spark, root)
            .drop("__bucket")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
            )
            .select(F.lit(side).alias("side"), "source", "n_docs", "total_chars")
        )

    return (
        profile(src, "source_table")
        .unionByName(profile(dst, "clone"))
        .withColumn("v0_parquet_files", F.lit(len(v0_files)).cast("bigint"))
        .withColumn("clone_v0_op", F.lit(rec.get("op", "")))
        .withColumn("src_version", F.lit(src_v).cast("bigint"))
        .withColumn("clone_version", F.lit(dst_v).cast("bigint"))
    )


ORACLE_SHALLOW_CLONE = """
WITH src_final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 9 THEN 4 ELSE 0 END AS n_chars
  FROM documents
),
clone_final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 5 THEN 9 ELSE 0 END AS n_chars
  FROM documents WHERE doc_id <> 7
),
both_sides AS (
  SELECT 'source_table' AS side, source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM src_final GROUP BY source
  UNION ALL
  SELECT 'clone', source, CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT)
  FROM clone_final GROUP BY source
)
SELECT side, source, n_docs, total_chars,
       CAST(0 AS BIGINT) AS v0_parquet_files,
       'clone' AS clone_v0_op,
       CAST(1 AS BIGINT) AS src_version,
       CAST(2 AS BIGINT) AS clone_version
FROM both_sides
"""


def store_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE — Delta's roll-back-as-roll-FORWARD (restore writes a
    NEW version whose manifest points at the target's buckets; history is
    never mutated, nothing is copied), driver-verifiable end-to-end:

    v0 init → v1 upsert (+11 on doc 1) → tag ``good`` pinned at v1 →
    v2 delete of doc 2 (the "bad write") → ``restore(tag='good')`` = v3 →
    v4 upsert (+5 on doc 3) — the restored table keeps evolving normally.

    Hash-asserted invariants: the final state is v1's data plus the
    post-restore upsert (doc 2 PRESENT again, doc 1 at +11, doc 3 at +5);
    the bad v2 stays readable as history (doc 2 row-count 0 there — a
    restore that rewrote history would break this); the restore itself is
    one more auditable version (final_version == 4, restore == v3); and
    it copied ZERO data — v3's manifest is bucket-for-bucket IDENTICAL to
    v1's (manifest_identical == 1), the O(1)-metadata contract that makes
    RESTORE instant on a 100 TB table.

    Scale shape: restore is pure manifest metadata; the reads are normal
    manifest-resolved scans."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_restore_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 1).withColumn(
            "n_chars", F.col("n_chars") + 11
        ),
        key="doc_id",
    )
    merge_store.create_tag(root, "good")  # pins v1
    merge_store.delete_where(spark, root, F.col("doc_id") == 2)  # v2: bad write
    restored = merge_store.restore(root, tag="good")  # v3
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 3).withColumn(
            "n_chars", F.col("n_chars") + 5
        ),
        key="doc_id",
    )  # v4
    doc2_at_v2 = (
        merge_store.read_version(spark, root, 2)
        .filter(F.col("doc_id") == 2)
        .count()
    )
    manifest_identical = int(
        merge_store._read_manifest(root, restored)
        == merge_store._read_manifest(root, "v_00001")
    )
    final_v = int(merge_store.current_version(root).split("_")[1])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.lit(final_v).cast("bigint").alias("final_version"),
        F.lit(doc2_at_v2).cast("bigint").alias("doc2_rows_at_bad_v2"),
        F.lit(manifest_identical).cast("bigint").alias("manifest_identical"),
    )


def store_check_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints on the CoW store (Delta's
    ``ALTER TABLE ADD CONSTRAINT`` / ``InvariantViolationException``
    surface), driver-verifiable across the whole lifecycle:

    v0 init → v1 ``add_check_constraint('chars_nonneg', 'n_chars >= 0')``
    (validates EXISTING data, commits as a claim-serialized metadata-only
    version) → v2 passing upsert (+21 on doc 1) → a VIOLATING upsert
    (doc 2 at −5) rejected before a single file stages → v3 upsert of a
    NULL ``n_chars`` row (SQL CHECK three-valued logic: NULL passes) → a
    violating ``merge_into`` (doc 3 to −10⁹) rejected with its eagerly
    claimed version RELEASED (no wedged table) → an ``ALTER`` adding a
    rule existing data already breaks is itself rejected and NOT
    recorded.

    Hash-asserted: final state carries the passing write and the NULL row
    but neither violation; exactly 2 write rejections + 1 alter
    rejection; 1 recorded constraint; final_version == 3 (rejected
    writes burn no version number); zero claim files left behind.

    Scale shape: enforcement is one short-circuiting ``limit(1)`` job per
    constraint over the UPDATE batch only (never the table), before any
    staging I/O."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_chk_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.add_check_constraint(spark, root, "chars_nonneg", "n_chars >= 0")
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 1).withColumn(
            "n_chars", F.col("n_chars") + 21
        ),
        key="doc_id",
    )
    n_rejected = 0
    try:
        merge_store.upsert(
            spark,
            root,
            docs.filter(F.col("doc_id") == 2).withColumn("n_chars", F.lit(-5)),
            key="doc_id",
        )
    except merge_store.ConstraintViolation:
        n_rejected += 1
    merge_store.upsert(
        spark,
        root,
        spark.createDataFrame(
            [(9000005, "planted", None)], "doc_id long, source string, n_chars long"
        ),
        key="doc_id",
    )
    try:
        merge_store.merge_into(
            spark,
            root,
            docs.filter(F.col("doc_id") == 3),
            when_matched_set={"n_chars": "n_chars - 1000000000"},
            insert_not_matched=False,
        )
    except merge_store.ConstraintViolation:
        n_rejected += 1
    n_alter_rejected = 0
    try:
        merge_store.add_check_constraint(
            spark, root, "chars_huge", "n_chars > 100000000"
        )
    except merge_store.ConstraintViolation:
        n_alter_rejected += 1
    constraints = merge_store.describe(root)["constraints"]
    claims_left = len([f for f in os.listdir(root) if f.endswith(".claim")])
    final_v = int(merge_store.current_version(root).split("_")[1])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("n_chars"), F.lit(-1)).cast("bigint").alias("total_chars"),
        F.lit(n_rejected).cast("bigint").alias("n_rejected"),
        F.lit(n_alter_rejected).cast("bigint").alias("n_alter_rejected"),
        F.lit(len(constraints)).cast("bigint").alias("n_constraints"),
        F.lit(final_v).cast("bigint").alias("final_version"),
        F.lit(claims_left).cast("bigint").alias("claims_leaked"),
    )


ORACLE_CHECK_CONSTRAINT = """
WITH final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 1 THEN 21 ELSE 0 END AS n_chars
  FROM documents
  UNION ALL
  SELECT 9000005, 'planted', NULL
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(n_chars), -1) AS BIGINT) AS total_chars,
       CAST(2 AS BIGINT) AS n_rejected,
       CAST(1 AS BIGINT) AS n_alter_rejected,
       CAST(1 AS BIGINT) AS n_constraints,
       CAST(3 AS BIGINT) AS final_version,
       CAST(0 AS BIGINT) AS claims_leaked
FROM final GROUP BY source
"""


def store_generated_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style GENERATED column, driver-verifiable across its whole
    contract: v0 init → v1 ``add_generated_column('chars_x2', 'long',
    'n_chars * 2 + 7')`` (metadata-only claim-serialized commit; v0's
    files EVALUATE the expression at read) → v2 upsert omitting the
    column (computed + physically materialized at write) → v3 upsert
    CARRYING the correct value (validated, accepted) → an upsert carrying
    a WRONG value rejected before staging → v4 merge updating a base
    column (the generated value re-derives from the POST-update row) →
    a ``when_matched_set`` targeting the generated column refused.

    Hash-asserted: every row of the final read satisfies
    chars_x2 == n_chars·2+7 (the sum over all rows — one stale or NULL
    fill breaks it), exactly 1 write rejection and 1 refused SET,
    final_version == 4 (refusals burn no version), zero leaked claims.

    Scale shape: the ALTER is O(1) metadata; read-side fills are
    per-version projections (never a rewrite); write-side validation is
    one short-circuiting ``limit(1)`` probe over the batch."""
    import shutil
    import tempfile

    from mongraph_spark.sources import merge as merge_store

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    app_id = spark.sparkContext.applicationId
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join(tempfile.gettempdir(), f"mg_gen_{app_id}_{sf_tag}")
    shutil.rmtree(root, ignore_errors=True)
    merge_store.init_table(docs, root, key="doc_id", n_buckets=8)
    merge_store.add_generated_column(
        spark, root, "chars_x2", "long", "n_chars * 2 + 7"
    )
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 1).withColumn(
            "n_chars", F.col("n_chars") + 11
        ),
        key="doc_id",
    )
    merge_store.upsert(
        spark,
        root,
        docs.filter(F.col("doc_id") == 2).withColumn(
            "chars_x2", F.col("n_chars") * 2 + 7
        ),
        key="doc_id",
    )
    n_rejected = 0
    try:
        merge_store.upsert(
            spark,
            root,
            docs.filter(F.col("doc_id") == 3).withColumn("chars_x2", F.lit(999)),
            key="doc_id",
        )
    except merge_store.ConstraintViolation:
        n_rejected += 1
    merge_store.merge_into(
        spark,
        root,
        docs.filter(F.col("doc_id") == 4),
        when_matched_set={"n_chars": "n_chars + 3"},
        insert_not_matched=False,
    )
    n_refused_set = 0
    try:
        merge_store.merge_into(
            spark,
            root,
            docs.filter(F.col("doc_id") == 4),
            when_matched_set={"chars_x2": "1"},
        )
    except ValueError:
        n_refused_set += 1
    claims_left = len([f for f in os.listdir(root) if f.endswith(".claim")])
    final_v = int(merge_store.current_version(root).split("_")[1])
    cur = merge_store.read_current(spark, root).drop("__bucket")
    return cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("chars_x2").cast("bigint").alias("total_gen"),
        F.lit(n_rejected).cast("bigint").alias("n_rejected"),
        F.lit(n_refused_set).cast("bigint").alias("n_refused_set"),
        F.lit(final_v).cast("bigint").alias("final_version"),
        F.lit(claims_left).cast("bigint").alias("claims_leaked"),
    )


ORACLE_GENERATED_COLUMN = """
WITH final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 1 THEN 11
                        WHEN doc_id = 4 THEN 3 ELSE 0 END AS n_chars
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars * 2 + 7) AS BIGINT) AS total_gen,
       CAST(1 AS BIGINT) AS n_rejected,
       CAST(1 AS BIGINT) AS n_refused_set,
       CAST(4 AS BIGINT) AS final_version,
       CAST(0 AS BIGINT) AS claims_leaked
FROM final GROUP BY source
"""


ORACLE_RESTORE = """
WITH final AS (
  SELECT doc_id, source,
         n_chars + CASE WHEN doc_id = 1 THEN 11
                        WHEN doc_id = 3 THEN 5 ELSE 0 END AS n_chars
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(4 AS BIGINT) AS final_version,
       CAST(0 AS BIGINT) AS doc2_rows_at_bad_v2,
       CAST(1 AS BIGINT) AS manifest_identical
FROM final GROUP BY source
"""


QUERIES = {
    "dq_expectations": dq_expectations,
    "store_restore": store_restore,
    "store_check_constraint": store_check_constraint,
    "store_generated_column": store_generated_column,
    "store_shallow_clone": store_shallow_clone,
    "store_vacuum_retention": store_vacuum_retention,
    "store_read_as_of": store_read_as_of,
    "store_point_lookup": store_point_lookup,
    "store_stats_skipping": store_stats_skipping,
    "store_delete_rebase": store_delete_rebase,
    "store_schema_evolution": store_schema_evolution,
    "store_drop_column": store_drop_column,
    "store_rename_column": store_rename_column,
    "store_read_changes": store_read_changes,
    "store_merge_evolve": store_merge_evolve,
    "store_scd2_history": store_scd2_history,
    "store_compact_rebase": store_compact_rebase,
    "store_compaction": store_compaction,
    "store_merge_into": store_merge_into,
    "store_deletion_vectors": store_deletion_vectors,
    "store_history": store_history,
    "store_conflict_retry": store_conflict_retry,
    "ivm_agg_delta": ivm_agg_delta,
    "zorder_data_skipping": zorder_data_skipping,
    "bloom_filter_skipping": bloom_filter_skipping,
    "zorder_pruning_benefit": zorder_pruning_benefit,
    "quality_drift_psi": quality_drift_psi,
}

ORACLES = {
    "dq_expectations": ORACLE_DQ,
    "store_restore": ORACLE_RESTORE,
    "store_check_constraint": ORACLE_CHECK_CONSTRAINT,
    "store_generated_column": ORACLE_GENERATED_COLUMN,
    "store_vacuum_retention": ORACLE_VACUUM_RETENTION,
    "store_read_as_of": ORACLE_READ_AS_OF,
    "store_point_lookup": ORACLE_POINT_LOOKUP,
    "store_stats_skipping": ORACLE_STATS_SKIPPING,
    "store_shallow_clone": ORACLE_SHALLOW_CLONE,
    "store_delete_rebase": ORACLE_DELETE_REBASE,
    "store_schema_evolution": ORACLE_SCHEMA_EVOLUTION,
    "store_drop_column": ORACLE_DROP_COLUMN,
    "store_rename_column": ORACLE_RENAME_COLUMN,
    "store_read_changes": ORACLE_READ_CHANGES,
    "store_merge_evolve": ORACLE_MERGE_EVOLVE,
    "store_scd2_history": ORACLE_SCD2,
    "store_compact_rebase": ORACLE_COMPACT_REBASE,
    "store_compaction": ORACLE_COMPACTION,
    "store_merge_into": ORACLE_MERGE_INTO,
    "store_deletion_vectors": ORACLE_DELETION_VECTORS,
    "store_history": ORACLE_STORE_HISTORY,
    "store_conflict_retry": ORACLE_CONFLICT_RETRY,
    "ivm_agg_delta": ORACLE_IVM_AGG,
    "zorder_data_skipping": ORACLE_ZORDER,
    "bloom_filter_skipping": ORACLE_BLOOM,
    "zorder_pruning_benefit": ORACLE_PRUNING,
    "quality_drift_psi": ORACLE_PSI,
}
