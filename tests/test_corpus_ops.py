"""Corpus-hygiene operators: behavioral checks + plan pins (no Python UDFs,
shuffle budget, broadcast of scalar totals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongraph_spark.queries.corpus import (
    decontaminate_splits,
    repetition_filter,
    source_mixture_weights,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_counts_bounded(spark):
    rows = {r.lang: r for r in decontaminate_splits(spark, SF).collect()}
    assert rows, "test split is empty"
    for r in rows.values():
        assert 0 <= r.n_contaminated <= r.n_test_docs


def test_decontaminate_self_overlap_is_total(spark, tmp_path):
    """A corpus where a test doc IS a train doc must be 100% contaminated:
    plant doc pairs with identical text across the split boundary."""
    import pandas as pd

    # bucket(doc_id) = md5-based; find ids landing in train and test
    from mongraph_spark.queries.pipeline import TRAIN_PCT, _doc_hash
    from mongraph_spark.queries.corpus import TEST_LO

    ids = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (_doc_hash() % 100).alias("b")
    ).collect()
    train_ids = [r.doc_id for r in ids if r.b < TRAIN_PCT][:3]
    test_ids = [r.doc_id for r in ids if r.b >= TEST_LO][:3]
    text = "alpha beta gamma delta epsilon zeta eta theta"
    pdf = pd.DataFrame(
        {
            "doc_id": train_ids + test_ids,
            "lang": ["en"] * 6,
            "source": ["src0"] * 6,
            "text": [text] * 6,
            "n_chars": [len(text)] * 6,
        }
    )
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(out)
    res = {r.lang: r for r in decontaminate_splits(spark, str(tmp_path)).collect()}
    assert res["en"].n_test_docs == 3 and res["en"].n_contaminated == 3


def test_repetition_flags_planted_doc(spark, tmp_path):
    """A doc that is one phrase repeated 50x must be flagged; a doc of all
    distinct tokens must not."""
    import pandas as pd

    rep = "spam ham " * 50
    uniq = " ".join(f"w{i}" for i in range(100))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "lang": ["en", "de"],
            "source": ["src0", "src0"],
            "text": [rep.strip(), uniq],
            "n_chars": [len(rep), len(uniq)],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    res = {r.lang: r for r in repetition_filter(spark, str(tmp_path)).collect()}
    assert res["en"].n_flagged == 1
    assert res["de"].n_flagged == 0
    assert res["de"].avg_distinct_ratio == 1.0


def test_mixture_weights_equalize(spark):
    """weight * n_tokens must be the same for every source (that's the
    definition of equalizing): check to rounding tolerance."""
    rows = source_mixture_weights(spark, SF).collect()
    prods = [r.weight * r.n_tokens for r in rows]
    assert max(prods) - min(prods) < 0.01 * max(prods)


def test_corpus_plans_stay_jvm_side(spark):
    """No Python evaluation anywhere in the three corpus ops, and the
    mixture totals come back via a broadcast (scalar-subquery plan)."""
    for fn in (decontaminate_splits, repetition_filter, source_mixture_weights):
        p = _plan(fn(spark, SF))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, fn.__name__
    p = _plan(source_mixture_weights(spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
