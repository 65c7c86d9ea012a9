"""The Mongo-predicate translator: Column path vs driver-side dict path must
agree (property-based over a small doc corpus), plus WHERE-string rewriting."""

from __future__ import annotations

import re

import pytest

from mongraph_spark.mongo_expr import cypher_where_to_sql, mongo_match, mongo_to_column

DOCS = [
    {"_id": "a", "name": "alice", "age": 30, "city": "Berlin"},
    {"_id": "b", "name": "bob", "age": 25, "city": "Boston"},
    {"_id": "c", "name": "Charles", "age": 35, "city": None},
    {"_id": "d", "name": "zoe", "age": None, "city": "Zurich"},
    {"_id": "e", "name": "neg", "age": -7, "city": "Oslo"},
]

CONDITIONS = [
    {"name": "alice"},
    {"name": re.compile("o")},
    {"name": re.compile(r"^[A-Z]")},
    {"name": {"$regex": "^b", "$options": "i"}},
    {"age": {"$gt": 26}},
    {"age": {"$gte": 25, "$lt": 35}},
    {"name": {"$in": ["alice", "zoe"]}},
    {"name": {"$nin": ["alice", "zoe"]}},
    {"city": {"$exists": True}},
    {"city": None},
    {"$and": [{"age": {"$gt": 20}}, {"name": re.compile("e")}]},
    {"$or": [{"name": "bob"}, {"city": "Zurich"}]},
    {"$nor": [{"name": "bob"}, {"city": "Zurich"}]},
    {"name": {"$ne": "bob"}},
    {"name": {"$not": {"$regex": "^[a-m]"}}},
    {"age": {"$mod": [5, 0]}},
    # negative dividend: truncated remainder (-7 mod 3 = -1), both paths must agree
    {"age": {"$mod": [3, -1]}},
    {"age": {"$mod": [3, 2]}},
]

ARRAY_DOCS = [
    {"_id": "a", "tags": ["red", "blue"]},
    {"_id": "b", "tags": ["blue"]},
    {"_id": "c", "tags": []},
    {"_id": "d", "tags": ["green", "blue", "red"]},
]

ARRAY_CONDITIONS = [
    {"tags": {"$size": 2}},
    {"tags": {"$all": ["red", "blue"]}},
    {"tags": {"$elemMatch": {"$regex": "^r"}}},
    {"tags": {"$elemMatch": {"$in": ["green", "purple"]}}},
]


@pytest.mark.parametrize("cond", CONDITIONS, ids=[str(c) for c in CONDITIONS])
def test_column_and_dict_paths_agree(spark, cond):
    df = spark.createDataFrame(DOCS, "_id string, name string, age long, city string")
    spark_ids = sorted(
        r._id for r in df.filter(mongo_to_column(cond)).select("_id").collect()
    )
    dict_ids = sorted(d["_id"] for d in DOCS if mongo_match(d, cond))
    assert spark_ids == dict_ids, f"disagreement on {cond}"


@pytest.mark.parametrize(
    "cond", ARRAY_CONDITIONS, ids=[str(c) for c in ARRAY_CONDITIONS]
)
def test_array_operators_agree(spark, cond):
    df = spark.createDataFrame(ARRAY_DOCS, "_id string, tags array<string>")
    spark_ids = sorted(
        r._id for r in df.filter(mongo_to_column(cond)).select("_id").collect()
    )
    dict_ids = sorted(d["_id"] for d in ARRAY_DOCS if mongo_match(d, cond))
    assert spark_ids == dict_ids, f"disagreement on {cond}"


def test_nested_path_match():
    doc = {"message": {"title": "hello"}}
    assert mongo_match(doc, {"message.title": "hello"})
    assert not mongo_match(doc, {"message.title": "nope"})
    assert not mongo_match(doc, {"missing.path": "x"})


def test_unsupported_operator_raises():
    with pytest.raises(ValueError):
        mongo_match({"a": 1}, {"a": {"$weird": 1}})
    with pytest.raises(ValueError):
        mongo_to_column({"a": {"$weird": 1}})


def test_cypher_where_rewrite():
    out = cypher_where_to_sql("r.instrument = 'guitar'", {"r": "props"})
    assert out == "props['instrument'] == 'guitar'"
    # null-tolerant `!` suffix (Neo4j 1.x style, reference README.md:129)
    out = cypher_where_to_sql("r.category! = 'scientific report'", {"r": "props"})
    assert out == "props['category'] == 'scientific report'"
    # untouched identifiers pass through
    out = cypher_where_to_sql("x.foo = 1", {"r": "props"})
    assert out == "x.foo == 1"
