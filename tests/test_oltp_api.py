"""Behavioral contract ported from the reference suite
(reference test/tests.coffee; expected answers pinned in FIXTURES.md §2)."""

from __future__ import annotations

import re

import pytest

from mongraph_spark.document import MongraphError, NoGraphabilityError
from mongraph_spark.schema import CollectionSchema, FieldSpec


def names(rels, side):
    return sorted((getattr(r, side) or {}).get("name") for r in rels)


# -- traversal basics (tests.coffee:504-543) ---------------------------------


def test_all_relationships_knows(engine):
    alice = engine.fixture_docs["alice"]
    rels = alice.all_relationships("knows")
    assert len(rels) == 2


def test_incoming_relationships(engine):
    alice = engine.fixture_docs["alice"]
    rels = alice.incoming_relationships("knows")
    assert len(rels) == 1
    assert rels[0].from_["name"] == "zoe"
    assert rels[0].data["since"] == "months"


def test_outgoing_relationships(engine):
    alice = engine.fixture_docs["alice"]
    rels = alice.outgoing_relationships("knows")
    assert len(rels) == 1
    assert rels[0].to["name"] == "bob"
    assert rels[0].data["since"] == "years"


def test_wildcard_and_union_types(engine):
    alice = engine.fixture_docs["alice"]
    assert len(alice.all_relationships("*")) == 4  # 2 knows + 2 visits
    assert len(alice.all_relationships("knows|visits")) == 4
    assert len(alice.all_relationships("visits")) == 2


def test_relationships_between(engine):
    d = engine.fixture_docs
    rels = d["alice"].all_relationships_between(d["bob"], "knows")
    assert len(rels) == 1
    # A->B plus B->A yields 2 rows (tests.coffee:535-543)
    d["bob"].create_relationship_to(d["alice"], "knows")
    rels = d["alice"].all_relationships_between(d["bob"], "knows")
    assert len(rels) == 2


def test_incoming_from_outgoing_to(engine):
    d = engine.fixture_docs
    assert len(d["alice"].outgoing_relationships_to(d["bob"], "knows")) == 1
    assert len(d["alice"].incoming_relationships_from(d["bob"], "knows")) == 0
    assert len(d["alice"].incoming_relationships_from(d["zoe"], "knows")) == 1


# -- counts (tests.coffee:523-531) --------------------------------------------


def test_count_forms_invariant(engine):
    d = engine.fixture_docs
    # add parallel + bidirectional edges so the inequality is strict
    d["alice"].create_relationship_between(d["bob"], "knows")
    count_star = d["alice"].query_relationships("*", {"count": "*"})
    count_a = d["alice"].query_relationships("*", {"count": "a"})
    count_distinct = d["alice"].query_relationships("*", {"countDistinct": "a"})
    assert count_distinct < count_a <= count_star


# -- populate options (tests.coffee:566-604) -----------------------------------


def test_collection_filter(engine):
    alice = engine.fixture_docs["alice"]
    rels = alice.outgoing_relationships("*", {"collection": "locations"})
    assert names(rels, "to") == ["Bar", "Pub"]


def test_document_predicate_regex(engine):
    alice = engine.fixture_docs["alice"]
    rels = alice.outgoing_relationships(
        "*", {"where": {"document": {"name": re.compile(r"^[A-Z]")}}}
    )
    assert names(rels, "to") == ["Bar", "Pub"]


def test_document_predicate_drops_row(engine):
    alice = engine.fixture_docs["alice"]
    rels = alice.outgoing_relationships("*", {"where": {"document": {"name": "Bar"}}})
    # bob fails the predicate -> knows edge dropped; alice exempt as reference
    assert len(rels) == 1
    assert rels[0].to["name"] == "Bar"


def test_load_documents_false(engine):
    alice = engine.fixture_docs["alice"]
    rels = alice.outgoing_relationships("*", {"loadDocuments": False})
    assert len(rels) == 3  # bob + bar + pub
    assert all(r.from_ is None and r.to is None for r in rels)


# -- relationship predicate (tests.coffee:756-764) -------------------------------


def test_relationship_where_string(engine):
    d = engine.fixture_docs
    d["alice"].create_relationship_to(d["bob"], "plays", {"instrument": "guitar"})
    d["alice"].create_relationship_to(d["zoe"], "plays", {"instrument": "drums"})
    rels = d["alice"].query_relationships(
        "plays", {"where": {"relationship": "r.instrument = 'guitar'"}}
    )
    assert len(rels) == 1
    assert rels[0].to["name"] == "bob"


def test_relationship_where_null_tolerant(engine):
    d = engine.fixture_docs
    # `r.since! = 'years'` must not error on edges lacking the property
    rels = d["alice"].query_relationships(
        "*", {"where": {"relationship": "r.since! = 'years'"}}
    )
    assert len(rels) == 1


# -- shortest path (tests.coffee:624-648) ------------------------------------------


def test_shortest_path(engine):
    d = engine.fixture_docs
    path = d["alice"].shortest_path_to(d["zoe"], "knows")
    assert [p["name"] for p in path] == ["alice", "bob", "zoe"]


def test_shortest_path_with_predicate(engine):
    d = engine.fixture_docs
    path = d["alice"].shortest_path_to(
        d["zoe"], "knows", {"where": {"document": {"name": re.compile("o")}}}
    )
    assert [p["name"] for p in path] == ["bob", "zoe"]


def test_shortest_path_no_route(engine):
    d = engine.fixture_docs
    # visits edges only go alice->locations; no knows path zoe->bar
    assert d["zoe"].shortest_path_to(d["bar"], "knows") is None


# -- creation semantics (tests.coffee:419-430) ---------------------------------------


def test_create_relationship_between_two_edges(engine):
    d = engine.fixture_docs
    before = engine.count_edges()
    d["charles"].create_relationship_between(d["bar"], "likes")
    assert engine.count_edges() == before + 2
    assert len(d["charles"].incoming_relationships("likes")) == 1
    assert len(d["charles"].outgoing_relationships("likes")) == 1


def test_edge_bookkeeping_columns(engine):
    d = engine.fixture_docs
    rel = d["alice"].outgoing_relationships("knows")[0]
    assert rel._from == f"people:{d['alice']._id}"
    assert rel._to == f"people:{d['bob']._id}"
    assert rel._created_at is not None and rel._created_at > 0


# -- deletes + cascade (tests.coffee:114-130, G11-G15) --------------------------------


def test_remove_relationships(engine):
    d = engine.fixture_docs
    d["alice"].remove_relationships("knows")
    assert len(d["alice"].all_relationships("knows")) == 0
    assert len(d["alice"].all_relationships("visits")) == 2  # untouched


def test_remove_relationships_to(engine):
    d = engine.fixture_docs
    d["bob"].remove_relationships_to(d["zoe"], "knows")
    assert len(d["bob"].outgoing_relationships_to(d["zoe"], "knows")) == 0
    assert len(d["bob"].outgoing_relationships_to(d["charles"], "knows")) == 1


def test_remove_node_cascade_conservation(engine):
    d = engine.fixture_docs
    nodes_before, edges_before = engine.count_nodes(), engine.count_edges()
    d["bob"].remove()  # bob has 3 knows edges
    assert engine.count_nodes() == nodes_before - 1
    assert engine.count_edges() == edges_before - 3
    assert engine.find_document("people", d["bob"]._id) is None


def test_remove_node_keeps_document(engine):
    d = engine.fixture_docs
    d["alice"].remove_node()
    assert d["alice"].get_node_id() is None
    assert engine.find_document("people", d["alice"]._id) is not None


# -- mirror node lifecycle (tests.coffee:306, :379-394) ---------------------------------


def test_node_ids_positive_and_stable(engine):
    d = engine.fixture_docs
    nid = d["alice"].get_node_id()
    assert nid is not None and nid > 0
    assert d["alice"].get_node().id == nid  # stable across calls


def test_unsaved_document_refuses_node(engine):
    doc = engine.create_document("people", {"name": "ghost"})
    with pytest.raises(MongraphError):
        doc.find_corresponding_node()


def test_node_accessors(engine):
    d = engine.fixture_docs
    node = d["alice"].get_node()
    assert node.get_collection_name() == "people"
    assert node.get_mongo_id() == d["alice"]._id
    assert node.get_document(engine)["name"] == "alice"


# -- prop sync / flattening (tests.coffee:650-718) ----------------------------------------


def test_data_for_node_flattening(engine):
    msg = engine.create_document(
        "messages",
        {"message": {"title": "hello", "content": "secret"}, "from": "alice", "my_id": 7},
    ).save()
    data = msg.data_for_node()
    assert data == {"message.title": "hello", "from": "alice", "my_id": 7}
    assert msg.data_for_node(index=True) == {"message.title": "hello", "my_id": 7}


def test_data_for_node_none_when_nothing_opted_in(engine):
    loc = engine.fixture_docs["bar"]
    assert loc.data_for_node() is None  # tests.coffee:652-653


def test_prop_sync_on_save_and_unset(engine):
    msg = engine.create_document(
        "messages", {"message": {"title": "t1", "content": "c"}, "from": "a", "my_id": 1}
    ).save()
    node = engine.catalog.get_node(msg.get_node_id())
    assert node["props"]["message.title"] == "t1"
    # delete a field -> node key removed on next save (plugin :56-58)
    msg.update(unset=["message.title"])
    node = engine.catalog.get_node(msg.get_node_id())
    assert "message.title" not in node["props"]
    assert node["props"]["from"] == "a"


def test_index_graph_errors(engine):
    bar = engine.fixture_docs["bar"]  # locations: nothing opted in
    with pytest.raises(MongraphError):
        bar.index_graph()
    alice = engine.fixture_docs["alice"]
    alice.remove_node()
    with pytest.raises(MongraphError):
        alice.index_graph()


# -- denormalization M9 (tests.coffee:720-736) ----------------------------------------------


def test_apply_graph_relationships(engine):
    alice = engine.fixture_docs["alice"]
    grouped = alice.apply_graph_relationships()
    assert sorted(grouped) == ["knows", "visits"]
    assert len(grouped["knows"]) == 2
    assert len(grouped["visits"]) == 2
    entry = grouped["visits"][0]
    assert entry["from"]["collection"] == "people"
    assert entry["to"]["collection"] == "locations"
    # persisted into the document
    stored = engine.find_document("people", alice._id)
    assert sorted(stored["_relationships"]) == ["knows", "visits"]


# -- graphability opt-outs (tests.coffee:313-364) --------------------------------------------


def test_graphability_false(engine):
    engine.register_collection(CollectionSchema(name="plain", graphability=False))
    doc = engine.create_document("plain", {"name": "x"}).save()
    assert doc.get_node_id() is None
    with pytest.raises(NoGraphabilityError):
        doc.create_relationship_to(engine.fixture_docs["alice"], "t")
    with pytest.raises(NoGraphabilityError):
        doc.all_relationships()


def test_graphability_hook_disabled(engine):
    engine.register_collection(
        CollectionSchema(
            name="halfgraph",
            fields={"name": FieldSpec(type=str)},
            graphability={"findAndConnectCorrespondingNode": False},
        )
    )
    doc = engine.create_document("halfgraph", {"name": "x"}).save()
    assert doc.get_node_id() is None  # save hook skipped


# -- virtuals (tests.coffee:64, :635-639) ------------------------------------------------------


def test_virtual_fields(engine):
    assert engine.fixture_docs["alice"].virtual("fullname") == "alice a."


# -- callback trio (SURVEY §7 hard part 5) -----------------------------------------------------


def test_callback_trio(engine):
    alice = engine.fixture_docs["alice"]
    seen = {}

    def cb(err, rels, options):
        seen["err"], seen["rels"], seen["options"] = err, rels, options

    alice.all_relationships("knows", cb=cb)
    assert seen["err"] is None
    assert len(seen["rels"]) == 2
    assert "debug" in seen["options"]


# -- distributed find + cypher->DataFrame (bulk path) ---------------------------


def test_find_df_distributed(engine):
    import re as _re

    df = engine.find_df("people", {"name": {"$regex": "^[ab]"}})
    assert sorted(r.name for r in df.collect()) == ["alice", "bob"]
    # predicate on a missing field matches nothing, never errors
    assert engine.find_df("people", {"nope": "x"}).count() == 0


def test_cypher_to_dataframe(engine):
    from mongraph_spark.cypher_mini import cypher_to_dataframe

    d = engine.fixture_docs
    nid = d["alice"].get_node_id()
    df = cypher_to_dataframe(
        engine, f"START a = node({nid}) MATCH (a)-[r:visits]->(b) RETURN r;"
    )
    assert df.count() == 2
    assert set(r.type for r in df.collect()) == {"visits"}


# -- relationships.bidirectional option (reference src/mongraph.coffee:25,
# -- behavior mirrored from test/tests.coffee:419-430) --------------------------


def test_bidirectional_edges(spark):
    from mongraph_spark import Mongraph
    from mongraph_spark.schema import CollectionSchema, FieldSpec

    eng = Mongraph(spark, relationships={"bidirectional": True})
    eng.register_collection(
        CollectionSchema(name="people", fields={"name": FieldSpec(type=str, graph=True)})
    )
    a = eng.create_document("people", {"name": "a"}).save()
    b = eng.create_document("people", {"name": "b"}).save()
    a.create_relationship_to(b, "knows")
    # one logical edge, stored as two directed rows
    assert eng.count_edges() == 2
    assert len(a.outgoing_relationships("knows")) == 1
    assert len(a.incoming_relationships("knows")) == 1
    assert len(b.outgoing_relationships("knows")) == 1
    assert len(b.incoming_relationships("knows")) == 1
    # default engine stays unidirectional
    eng2 = Mongraph(spark)
    eng2.register_collection(
        CollectionSchema(name="people", fields={"name": FieldSpec(type=str, graph=True)})
    )
    c = eng2.create_document("people", {"name": "c"}).save()
    d = eng2.create_document("people", {"name": "d"}).save()
    c.create_relationship_to(d, "knows")
    assert eng2.count_edges() == 1
    assert len(c.incoming_relationships("knows")) == 0


def test_bidirectional_delete_removes_mirror(spark):
    """Deleting relationships matched in ONE direction must also remove the
    mirror rows created by relationships.bidirectional — no orphaned
    reverse edges."""
    from mongraph_spark import Mongraph
    from mongraph_spark.schema import CollectionSchema, FieldSpec

    eng = Mongraph(spark, relationships={"bidirectional": True})
    eng.register_collection(
        CollectionSchema(name="people", fields={"name": FieldSpec(type=str, graph=True)})
    )
    a = eng.create_document("people", {"name": "a"}).save()
    b = eng.create_document("people", {"name": "b"}).save()
    c = eng.create_document("people", {"name": "c"}).save()
    a.create_relationship_to(b, "knows")
    a.create_relationship_to(c, "likes")
    assert eng.count_edges() == 4  # two logical edges, two mirror rows

    # matched as a->b outgoing only; the b->a mirror must go too
    a.remove_relationships_to(b, "knows")
    assert eng.count_edges() == 2
    assert len(b.outgoing_relationships("knows")) == 0
    assert len(a.incoming_relationships("knows")) == 0
    # the unrelated bidirectional pair survives intact
    assert len(a.outgoing_relationships("likes")) == 1
    assert len(c.outgoing_relationships("likes")) == 1


def test_bounded_collect_cap(spark):
    """The OLTP point-op surface hard-caps driver-side collects: under the
    cap everything comes back; over it the guard raises instead of pulling
    an unbounded row set onto the driver (VERDICT r3 #6)."""
    import pytest

    from mongraph_spark.sparkutil import bounded_collect

    df = spark.range(100)
    assert len(bounded_collect(df, cap=100)) == 100
    with pytest.raises(RuntimeError, match="collect cap"):
        bounded_collect(df, cap=10, context="test")
    # the cap is pushed into the plan as a limit, not filtered driver-side
    assert "GlobalLimit 11" in df.limit(11)._jdf.queryExecution().optimizedPlan().toString()
