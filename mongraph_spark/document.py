"""Document facade: every graph method the reference attaches to Mongoose
documents (reference src/extendDocument.coffee), re-expressed over the
engine's DataFrame planner.

Method names keep the reference's camelCase spelling (plus snake_case
aliases) so the behavioral test suite reads like the reference's
(test/tests.coffee).  The optional trailing ``cb`` keeps the reference's
``(err, result, options)`` callback trio recognizable
(SURVEY.md §7 hard part 5); direct return values are the Python-native path.
"""

from __future__ import annotations

import time
from typing import Any, Callable

from mongraph_spark import populate as pop
from mongraph_spark.mongo_expr import mongo_match
from mongraph_spark.node import Node, Path, Relationship
from mongraph_spark.schema import flatten_doc
from mongraph_spark.traversal import TraversalQuery, parse_types


class MongraphError(Exception):
    pass


class NoGraphabilityError(MongraphError):
    """Reference returns ``Error('No graphability enabled')``
    (src/extendDocument.coffee:65,126,210,...)."""


def _finish(result, options, cb: Callable | None, err=None):
    if cb is not None:
        cb(err, result, options)
    if err is not None and cb is None:
        raise err
    return result


class Document:
    """A single document in a registered collection."""

    def __init__(self, engine, collection: str, data: dict[str, Any]):
        self._engine = engine
        self._collection = collection
        self.data = data
        self.is_new = "_id" not in data

    # -- basic accessors ------------------------------------------------------

    @property
    def _id(self) -> str | None:
        return self.data.get("_id")

    @property
    def schema(self):
        return self._engine.schema_of(self._collection)

    def _guard(self, hook: str | None = None) -> None:
        sch = self.schema
        if not sch.graph_enabled or (hook and not sch.hook_enabled(hook)):
            raise NoGraphabilityError("No graphability enabled")

    def get(self, field: str, default=None):
        cur: Any = self.data
        for part in field.split("."):
            if not isinstance(cur, dict):
                return default
            cur = cur.get(part)
        return cur if cur is not None else default

    def virtual(self, name: str):
        fn = self.schema.virtuals.get(name)
        return fn(self.data) if fn else None

    # -- lifecycle (reference mongraphMongoosePlugin.coffee:34-61) -------------

    def save(self, cb: Callable | None = None) -> "Document":
        self._engine.save_document(self)
        self.is_new = False
        return _finish(self, {}, cb)

    def remove(self, cb: Callable | None = None) -> None:
        self._engine.remove_document(self)
        return _finish(None, {}, cb)

    def update(self, set_fields: dict | None = None, unset: list[str] | None = None) -> "Document":
        """Field update incl. ``$unset`` (reference extendDocument.coffee:450-470)."""
        for k, v in (set_fields or {}).items():
            cur = self.data
            parts = k.split(".")
            for p in parts[:-1]:
                cur = cur.setdefault(p, {})
            cur[parts[-1]] = v
        for k in unset or []:
            cur = self.data
            parts = k.split(".")
            for p in parts[:-1]:
                cur = cur.get(p) or {}
            cur.pop(parts[-1], None)
        return self.save()

    # -- mirror node (reference extendDocument.coffee:124-205) -----------------

    def find_corresponding_node(
        self,
        do_create_if_not_exists: bool = False,
        force_creation: bool = False,
        force_reload: bool = False,
        cb: Callable | None = None,
    ) -> Node | None:
        self._guard()
        if self.is_new and not force_creation:
            # reference refuses unsaved docs (extendDocument.coffee:166-167)
            return _finish(
                None, {}, cb, MongraphError("document is not persisted; save it first")
            )
        node = self._engine.find_or_create_node(
            self,
            create=do_create_if_not_exists or force_creation,
            force_reload=force_reload,
        )
        return _finish(node, {}, cb)

    def find_or_create_corresponding_node(self, cb: Callable | None = None, **kw) -> Node:
        return self.find_corresponding_node(do_create_if_not_exists=True, cb=cb, **kw)

    def get_node(self, cb: Callable | None = None, **kw) -> Node:
        """Recommended alias (reference extendDocument.coffee:189-195)."""
        return self.find_or_create_corresponding_node(cb=cb, **kw)

    def get_node_id(self) -> int | None:
        """Fast path, no graph round-trip (reference extendDocument.coffee:200-205)."""
        return self.data.get("_node_id")

    # -- node data projection (reference extendDocument.coffee:368-407) --------

    def data_for_node(self, index: bool = False) -> dict[str, Any] | None:
        paths = self.schema.graph_fields(index_only=index)
        if not paths:
            return None  # reference returns null (extendDocument.coffee:384-387)
        return flatten_doc(self.data, paths)

    def index_graph(self, cb: Callable | None = None) -> list[str]:
        if self.get_node_id() is None:
            return _finish(None, {}, cb, MongraphError("no node attached to document"))
        data = self.data_for_node(index=True)
        if not data:
            return _finish(None, {}, cb, MongraphError("nothing to index"))
        # physically a no-op: equi-joins replace index lookups (SURVEY.md §4);
        # the indexed-paths list is kept as metadata for API fidelity.
        return _finish(sorted(data), {}, cb)

    # -- relationship creation (reference extendDocument.coffee:208-250) -------

    def create_relationship_to(
        self, doc: "Document", type_: str, attributes: dict | None = None, cb: Callable | None = None
    ) -> Relationship:
        self._guard()
        rel = self._engine.create_edge(self, doc, type_, attributes or {})
        return _finish(rel, {}, cb)

    def create_relationship_from(
        self, doc: "Document", type_: str, attributes: dict | None = None, cb: Callable | None = None
    ) -> Relationship:
        return doc.create_relationship_to(self, type_, attributes, cb=cb)

    def create_relationship_between(
        self, doc: "Document", type_: str, attributes: dict | None = None, cb: Callable | None = None
    ) -> list[Relationship]:
        # two directed edges, one per direction (reference test expects both
        # incoming and outgoing — test/tests.coffee:419-430)
        r1 = self.create_relationship_to(doc, type_, attributes)
        r2 = self.create_relationship_from(doc, type_, attributes)
        return _finish([r1, r2], {}, cb)

    # -- the core 1-hop query (reference extendDocument.coffee:64-120) ---------

    def query_relationships(
        self,
        type_of_relationship: str = "*",
        options: dict | None = None,
        cb: Callable | None = None,
    ):
        self._guard()
        options = dict(options or {})
        options.setdefault("direction", "both")
        options.setdefault("action", "RETURN")
        node = self.get_node()
        tq = TraversalQuery(
            anchor=node.id,
            direction=options["direction"],
            types=parse_types(type_of_relationship),
            end_node=options.get("endNodeId"),
            where_relationship=(options.get("where") or {}).get("relationship"),
            action=options["action"],
            count=options.get("count"),
            count_distinct=options.get("countDistinct"),
        )
        options.setdefault("debug", {}).setdefault("traversal", []).append(tq)

        if options["action"] == "DELETE":
            deleted = self._engine.delete_edges(tq)
            return _finish(deleted, options, cb)
        if tq.count is not None or tq.count_distinct is not None:
            n = tq.run(self._engine.store).collect()[0]["count"]
            return _finish(int(n), options, cb)

        where_doc = (options.get("where") or {}).get("document")
        collections = options.get("collection")
        if isinstance(collections, str):
            collections = [collections]
        rels = self._engine.collect_relationships(
            tq,
            load_documents=options.get("loadDocuments", True),
            where_document=where_doc,
            collections=collections,
            reference_id=self._id,
        )
        return _finish(rels, options, cb)

    # -- convenience wrappers (reference extendDocument.coffee:259-300) --------

    def all_relationships(self, type_="*", options=None, cb=None):
        options = dict(options or {})
        options["direction"] = "both"
        return self.query_relationships(type_, options, cb)

    def incoming_relationships(self, type_="*", options=None, cb=None):
        options = dict(options or {})
        options["direction"] = "incoming"
        return self.query_relationships(type_, options, cb)

    def outgoing_relationships(self, type_="*", options=None, cb=None):
        options = dict(options or {})
        options["direction"] = "outgoing"
        return self.query_relationships(type_, options, cb)

    def _between(self, doc: "Document", type_, options, cb, direction):
        options = dict(options or {})
        options["direction"] = direction
        other = doc.get_node()
        options["endNodeId"] = other.id
        return self.query_relationships(type_, options, cb)

    def all_relationships_between(self, doc, type_="*", options=None, cb=None):
        return self._between(doc, type_, options, cb, "both")

    def incoming_relationships_from(self, doc, type_="*", options=None, cb=None):
        return self._between(doc, type_, options, cb, "incoming")

    def outgoing_relationships_to(self, doc, type_="*", options=None, cb=None):
        return self._between(doc, type_, options, cb, "outgoing")

    # -- deletes (reference extendDocument.coffee:303-349) ---------------------

    def remove_relationships(self, type_="*", options=None, cb=None):
        options = dict(options or {})
        options.setdefault("direction", "both")
        options["action"] = "DELETE"
        return self.query_relationships(type_, options, cb)

    def remove_relationships_to(self, doc, type_="*", options=None, cb=None):
        options = dict(options or {})
        options.setdefault("direction", "outgoing")
        options["action"] = "DELETE"
        options["endNodeId"] = doc.get_node().id
        return self.query_relationships(type_, options, cb)

    def remove_relationships_from(self, doc, type_="*", options=None, cb=None):
        return doc.remove_relationships_to(self, type_, options, cb)

    def remove_relationships_between(self, doc, type_="*", options=None, cb=None):
        options = dict(options or {})
        options["direction"] = "both"
        options["action"] = "DELETE"
        options["endNodeId"] = doc.get_node().id
        return self.query_relationships(type_, options, cb)

    def remove_node(self, include_relationships: bool = True, cb=None):
        """Delete mirror node (+ edges by default) — OPTIONAL MATCH semantics:
        the node goes away even with zero edges
        (reference extendDocument.coffee:332-349)."""
        self._guard()
        nid = self.get_node_id()
        if nid is not None:
            self._engine.catalog.delete_node(nid, include_relationships=include_relationships)
            self.data.pop("_node_id", None)
            self._engine.save_document(self, sync_node=False)
        return _finish(None, {}, cb)

    # -- shortest path (reference extendDocument.coffee:352-366) ---------------

    def shortest_path_to(self, doc: "Document", type_: str = "", options=None, cb=None):
        self._guard()
        options = dict(options or {})
        a, b = self.get_node(), doc.get_node()
        path_ids = self._engine.shortest_path(a.id, b.id, parse_types(type_ or "*"))
        if path_ids is None:
            return _finish(None, options, cb)
        path = Path(path_ids)
        where_doc = (options.get("where") or {}).get("document")
        collections = options.get("collection")
        if isinstance(collections, str):
            collections = [collections]
        docs = []
        for nid in path_ids:
            noderow = self._engine.catalog.get_node(nid)
            if noderow is None:
                continue
            d = self._engine.find_document(noderow["_collection"], noderow["_id"])
            if d is None:
                continue
            # reference-doc exemption covers only the collection filter in the
            # path branch; the document predicate applies to every node
            # (reference src/processtools.coffee:228-236)
            is_ref = noderow["_id"] == self._id
            if not is_ref and collections and noderow["_collection"] not in collections:
                continue  # dropped, not nulled (restructure default true)
            if where_doc and not mongo_match(d, where_doc):
                continue
            docs.append(d)
        path.documents = docs
        if options.get("restructure", True):
            return _finish(docs, options, cb)
        return _finish(path, options, cb)

    # -- denormalization (reference extendDocument.coffee:412-470) --------------

    def apply_graph_relationships(self, persist: bool = True, cb=None):
        """Materialize relationships into the document grouped by type:
        ``{type: [{from: {collection,_id}, to: {collection,_id}}, ...]}``."""
        self._guard()
        rels = self.all_relationships("*", {"loadDocuments": False})
        grouped: dict[str, list[dict]] = {}
        for r in rels:
            fc, fi = r._from.split(":", 1)
            tc, ti = r._to.split(":", 1)
            grouped.setdefault(r.type, []).append(
                {"from": {"collection": fc, "_id": fi}, "to": {"collection": tc, "_id": ti}}
            )
        self.data["_relationships"] = grouped
        if persist:
            self.save()
        return _finish(grouped, {}, cb)

    # -- raw graph query passthrough (reference extendDocument.coffee:253-256) --

    def query_graph(self, cypher_query: str, options=None, cb=None):
        return self._engine.query_graph(cypher_query, options, cb)

    # camelCase aliases — reference API parity ---------------------------------
    findCorrespondingNode = find_corresponding_node
    findOrCreateCorrespondingNode = find_or_create_corresponding_node
    getNode = get_node
    getNodeId = get_node_id
    dataForNode = data_for_node
    indexGraph = index_graph
    createRelationshipTo = create_relationship_to
    createRelationshipFrom = create_relationship_from
    createRelationshipBetween = create_relationship_between
    queryRelationships = query_relationships
    allRelationships = all_relationships
    incomingRelationships = incoming_relationships
    outgoingRelationships = outgoing_relationships
    allRelationshipsBetween = all_relationships_between
    incomingRelationshipsFrom = incoming_relationships_from
    outgoingRelationshipsTo = outgoing_relationships_to
    removeRelationships = remove_relationships
    removeRelationshipsTo = remove_relationships_to
    removeRelationshipsFrom = remove_relationships_from
    removeRelationshipsBetween = remove_relationships_between
    removeNode = remove_node
    shortestPathTo = shortest_path_to
    applyGraphRelationships = apply_graph_relationships
    queryGraph = query_graph

    def __repr__(self) -> str:
        return f"Document({self._collection}:{self._id})"


def created_at_seconds() -> int:
    """Unix seconds, reference's ``Math.floor(Date.now()/1000)``
    (src/extendDocument.coffee:224-225)."""
    return int(time.time())
