"""Node / Relationship / Path result objects (reference src/extendNode.coffee,
src/extendPath.coffee).

Thin driver-side value objects; all heavy lifting happened in the DataFrame
plan before these are materialized.
"""

from __future__ import annotations

from typing import Any


class Node:
    """Mirror node of exactly one document (reference extendNode.coffee)."""

    def __init__(self, node_id: int, _id: str, collection: str, data: dict[str, Any] | None = None):
        self.id = node_id
        self._id = _id
        self._collection = collection
        self.data = dict(data or {})
        self.data.setdefault("_id", _id)
        self.data.setdefault("_collection", collection)
        self.document = None  # memoized (reference extendNode.coffee:59)

    # reference extendNode.coffee:45-49
    def get_collection_name(self) -> str | None:
        return self.data.get("_collection")

    # reference extendNode.coffee:52-55
    def get_mongo_id(self) -> str | None:
        return self.data.get("_id")

    # reference extendNode.coffee:58-64 — resolved via the engine
    def get_document(self, engine) -> dict | None:
        if self.document is None:
            coll = self.get_collection_name()
            if coll:
                self.document = engine.find_document(coll, self.get_mongo_id())
        return self.document

    # camelCase aliases for reference-API parity
    getCollectionName = get_collection_name
    getMongoId = get_mongo_id
    getDocument = get_document

    def __repr__(self) -> str:
        return f"Node({self.id}, {self._collection}:{self._id})"


class Relationship:
    """Directed typed edge result; ``from_``/``to`` hold populated documents
    (reference attaches ``.from``/``.to``, src/processtools.coffee:206)."""

    def __init__(
        self,
        rel_id: int,
        src: int,
        dst: int,
        type_: str,
        data: dict[str, Any] | None = None,
        _from: str | None = None,
        _to: str | None = None,
        _created_at: int | None = None,
    ):
        self.id = rel_id
        self.src = src
        self.dst = dst
        self.type = type_
        self.data = dict(data or {})
        self._from = _from
        self._to = _to
        self._created_at = _created_at
        self.from_ = None
        self.to = None

    def __repr__(self) -> str:
        return f"Relationship({self.id}, {self.src}-[{self.type}]->{self.dst})"


class Path:
    """Ordered node/relationship sequence (reference src/extendPath.coffee:5-8)."""

    def __init__(self, node_ids: list[int]):
        self.node_ids = list(node_ids)
        self.nodes: list[Node] = []
        self.relationships: list[Relationship] = []
        self.documents: list[dict] = []  # populated + restructured form

    def __len__(self) -> int:
        return len(self.node_ids)

    def __repr__(self) -> str:
        return f"Path({self.node_ids})"
