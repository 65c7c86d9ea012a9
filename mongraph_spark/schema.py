"""Collection registration: schemas, graph/index field opt-in, graphability.

Mirrors the reference's Mongoose-plugin surface
(src/mongraphMongoosePlugin.coffee): every graph-enabled schema gets
``_node_id`` + ``_relationships`` injected; fields opt into node sync with
``graph: True`` and into indexing with ``index: True``
(reference README.md:176-191, src/extendDocument.coffee:368-387); nested
field paths flatten with ``'.'`` separators
(``flattenSeperator = '.'``, src/extendDocument.coffee:373).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import types as T

FLATTEN_SEPARATOR = "."  # reference src/extendDocument.coffee:373

HOOK_NAMES = (
    # individually disableable middleware hooks
    # (reference src/mongraphMongoosePlugin.coffee:10-23)
    "findAndConnectCorrespondingNode",
    "removeCorrespondingNode",
    "updateCorrespondingNode",
)


@dataclass
class FieldSpec:
    type: Any = str
    graph: bool = False
    index: bool = False
    fields: dict[str, "FieldSpec"] | None = None  # nested object


@dataclass
class CollectionSchema:
    name: str
    fields: dict[str, FieldSpec] = field(default_factory=dict)
    graphability: bool | dict[str, bool] = True
    virtuals: dict[str, Callable[[dict], Any]] = field(default_factory=dict)

    def hook_enabled(self, hook: str) -> bool:
        if self.graphability is False:
            return False
        if isinstance(self.graphability, dict):
            return bool(self.graphability.get(hook, True))
        return True

    @property
    def graph_enabled(self) -> bool:
        return self.graphability is not False

    def graph_fields(self, index_only: bool = False) -> list[str]:
        """Flattened paths of fields with ``graph: True`` (optionally only the
        indexed subset) — reference src/extendDocument.coffee:376-381."""
        out: list[str] = []

        def walk(specs: dict[str, FieldSpec], prefix: str) -> None:
            for name, spec in specs.items():
                path = f"{prefix}{FLATTEN_SEPARATOR}{name}" if prefix else name
                if spec.fields:
                    walk(spec.fields, path)
                elif spec.graph and (spec.index or not index_only):
                    out.append(path)

        walk(self.fields, "")
        return out

    def spark_schema(self) -> T.StructType:
        """Derive a flat-ish Spark schema (nested objects become structs)."""

        def to_dtype(spec: FieldSpec) -> T.DataType:
            if spec.fields:
                return T.StructType(
                    [T.StructField(n, to_dtype(s), True) for n, s in spec.fields.items()]
                )
            mapping = {str: T.StringType(), int: T.LongType(), float: T.DoubleType(), bool: T.BooleanType()}
            return mapping.get(spec.type, T.StringType())

        base = [T.StructField("_id", T.StringType(), False)]
        base += [T.StructField(n, to_dtype(s), True) for n, s in self.fields.items()]
        base += [T.StructField("_node_id", T.LongType(), True)]
        return T.StructType(base)


def flatten_doc(doc: dict[str, Any], paths: list[str]) -> dict[str, Any]:
    """Project selected flattened paths out of a (possibly nested) document;
    ``None``/missing values are skipped (reference skips undefined,
    src/extendDocument.coffee:404)."""
    out: dict[str, Any] = {}
    for path in paths:
        cur: Any = doc
        for part in path.split(FLATTEN_SEPARATOR):
            if not isinstance(cur, dict):
                cur = None
                break
            cur = cur.get(part)
        if cur is not None:
            out[path] = cur
    return out
