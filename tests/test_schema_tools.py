from __future__ import annotations

from shaclex_spark.schema_tools import (
    inline_single_use_shapes,
    schema_info,
    traverse,
)
from shaclex_spark.shapes import SchemaDict

from conftest import triples_df

EX = "http://example.org/"


def test_schema_info(spark):
    schema = SchemaDict.from_json([
        {"label": "A", "constraints": [
            {"path": EX + "p", "node": {"kind": "ref", "label": "B"}}]},
        {"label": "B", "constraints": [
            {"path": EX + "q", "node": {"kind": "ref", "label": "A"}}]},
    ])
    info = schema_info(schema)
    assert info["isWellFormed"]
    assert info["recursive_components"] == [sorted(["A", "B"])] or \
        sorted(info["recursive_components"][0]) == ["A", "B"]


def test_linter_inlines_single_use(spark):
    schema = SchemaDict.from_json([
        {"label": "Main", "constraints": [
            {"path": EX + "p", "node": {"kind": "ref", "label": "_helper"}}]},
        {"label": "_helper",
         "nodeConstraints": [{"kind": "nodeKind", "value": "IRI"}]},
    ])
    out = inline_single_use_shapes(schema)
    assert "_helper" not in out.shapes
    pc = out.shapes["Main"].properties[0]
    assert pc.node.kind == "nodeKind"


def test_traverse(spark):
    t = triples_df(spark, [
        (EX + "a", EX + "p", "iri", EX + "b", None, None),
        (EX + "b", EX + "p", "iri", EX + "c", None, None),
        (EX + "x", EX + "p", "iri", EX + "y", None, None),  # unreachable
        (EX + "c", EX + "p", "literal", "leaf", None, None),
    ])
    start = spark.createDataFrame([(EX + "a",)], "node string")
    got = {r.node for r in traverse(t, start).collect()}
    assert got == {EX + "a", EX + "b", EX + "c"}
