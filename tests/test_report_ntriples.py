"""Sinks + N-Triples source round-trip tests."""

from __future__ import annotations

from shaclex_spark.report import (
    report_to_turtle,
    result_shape_map_compact,
    triples_to_dot,
    triples_to_json,
)
from shaclex_spark.sources.ntriples import (
    parse_ntriples_string,
    triples_to_ntriples,
)

from conftest import triples_df

EX = "http://example.org/"

NT = """
<http://example.org/a> <http://example.org/p> <http://example.org/b> .
_:b0 <http://example.org/p> "plain" .
<http://example.org/a> <http://example.org/q> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://example.org/a> <http://example.org/r> "hi"@en .
# a comment line
"""


def test_ntriples_parse_and_roundtrip(spark):
    t = parse_ntriples_string(spark, NT)
    rows = {(r.subj, r.pred, r.obj_kind, r.obj_value, r.obj_dt, r.obj_lang)
            for r in t.collect()}
    assert (EX + "a", EX + "p", "iri", EX + "b", None, None) in rows
    assert ("_:b0", EX + "p", "literal", "plain",
            "http://www.w3.org/2001/XMLSchema#string", None) in rows
    assert (EX + "a", EX + "q", "literal", "5",
            "http://www.w3.org/2001/XMLSchema#integer", None) in rows
    assert (EX + "a", EX + "r", "literal", "hi",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en") in rows
    assert len(rows) == 4
    # round-trip: serialize → reparse → identical set
    serialized = "\n".join(r.value for r in triples_to_ntriples(t).collect())
    t2 = parse_ntriples_string(spark, serialized)
    rows2 = {(r.subj, r.pred, r.obj_kind, r.obj_value, r.obj_dt, r.obj_lang)
             for r in t2.collect()}
    assert rows2 == rows


def test_report_turtle_and_shapemap(spark):
    report = spark.createDataFrame(
        [(EX + "bad", "S", "MinCountConstraintComponent", "Violation",
          None, EX + "name", None)],
        "focus_node string, source_shape string, component string, "
        "severity string, value string, path string, message string")
    ttl = report_to_turtle(report)
    assert "sh:conforms false" in ttl
    assert f"sh:focusNode <{EX}bad>" in ttl
    assert "sh:MinCountConstraintComponent" in ttl

    empty = report.limit(0)
    assert "sh:conforms true" in report_to_turtle(empty)

    conf = spark.createDataFrame(
        [(EX + "a", "S", True), (EX + "b", "S", False)],
        "node string, shape string, conforms boolean")
    compact = result_shape_map_compact(conf)
    assert f"<{EX}a>@S" in compact
    assert f"<{EX}b>@!S" in compact


def test_dot_json_export(spark):
    t = triples_df(spark, [
        (EX + "a", EX + "p", "iri", EX + "b", None, None),
        (EX + "b", EX + "p", "iri", EX + "c", None, None),
    ])
    dot = triples_to_dot(t)
    assert dot.startswith("digraph {")
    assert '->' in dot
    js = triples_to_json(t)
    labels = {d["data"].get("label") for d in js}
    assert EX + "a" in labels and EX + "p" in labels
