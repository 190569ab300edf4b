"""Golden tests for the core constraint compiler, re-encoded from the
reference corpora (see FIXTURES.md §7 for the case ↔ reference mapping).

Each case: triples + shapes JSON + focus rows → expected conformance
statuses (and sometimes expected report components).
"""

from __future__ import annotations

from shaclex_spark.model import XSD_INTEGER, XSD_STRING, RDF_TYPE
from shaclex_spark.shapes import SchemaDict
from shaclex_spark.validation import ValidationEngine

from conftest import focus_df, triples_df

EX = "http://example.org/"


def lit(v, dt=XSD_STRING, lang=None):
    return ("literal", v, "rdf:langString" if lang else dt, lang)


def run(spark, rows, shapes, focus_rows):
    t = triples_df(spark, rows)
    schema = SchemaDict.from_json(shapes)
    engine = ValidationEngine(spark, schema, t)
    res = engine.validate(focus_df(spark, focus_rows))
    conf = {(r["node"], r["shape"]): r["conforms"] for r in res.conformance.collect()}
    report = res.report.collect()
    return conf, report


def test_datatype_cardinality(spark):
    """good1-datatype-card: sh:datatype + min/maxCount pass & fail
    (reference: /root/reference/examples/shacl/good1.ttl)."""
    rows = [
        (EX + "alice", EX + "name", *lit("Alice")),
        (EX + "bob", EX + "name", *lit("Bob")),
        (EX + "bob", EX + "name", *lit("Robert")),          # maxCount=1 violated
        (EX + "carol", EX + "age", *lit("x", XSD_INTEGER)),  # no name: minCount
        (EX + "dave", EX + "name", ("iri", EX + "Dave", None, None)[0],
         EX + "Dave", None, None),                           # iri not literal
    ]
    shapes = [{
        "label": "PersonShape",
        "constraints": [{
            "path": EX + "name", "minCount": 1, "maxCount": 1,
            "node": {"kind": "datatype", "iri": XSD_STRING},
        }],
    }]
    focus = [(EX + p, "PersonShape") for p in ("alice", "bob", "carol", "dave")]
    conf, report = run(spark, rows, shapes, focus)
    assert conf[(EX + "alice", "PersonShape")] is True
    assert conf[(EX + "bob", "PersonShape")] is False
    assert conf[(EX + "carol", "PersonShape")] is False
    assert conf[(EX + "dave", "PersonShape")] is False
    comps = {(r.focus_node, r.component) for r in report}
    assert (EX + "bob", "MaxCountConstraintComponent") in comps
    assert (EX + "carol", "MinCountConstraintComponent") in comps
    assert (EX + "dave", "DatatypeConstraintComponent") in comps


def test_ill_typed_literal_violates(spark):
    """datatype-001: ill-formed integer literal ⇒ violation
    (reference: shacl/tests/core/node/datatype-001.ttl)."""
    rows = [
        (EX + "a", EX + "age", *lit("23", XSD_INTEGER)),
        (EX + "b", EX + "age", *lit("aldi", XSD_INTEGER)),  # ill-formed
    ]
    shapes = [{
        "label": "S",
        "constraints": [{"path": EX + "age",
                         "node": {"kind": "datatype", "iri": XSD_INTEGER}}],
    }]
    conf, _ = run(spark, rows, shapes, [(EX + "a", "S"), (EX + "b", "S")])
    assert conf[(EX + "a", "S")] is True
    assert conf[(EX + "b", "S")] is False


def test_closed_shape(spark):
    """closed-001: predicates outside declared+ignored ⇒ violation."""
    rows = [
        (EX + "ok", EX + "name", *lit("A")),
        (EX + "bad", EX + "name", *lit("B")),
        (EX + "bad", EX + "other", *lit("zzz")),
    ]
    shapes = [{
        "label": "S", "closed": True, "extra": [RDF_TYPE],
        "constraints": [{"path": EX + "name"}],
    }]
    conf, report = run(spark, rows, shapes, [(EX + "ok", "S"), (EX + "bad", "S")])
    assert conf[(EX + "ok", "S")] is True
    assert conf[(EX + "bad", "S")] is False
    assert any(r.component == "ClosedConstraintComponent" and r.path == EX + "other"
               for r in report)


def test_node_kind_in_hasvalue_pattern(spark):
    rows = [
        (EX + "x", EX + "ref", "iri", EX + "tgt", None, None),
        (EX + "x", EX + "color", *lit("red")),
        (EX + "x", EX + "code", *lit("AB-12")),
        (EX + "y", EX + "ref", *lit("notiri")),
        (EX + "y", EX + "color", *lit("purple")),
        (EX + "y", EX + "code", *lit("nope")),
    ]
    shapes = [{
        "label": "S",
        "constraints": [
            {"path": EX + "ref", "node": {"kind": "nodeKind", "value": "IRI"}},
            {"path": EX + "color",
             "node": {"kind": "in", "values": [
                 {"kind": "literal", "value": "red"},
                 {"kind": "literal", "value": "blue"}]}},
            {"path": EX + "code", "node": {"kind": "pattern", "pattern": "^[A-Z]{2}-\\d+$"}},
        ],
    }]
    conf, _ = run(spark, rows, shapes, [(EX + "x", "S"), (EX + "y", "S")])
    assert conf[(EX + "x", "S")] is True
    assert conf[(EX + "y", "S")] is False


def test_has_value_existential(spark):
    """hasValue-001: at least one value equals v (per focus, not per value)."""
    rows = [
        (EX + "x", EX + "tag", *lit("a")),
        (EX + "x", EX + "tag", *lit("wanted")),
        (EX + "y", EX + "tag", *lit("a")),
    ]
    shapes = [{
        "label": "S",
        "constraints": [{"path": EX + "tag",
                         "node": {"kind": "hasValue",
                                  "value": {"kind": "literal", "value": "wanted"}}}],
    }]
    conf, _ = run(spark, rows, shapes, [(EX + "x", "S"), (EX + "y", "S")])
    assert conf[(EX + "x", "S")] is True
    assert conf[(EX + "y", "S")] is False


def test_class_constraint(spark):
    """class-001: value must have rdf:type → C arc."""
    rows = [
        (EX + "x", EX + "pet", "iri", EX + "rex", None, None),
        (EX + "rex", RDF_TYPE, "iri", EX + "Dog", None, None),
        (EX + "y", EX + "pet", "iri", EX + "tom", None, None),
        (EX + "tom", RDF_TYPE, "iri", EX + "Cat", None, None),
    ]
    shapes = [{
        "label": "S",
        "constraints": [{"path": EX + "pet", "node": {"kind": "class", "iri": EX + "Dog"}}],
    }]
    conf, _ = run(spark, rows, shapes, [(EX + "x", "S"), (EX + "y", "S")])
    assert conf[(EX + "x", "S")] is True
    assert conf[(EX + "y", "S")] is False


def test_logical_combinators(spark):
    """and-002 / or / xone / not over node constraints."""
    rows = [
        (EX + "a", EX + "v", *lit("5", XSD_INTEGER)),
        (EX + "b", EX + "v", *lit("50", XSD_INTEGER)),
        (EX + "c", EX + "v", *lit("nope")),
    ]
    shapes = [{
        "label": "S",
        "constraints": [{
            "path": EX + "v",
            "node": {"kind": "and", "exprs": [
                {"kind": "datatype", "iri": XSD_INTEGER},
                {"kind": "or", "exprs": [
                    {"kind": "maxInclusive", "value": "10"},
                    {"kind": "minInclusive", "value": "100"}]},
            ]},
        }],
    }]
    conf, _ = run(spark, rows, shapes,
                  [(EX + x, "S") for x in ("a", "b", "c")])
    assert conf[(EX + "a", "S")] is True
    assert conf[(EX + "b", "S")] is False
    assert conf[(EX + "c", "S")] is False


def test_xone(spark):
    """xone-001: exactly one member conforms."""
    rows = [
        (EX + "both", EX + "v", *lit("5", XSD_INTEGER)),     # int AND <=10: both
        (EX + "one", EX + "v", *lit("50", XSD_INTEGER)),     # int only
        (EX + "none", EX + "v", *lit("x")),                  # neither
    ]
    shapes = [{
        "label": "S",
        "constraints": [{
            "path": EX + "v",
            "node": {"kind": "xone", "exprs": [
                {"kind": "datatype", "iri": XSD_INTEGER},
                {"kind": "maxInclusive", "value": "10"}]},
        }],
    }]
    conf, _ = run(spark, rows, shapes,
                  [(EX + x, "S") for x in ("both", "one", "none")])
    assert conf[(EX + "both", "S")] is False
    assert conf[(EX + "one", "S")] is True
    assert conf[(EX + "none", "S")] is False


def test_shape_ref_acyclic(spark):
    """node-001 / ShapeRef: value conforms to referenced shape."""
    rows = [
        (EX + "o1", EX + "cust", "iri", EX + "good", None, None),
        (EX + "good", EX + "name", *lit("G")),
        (EX + "o2", EX + "cust", "iri", EX + "bad", None, None),
        # bad has no name → fails CustShape
    ]
    shapes = [
        {"label": "OrderShape",
         "constraints": [{"path": EX + "cust", "minCount": 1,
                          "node": {"kind": "ref", "label": "CustShape"}}]},
        {"label": "CustShape",
         "constraints": [{"path": EX + "name", "minCount": 1}]},
    ]
    conf, report = run(spark, rows, shapes,
                       [(EX + "o1", "OrderShape"), (EX + "o2", "OrderShape")])
    assert conf[(EX + "o1", "OrderShape")] is True
    assert conf[(EX + "o2", "OrderShape")] is False
    assert any(r.component == "NodeConstraintComponent" for r in report)


def test_recursion_coinductive(spark):
    """recursion-simple (002-recursion.ttl): cyclic ref, greatest
    fixpoint — a self-referential cycle where all local constraints
    hold must CONFORM (Unknown counts as ok, ShapesMap.scala:19-23)."""
    rows = [
        (EX + "a", EX + "knows", "iri", EX + "b", None, None),
        (EX + "b", EX + "knows", "iri", EX + "a", None, None),
        (EX + "a", EX + "name", *lit("A")),
        (EX + "b", EX + "name", *lit("B")),
        # c -> d, d has no name → d fails → c fails through the ref
        (EX + "c", EX + "knows", "iri", EX + "d", None, None),
        (EX + "c", EX + "name", *lit("C")),
        (EX + "d", EX + "knows", "iri", EX + "c", None, None),
    ]
    shapes = [{
        "label": "P",
        "constraints": [
            {"path": EX + "name", "minCount": 1},
            {"path": EX + "knows", "node": {"kind": "ref", "label": "P"}},
        ],
    }]
    conf, _ = run(spark, rows, shapes,
                  [(EX + x, "P") for x in ("a", "b", "c", "d")])
    assert conf[(EX + "a", "P")] is True
    assert conf[(EX + "b", "P")] is True
    assert conf[(EX + "c", "P")] is False  # knows d, d lacks name
    assert conf[(EX + "d", "P")] is False


def test_shex_exclusive_counts(spark):
    """paper-user-course: ShEx TripleConstraint two-count semantics —
    right count of conforming values AND no non-conforming value
    (ShEx2SLang.scala:103-113)."""
    rows = [
        (EX + "alice", EX + "age", *lit("30", XSD_INTEGER)),
        (EX + "bob", EX + "age", *lit("None")),  # not an integer
    ]
    shapes = [{
        "label": "User",
        "constraints": [{
            "path": EX + "age", "minCount": 1, "maxCount": 1, "exclusive": True,
            "node": {"kind": "datatype", "iri": XSD_INTEGER},
        }],
    }]
    conf, _ = run(spark, rows, shapes,
                  [(EX + "alice", "User"), (EX + "bob", "User")])
    assert conf[(EX + "alice", "User")] is True
    assert conf[(EX + "bob", "User")] is False


def test_qualified_value_shape(spark):
    """qualifiedValueShape: count-conforming-only semantics; extra
    non-conforming values tolerated."""
    rows = [
        (EX + "x", EX + "member", "iri", EX + "m1", None, None),
        (EX + "m1", RDF_TYPE, "iri", EX + "Dog", None, None),
        (EX + "x", EX + "member", "iri", EX + "m2", None, None),  # not a Dog: fine
        (EX + "y", EX + "member", "iri", EX + "m3", None, None),  # no Dog at all
    ]
    shapes = [{
        "label": "S",
        "constraints": [{
            "path": EX + "member", "minCount": 1, "qualified": True,
            "node": {"kind": "class", "iri": EX + "Dog"},
        }],
    }]
    conf, _ = run(spark, rows, shapes, [(EX + "x", "S"), (EX + "y", "S")])
    assert conf[(EX + "x", "S")] is True
    assert conf[(EX + "y", "S")] is False


def test_unique_lang(spark):
    rows = [
        (EX + "x", EX + "label", *lit("hi", None, "en")),
        (EX + "x", EX + "label", *lit("hola", None, "es")),
        (EX + "y", EX + "label", *lit("hi", None, "en")),
        (EX + "y", EX + "label", *lit("hello", None, "en")),
    ]
    shapes = [{
        "label": "S",
        "constraints": [{"path": EX + "label", "uniqueLang": True}],
    }]
    conf, report = run(spark, rows, shapes, [(EX + "x", "S"), (EX + "y", "S")])
    assert conf[(EX + "x", "S")] is True
    assert conf[(EX + "y", "S")] is False
    assert any(r.component == "UniqueLangConstraintComponent" for r in report)


def test_equals_disjoint_lessthan(spark):
    rows = [
        # equals: ok node has same values on both preds
        (EX + "e1", EX + "a", *lit("v")),
        (EX + "e1", EX + "b", *lit("v")),
        (EX + "e2", EX + "a", *lit("v")),
        (EX + "e2", EX + "b", *lit("w")),
        # lessThan
        (EX + "l1", EX + "lo", *lit("1", XSD_INTEGER)),
        (EX + "l1", EX + "hi", *lit("2", XSD_INTEGER)),
        (EX + "l2", EX + "lo", *lit("5", XSD_INTEGER)),
        (EX + "l2", EX + "hi", *lit("2", XSD_INTEGER)),
    ]
    shapes = [
        {"label": "Eq",
         "constraints": [{"path": EX + "a", "equals": EX + "b"}]},
        {"label": "Lt",
         "constraints": [{"path": EX + "lo", "lessThan": EX + "hi"}]},
    ]
    conf, _ = run(spark, rows, shapes,
                  [(EX + "e1", "Eq"), (EX + "e2", "Eq"),
                   (EX + "l1", "Lt"), (EX + "l2", "Lt")])
    assert conf[(EX + "e1", "Eq")] is True
    assert conf[(EX + "e2", "Eq")] is False
    assert conf[(EX + "l1", "Lt")] is True
    assert conf[(EX + "l2", "Lt")] is False


def test_deactivated_shape(spark):
    rows = [(EX + "x", EX + "other", *lit("v"))]
    shapes = [{"label": "S", "deactivated": True, "closed": True,
               "constraints": [{"path": EX + "name", "minCount": 1}]}]
    conf, report = run(spark, rows, shapes, [(EX + "x", "S")])
    assert conf[(EX + "x", "S")] is True
    assert report == []
