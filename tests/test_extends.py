"""ShEx 2.1 EXTENDS (inheritance) golden tests.

Reference fixture /root/reference/src/test/resources/shexLocal/
inheritance/simple1.shex: `:A extends :B { … }` — a node conforms to
the extending shape iff its neighbourhood satisfies the parent's
triple expression AND its own (EachOf partition semantics)."""

from __future__ import annotations

from shaclex_spark.shexc2j import shexc_to_shexj
from shaclex_spark.shexj import parse_shexj
from shaclex_spark.validation import ValidationEngine

from conftest import triples_df

EX = "http:/example.org/"

SIMPLE1 = f"""
prefix : <{EX}>

:B {{ :a [1 2] }}
:A extends :B {{ :a [3 4 ] }}
"""


def _validate(spark, shex_text, rows, assoc):
    schema, _start = parse_shexj(shexc_to_shexj(shex_text))
    triples = triples_df(spark, rows)
    focus = spark.createDataFrame(
        [(n, s, "node", "iri", None, None) for n, s in assoc],
        "node string, shape string, selector string, node_kind string, "
        "node_dt string, node_lang string")
    res = ValidationEngine(spark, schema, triples).validate(focus)
    return {(r.node, r.shape): r.conforms
            for r in res.conformance.collect()}


def _lit(v):
    return ("literal", v, "http://www.w3.org/2001/XMLSchema#integer", None)


def test_extends_parses_to_merged_eachof():
    j = shexc_to_shexj(SIMPLE1)
    a = [s for s in j["shapes"] if s["id"] == EX + "A"][0]
    assert a.get("extends") == [EX + "B"]
    schema, _ = parse_shexj(j)
    assert EX + "A" in schema.shapes and EX + "B" in schema.shapes


def test_extends_requires_parent_and_child_arcs(spark):
    # node with :a→1 (parent-only) and :a→3 (child-only): conforms
    rows = [
        (EX + "n1", EX + "a", *_lit("1")),
        (EX + "n1", EX + "a", *_lit("3")),
        (EX + "n2", EX + "a", *_lit("3")),   # missing parent arc
        (EX + "n3", EX + "a", *_lit("1")),   # missing child arc
        (EX + "n4", EX + "a", *_lit("1")),
        (EX + "n4", EX + "a", *_lit("2")),   # 1,2: child unmatched
    ]
    conf = _validate(
        spark, SIMPLE1,
        rows,
        [(EX + f"n{i}", EX + "A") for i in (1, 2, 3, 4)]
        + [(EX + "n3", EX + "B")])
    assert conf[(EX + "n1", EX + "A")] is True
    assert conf[(EX + "n2", EX + "A")] is False
    assert conf[(EX + "n3", EX + "A")] is False
    assert conf[(EX + "n4", EX + "A")] is False
    # plain parent shape unaffected by the child's declaration
    assert conf[(EX + "n3", EX + "B")] is True


def test_extends_chain_and_extra(spark):
    shex = f"""
    prefix : <{EX}>
    :C {{ :c [1] }}
    :B extends :C {{ :b [2] }}
    :A extends :B {{ :a [3] }}
    """
    rows = [
        (EX + "m1", EX + "c", *_lit("1")),
        (EX + "m1", EX + "b", *_lit("2")),
        (EX + "m1", EX + "a", *_lit("3")),
        (EX + "m2", EX + "b", *_lit("2")),   # no grandparent arc
        (EX + "m2", EX + "a", *_lit("3")),
    ]
    conf = _validate(spark, shex, rows,
                     [(EX + "m1", EX + "A"), (EX + "m2", EX + "A")])
    assert conf[(EX + "m1", EX + "A")] is True
    assert conf[(EX + "m2", EX + "A")] is False


def test_extends_node_constraint_parent(spark):
    shex = f"""
    prefix : <{EX}>
    :NC iri
    :A extends :NC {{ :a [1] }}
    """
    rows = [
        (EX + "k1", EX + "a", *_lit("1")),
    ]
    conf = _validate(spark, shex, rows, [(EX + "k1", EX + "A")])
    assert conf[(EX + "k1", EX + "A")] is True


def test_extends_cycle_rejected():
    shex = f"""
    prefix : <{EX}>
    :A extends :B {{ :a [1] }}
    :B extends :A {{ :b [2] }}
    """
    import pytest
    with pytest.raises(Exception):
        parse_shexj(shexc_to_shexj(shex))

def test_restricts_rejected():
    """ShEx 2.1 RESTRICTS is a restriction (no arc-partition
    contribution); until real semantics land it must be rejected with
    a named error, not silently validated as EXTENDS."""
    import pytest
    from shaclex_spark.shexc2j import ShExCError
    shex = f"""
    prefix : <{EX}>
    :B {{ :a [1 2] }}
    :A restricts :B {{ :a [1] }}
    """
    with pytest.raises(ShExCError, match="RESTRICTS"):
        shexc_to_shexj(shex)


ABSTRACT1 = f"""
prefix : <{EX}>
abstract :B {{ :a [1 2] }}
:A extends :B {{ :b [3] }}
"""


def test_abstract_parses_flag():
    j = shexc_to_shexj(ABSTRACT1)
    b = [s for s in j["shapes"] if s["id"] == EX + "B"][0]
    assert b.get("abstract") is True


def test_abstract_dispatches_to_extenders(spark):
    """An abstract shape is not directly satisfiable by its own body:
    direct focus on it conforms iff the node conforms to some
    EXTENDS-ing shape (virtual dispatch, ShEx 2.1)."""
    rows = [
        # n1 satisfies the full extender A (parent body + child body)
        (EX + "n1", EX + "a", *_lit("1")),
        (EX + "n1", EX + "b", *_lit("3")),
        # n2 satisfies only B's own body — abstract, so NOT conformant
        (EX + "n2", EX + "a", *_lit("1")),
    ]
    conf = _validate(spark, ABSTRACT1, rows,
                     [(EX + "n1", EX + "B"), (EX + "n2", EX + "B"),
                      (EX + "n1", EX + "A"), (EX + "n2", EX + "A")])
    assert conf[(EX + "n1", EX + "A")] is True
    assert conf[(EX + "n1", EX + "B")] is True   # via dispatch to A
    assert conf[(EX + "n2", EX + "A")] is False
    assert conf[(EX + "n2", EX + "B")] is False  # own body alone is moot


def test_abstract_without_extender_never_conforms(spark):
    shex = f"""
    prefix : <{EX}>
    abstract :B {{ :a [1 2] }}
    """
    rows = [(EX + "n1", EX + "a", *_lit("1"))]
    conf = _validate(spark, shex, rows, [(EX + "n1", EX + "B")])
    assert conf[(EX + "n1", EX + "B")] is False
