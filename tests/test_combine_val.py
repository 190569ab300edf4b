"""Direct witness for the reference's Val.combineVal lattice
(modules/slang/src/main/scala/es/weso/slang/Val.scala:3-45) — the one
SURVEY §2.3 row that previously rested on a construction argument.

combineVal merges two pieces of EVIDENCE about the same (node, shape)
pair: Unknown is the identity, agreeing evidence stands, and
Conforms⊓NotConforms collapses to Inconsistent. This engine computes
each verdict with a SINGLE WRITER (one fused evaluation over all of a
shape's constraints per fixpoint), so:

1. Inconsistent is UNREACHABLE — there are never two conflicting
   writers to merge (the design-equivalence claim, asserted here over
   recursive, mutually-referencing and chain schemas);
2. the 4-valued surface is exactly combineVal's refinement of the two
   fixpoint polarities: status `unknown` appears iff the greatest and
   least fixpoints disagree, and `conforms` equals the reference's
   Val.isConforming projection (Conforms | Unknown ⇒ true,
   Val.scala:17-20).
"""

from __future__ import annotations

from shaclex_spark.shapes import SchemaDict
from shaclex_spark.validation import ValidationEngine

from conftest import focus_df, triples_df

EX = "http://example.org/"


def _statuses(spark, rows, shapes, focus_rows):
    t = triples_df(spark, rows)
    engine = ValidationEngine(spark, SchemaDict.from_json(shapes), t)
    res = engine.validate(focus_df(spark, focus_rows), with_status=True)
    return {(r["node"], r["shape"]): (r["conforms"], r["status"])
            for r in res.conformance.collect()}


def test_lattice_projection_and_no_inconsistent(spark):
    # mutual recursion S<->T over a data cycle + a broken chain + a
    # self-satisfied island: exercises conformant, nonconformant AND
    # unknown in one run.
    rows = [
        (EX + "a", EX + "p", "iri", EX + "b", None, None),
        (EX + "b", EX + "q", "iri", EX + "a", None, None),
        (EX + "c", EX + "p", "iri", EX + "d", None, None),   # d has no q
        (EX + "e", EX + "p", "iri", EX + "e2", None, None),
        (EX + "e2", EX + "q", "iri", EX + "e3", None, None),
        (EX + "e3", EX + "p", "iri", EX + "e2", None, None),
    ]
    shapes = [
        {"label": "S", "constraints": [
            {"path": EX + "p", "minCount": 1, "maxCount": 1,
             "exclusive": True, "node": {"kind": "ref", "label": "T"}}]},
        {"label": "T", "constraints": [
            {"path": EX + "q", "minCount": 1, "maxCount": 1,
             "exclusive": True, "node": {"kind": "ref", "label": "S"}}]},
    ]
    focus = [(EX + n, "S") for n in ("a", "c", "e")]
    st = _statuses(spark, rows, shapes, focus)

    # 1. single-writer: Inconsistent is unreachable
    assert all(s in ("conformant", "nonconformant", "unknown")
               for _, s in st.values()), st
    # 2. Val.isConforming projection: Conforms | Unknown => true
    for (node, shape), (conforms, status) in st.items():
        assert conforms == (status in ("conformant", "unknown")), \
            (node, status, conforms)
    # 3. the cycle is genuinely evidence-free in both directions
    assert st[(EX + "a", "S")] == (True, "unknown")
    assert st[(EX + "e", "S")] == (True, "unknown")
    # 4. the broken chain is DETERMINED nonconformant (both fixpoints
    #    agree: d fails T in either polarity)
    assert st[(EX + "c", "S")] == (False, "nonconformant")


def test_unknown_is_identity_under_refinement(spark):
    """combineVal(Unknown, X) = X: adding determining evidence to a
    previously-unknown pair refines it to that verdict — breaking the
    a<->b cycle with a concrete witness flips `unknown` to the
    determined value, never to Inconsistent."""
    base = [
        (EX + "a", EX + "p", "iri", EX + "b", None, None),
        (EX + "b", EX + "p", "iri", EX + "a", None, None),
    ]
    shapes = [{"label": "S", "constraints": [
        {"path": EX + "p", "minCount": 1, "maxCount": 1,
         "exclusive": True, "node": {"kind": "ref", "label": "S"}}]}]
    st0 = _statuses(spark, base, shapes, [(EX + "a", "S")])
    assert st0[(EX + "a", "S")] == (True, "unknown")
    # evidence: b gains a SECOND p-arc -> b violates maxCount in every
    # polarity -> a's value fails S -> a determined nonconformant
    refined = base + [(EX + "b", EX + "p", "iri", EX + "zz", None, None)]
    st1 = _statuses(spark, refined, shapes, [(EX + "a", "S")])
    assert st1[(EX + "a", "S")] == (False, "nonconformant")
