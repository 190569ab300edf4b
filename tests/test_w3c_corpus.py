"""Run actual W3C SHACL-core test fixtures from the reference corpus.

Each fixture file embeds shapes + data + the expected
sh:ValidationReport (manifest format; see SURVEY.md §5). We parse the
Turtle, build the schema via the SHACL shapes-graph reader, validate
the same graph, and compare (focus_node, component) violation sets
against the embedded expected report.

Corpus: /root/reference/src/test/resources/shacl/tests/core/ —
read-only reference data (behavioral goldens, no code copied).
"""

from __future__ import annotations

import os

import pytest

from shaclex_spark.model import SH, TRIPLES_SCHEMA
from shaclex_spark.shacl_reader import ShaclReader
from shaclex_spark.sources.turtle import parse_turtle
from shaclex_spark.triggers import target_focus
from shaclex_spark.validation import ValidationEngine

CORPUS = "/root/reference/src/test/resources/shacl/tests"

# Representative slice across node/property/targets/misc categories.
CASES = [
    "core/node/datatype-001.ttl",
    "core/node/class-001.ttl",
    "core/node/class-002.ttl",
    "core/node/hasValue-001.ttl",
    "core/node/in-001.ttl",
    "core/node/minInclusive-001.ttl",
    "core/node/minInclusive-002.ttl",
    "core/node/maxInclusive-001.ttl",
    "core/node/minExclusive-001.ttl",
    "core/node/maxLength-001.ttl",
    "core/node/minLength-001.ttl",
    "core/node/nodeKind-001.ttl",
    "core/node/not-001.ttl",
    "core/node/and-002.ttl",
    "core/node/or-001.ttl",
    "core/node/xone-001.ttl",
    "core/node/closed-001.ttl",
    "core/node/closed-002.ttl",
    "core/node/disjoint-001.ttl",
    "core/node/equals-001.ttl",
    "core/node/languageIn-001.ttl",
    "core/node/pattern-001.ttl",
    "core/node/pattern-002.ttl",
    "core/property/minCount-001.ttl",
    "core/property/minCount-002.ttl",
    "core/property/maxCount-001.ttl",
    "core/property/maxCount-002.ttl",
    "core/property/datatype-001.ttl",
    "core/property/class-001.ttl",
    "core/property/hasValue-001.ttl",
    "core/property/in-001.ttl",
    "core/property/nodeKind-001.ttl",
    "core/property/minLength-001.ttl",
    "core/property/maxLength-001.ttl",
    "core/property/pattern-001.ttl",
    "core/property/uniqueLang-001.ttl",
    "core/property/lessThan-001.ttl",
    "core/property/lessThanOrEquals-001.ttl",
    "core/property/disjoint-001.ttl",
    "core/property/equals-001.ttl",
    "core/property/node-001.ttl",
    "core/property/property-001.ttl",
    "core/targets/targetClass-001.ttl",
    "core/targets/targetNode-001.ttl",
    "core/targets/targetSubjectsOf-001.ttl",
    "core/targets/targetObjectsOf-001.ttl",
    "core/targets/targetClassImplicit-001.ttl",
    "core/misc/deactivated-001.ttl",
    "core/misc/deactivated-002.ttl",
    "core/misc/severity-001.ttl",
    "core/misc/severity-002.ttl",
    "core/misc/message-001.ttl",
    "core/path/path-sequence-001.ttl",
    "core/path/path-sequence-002.ttl",
    "core/path/path-alternative-001.ttl",
    "core/path/path-inverse-001.ttl",
    "core/path/path-zeroOrMore-001.ttl",
    "core/path/path-oneOrMore-001.ttl",
    "core/path/path-zeroOrOne-001.ttl",
    "core/property/qualifiedValueShape-001.ttl",
    "core/node/minInclusive-003.ttl",
    "core/targets/multipleTargets-001.ttl",
    "core/targets/targetSubjectsOf-002.ttl",
]

MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"


def expected_violations(triples) -> set[tuple[str, str]]:
    """Extract (focus_node_value, component_localname) from the
    embedded expected sh:ValidationReport."""
    by_subj: dict[str, dict[str, list]] = {}
    for s, p, o in triples:
        by_subj.setdefault(s[1], {}).setdefault(p, []).append(o)
    out = set()
    for sid, preds in by_subj.items():
        types = {o[1] for o in preds.get(
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", [])}
        if SH + "ValidationResult" not in types:
            continue
        focus = preds.get(SH + "focusNode", [None])[0]
        comp = preds.get(SH + "sourceConstraintComponent", [None])[0]
        sev = preds.get(SH + "resultSeverity", [None])[0]
        if focus is None or comp is None:
            continue
        sev_name = sev[1].split("#")[-1] if sev else "Violation"
        out.add((focus[1], comp[1].split("#")[-1], sev_name))
    return out


@pytest.mark.parametrize("case", CASES)
def test_w3c_case(spark, case):
    path = os.path.join(CORPUS, case)
    if not os.path.exists(path):
        pytest.skip(f"fixture missing: {case}")
    text = open(path).read()
    triples, _ = parse_turtle(text)

    schema = ShaclReader(triples).read()
    rows = [(s[1], p, o[0], o[1],
             o[2] if o[0] == "literal" else None, o[3])
            for s, p, o in triples]
    data = spark.createDataFrame(rows, TRIPLES_SCHEMA)

    focus = target_focus(spark, schema, data)
    engine = ValidationEngine(spark, schema, data)
    res = engine.validate(focus)
    got = {(r.focus_node, r.component, r.severity.split("#")[-1])
           for r in res.report.collect()}
    exp = expected_violations(triples)
    assert got == exp, (f"{case}:\n  got      {sorted(got)}\n"
                        f"  expected {sorted(exp)}")
