"""Round-5: SHACL shapes graphs beyond Turtle (VERDICT r4 task #5).

The reference accepts shapes in any Jena-supported RDF serialization
(modules/schema/.../DataFormats.scala:8-20). Here: the SAME shapes
document written in Turtle and in RDF/XML must compile to schemas
that validate identical data identically (round-trip fixture), and
unsupported formats must fail with the NAMED ShaclFormatError, not a
parse failure.
"""

from __future__ import annotations

import pytest

from shaclex_spark.model import TRIPLES_SCHEMA
from shaclex_spark.shacl_reader import (ShaclFormatError, schema_from_rdf,
                                        schema_from_turtle)
from shaclex_spark.triggers import target_focus
from shaclex_spark.validation import ValidationEngine

EX = "http://example.org/"

# one fixture, two serializations: targetClass + property bnode with
# path/minCount/datatype + sh:or over a parseType=Collection list +
# nodeKind — the constructs a real SHACL shapes doc exercises
TTL = f"""
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@prefix ex: <{EX}> .

ex:PersonShape a sh:NodeShape ;
  sh:targetClass ex:Person ;
  sh:nodeKind sh:IRI ;
  sh:property [
    sh:path ex:name ;
    sh:minCount 1 ;
    sh:datatype xsd:string ;
  ] ;
  sh:or ( [ sh:class ex:Employee ] [ sh:class ex:Contractor ] ) .
"""

XML = f"""<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:sh="http://www.w3.org/ns/shacl#"
         xmlns:ex="{EX}">
  <sh:NodeShape rdf:about="{EX}PersonShape">
    <sh:targetClass rdf:resource="{EX}Person"/>
    <sh:nodeKind rdf:resource="http://www.w3.org/ns/shacl#IRI"/>
    <sh:property rdf:parseType="Resource">
      <sh:path rdf:resource="{EX}name"/>
      <sh:minCount rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">1</sh:minCount>
      <sh:datatype rdf:resource="http://www.w3.org/2001/XMLSchema#string"/>
    </sh:property>
    <sh:or rdf:parseType="Collection">
      <rdf:Description>
        <sh:class rdf:resource="{EX}Employee"/>
      </rdf:Description>
      <rdf:Description>
        <sh:class rdf:resource="{EX}Contractor"/>
      </rdf:Description>
    </sh:or>
  </sh:NodeShape>
</rdf:RDF>
"""

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _conformance(spark, schema):
    rows = [
        # ok: Person+Employee with a string name
        (EX + "p1", RDF_TYPE, "iri", EX + "Person", None, None),
        (EX + "p1", RDF_TYPE, "iri", EX + "Employee", None, None),
        (EX + "p1", EX + "name", "literal", "Ada", XSD_STRING, None),
        # violation: no name
        (EX + "p2", RDF_TYPE, "iri", EX + "Person", None, None),
        (EX + "p2", RDF_TYPE, "iri", EX + "Contractor", None, None),
        # violation: neither Employee nor Contractor (sh:or)
        (EX + "p3", RDF_TYPE, "iri", EX + "Person", None, None),
        (EX + "p3", EX + "name", "literal", "Bob", XSD_STRING, None),
    ]
    data = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    focus = target_focus(spark, schema, data)
    res = ValidationEngine(spark, schema, data).validate(focus)
    return {r.node: r.conforms for r in res.conformance.collect()}


def test_rdfxml_shapes_round_trip(spark):
    c_ttl = _conformance(spark, schema_from_turtle(TTL))
    c_xml = _conformance(spark, schema_from_rdf(XML, "rdf/xml"))
    assert c_ttl == {EX + "p1": True, EX + "p2": False, EX + "p3": False}
    assert c_xml == c_ttl


def test_format_aliases():
    for fmt in ("RDF/XML", "rdfxml", "xml"):
        assert schema_from_rdf(XML, fmt).shapes
    for fmt in ("turtle", "TTL"):
        assert schema_from_rdf(TTL, fmt).shapes


def test_unsupported_format_named_error():
    for fmt in ("json-ld", "trig", "n3", "hdt"):
        with pytest.raises(ShaclFormatError, match="unsupported"):
            schema_from_rdf("{}", fmt)


def test_rdfxml_malformed_named_error():
    from shaclex_spark.sources.rdfxml import RdfXmlError

    with pytest.raises(RdfXmlError, match="well-formed"):
        schema_from_rdf("<rdf:RDF", "rdf/xml")
