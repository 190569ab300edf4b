"""shaclex_spark — a PySpark-native knowledge-graph construction and
shape-validation engine with the capabilities of weso/shaclex.

Not a port: the reference (Scala, node-at-a-time recursive interpreter;
see SURVEY.md) is re-expressed as set-at-a-time DataFrame programs —
the same relational rendering shaclex itself proves possible in its ASP
encoding (/root/reference/modules/slang/src/main/scala/es/weso/slang/
SLang2Clingo.scala:148-181).

Layout:
    model        — triples/focus/report schemas, RDF node taxonomy
    session      — tuned SparkSession factory
    shapes       — shape-dictionary model + parser + stratification
    paths        — SHACL property-path algebra → (src, value) pair DFs
    validation   — the constraint compiler: shapes × triples → conformance/report
    triggers     — target/shape-map compilation → focus DF
    transcripts  — deterministic synthetic transcript table (input_hint schema)
    extraction   — vectorized pandas-UDF triple extraction over turn text
    linking      — MinHash-LSH blocking + connected-components canonicalization
    infer        — schema inference (neighborhood lattice aggregation)
    sources.kg   — demo KG built from the TPC-H-ish test tables
    functions    — training-data pipeline ops: dedup, similarity, text, multimodal
"""

__version__ = "0.1.0"
