"""Validation triggers: compile targets / shape maps into the focus DF.

Reference semantics: SURVEY.md §2.2 —
TargetDeclarations trigger (/root/reference/modules/schema/src/main/
scala/es/weso/schema/ValidationTrigger.scala:22-28) unions the four
SHACL target kinds (Shacl2ShEx.scala:62-68); ShapeMapTrigger resolves
node selectors against the data, the `fixShapeMap` step
(ShExSchema.scala:52-60). Every selector compiles to a filter/project
on the triples DF — the fix IS the compilation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .model import FOCUS_SCHEMA, RDF_TYPE
from .shapes import SchemaDict


def _mk(df: DataFrame, shape: str, selector: str) -> DataFrame:
    return df.select(
        F.col(df.columns[0]).alias("node"),
        F.lit(shape).alias("shape"),
        F.lit(selector).alias("selector"),
    )


def target_focus(spark: SparkSession, schema: SchemaDict,
                 triples: DataFrame) -> DataFrame:
    """TargetDeclarations: union of per-shape target selections."""
    pieces: list[DataFrame] = []
    for lbl, sh in schema.shapes.items():
        for t in sh.targets:
            if t.kind == "targetNode":
                pieces.append(_mk(spark.createDataFrame([(t.value,)], "node string"),
                                  lbl, "targetNode"))
            elif t.kind == "targetClass":
                sel = (triples.filter((F.col("pred") == RDF_TYPE)
                                      & (F.col("obj_kind") == "iri")
                                      & (F.col("obj_value") == t.value))
                       .select("subj").distinct())
                pieces.append(_mk(sel, lbl, "targetClass"))
            elif t.kind == "targetSubjectsOf":
                sel = triples.filter(F.col("pred") == t.value).select("subj").distinct()
                pieces.append(_mk(sel, lbl, "targetSubjectsOf"))
            elif t.kind == "targetObjectsOf":
                sel = (triples.filter(F.col("pred") == t.value)
                       .select("obj_value").distinct())
                pieces.append(_mk(sel, lbl, "targetObjectsOf"))
            else:
                raise ValueError(f"unknown target kind {t.kind}")
    if not pieces:
        return spark.createDataFrame([], FOCUS_SCHEMA)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.distinct()


def shape_map_focus(spark: SparkSession, triples: DataFrame,
                    associations: list[dict]) -> DataFrame:
    """Explicit shape map: list of {selector, shape} associations.

    selector forms (grammar: /root/reference/doc/grammars/shapeMapGrammar.bnf:19-31):
      {"node": "<iri>"}                          — single node
      {"focusSubjectsOf": "<pred>"}              — {FOCUS p _}
      {"focusObjectsOf": "<pred>"}               — {_ p FOCUS}
      {"sparql"/"sql": "SELECT ... AS node"}     — arbitrary spark.sql
    """
    pieces: list[DataFrame] = []
    for assoc in associations:
        shape = assoc["shape"]
        if "node" in assoc:
            pieces.append(_mk(spark.createDataFrame([(assoc["node"],)], "node string"),
                              shape, "node"))
        elif "focusSubjectsOf" in assoc:
            sel = (triples.filter(F.col("pred") == assoc["focusSubjectsOf"])
                   .select("subj").distinct())
            pieces.append(_mk(sel, shape, "pattern"))
        elif "focusObjectsOf" in assoc:
            sel = (triples.filter(F.col("pred") == assoc["focusObjectsOf"])
                   .select("obj_value").distinct())
            pieces.append(_mk(sel, shape, "pattern"))
        elif "sql" in assoc or "sparql" in assoc:
            sel = spark.sql(assoc.get("sql") or assoc["sparql"])
            pieces.append(_mk(sel, shape, "sparql"))
        else:
            raise ValueError(f"unknown selector in {assoc}")
    if not pieces:
        return spark.createDataFrame([], FOCUS_SCHEMA)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.distinct()
