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
    kind = F.when(F.col(df.columns[0]).startswith("_:"), F.lit("bnode")) \
        .otherwise(F.lit("iri"))
    return df.select(
        F.col(df.columns[0]).alias("node"),
        F.lit(shape).alias("shape"),
        F.lit(selector).alias("selector"),
        kind.alias("node_kind"),
        F.lit(None).cast("string").alias("node_dt"),
        F.lit(None).cast("string").alias("node_lang"),
    )


def target_focus(spark: SparkSession, schema: SchemaDict,
                 triples: DataFrame) -> DataFrame:
    """TargetDeclarations: union of per-shape target selections."""
    pieces: list[DataFrame] = []
    membership = None  # lazy: only built when a targetClass exists
    for lbl, sh in schema.shapes.items():
        for t in sh.targets:
            if t.kind == "targetNode":
                # target may be any RDF term (literal targets in the
                # W3C corpus): carry the full term identity
                term_kind = ("bnode" if t.value.startswith("_:")
                             else t.term_kind)
                row = spark.createDataFrame(
                    [(t.value, lbl, "targetNode", term_kind, t.dt, t.lang)],
                    "node string, shape string, selector string, "
                    "node_kind string, node_dt string, node_lang string")
                pieces.append(row)
            elif t.kind == "targetClass":
                # includes instances of rdfs:subClassOf* subclasses;
                # membership_for reuses session-shared derived state /
                # the pre-answered subclass probe instead of running
                # class_membership's eager full-scan isEmpty here
                if membership is None:
                    from .validation import membership_for
                    membership = membership_for(triples)
                # no per-branch distinct: the single final distinct()
                # below dedupes the whole union in ONE exchange (its
                # partial aggregate dedupes map-side), where per-branch
                # distincts cost one exchange each (serial stage
                # latency on the conformance job's critical path)
                sel = membership.filter(F.col("cls") == t.value).select("inst")
                pieces.append(_mk(sel, lbl, "targetClass"))
            elif t.kind == "targetSubjectsOf":
                sel = triples.filter(F.col("pred") == t.value).select("subj")
                pieces.append(_mk(sel, lbl, "targetSubjectsOf"))
            elif t.kind == "targetObjectsOf":
                # objects may be literal terms: carry full term identity
                sel = (triples.filter(F.col("pred") == t.value)
                       .select(F.col("obj_value").alias("node"),
                               F.lit(lbl).alias("shape"),
                               F.lit("targetObjectsOf").alias("selector"),
                               F.col("obj_kind").alias("node_kind"),
                               F.col("obj_dt").alias("node_dt"),
                               F.col("obj_lang").alias("node_lang")))
                pieces.append(sel)
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
                   .select("subj"))  # final distinct() dedupes the union
            pieces.append(_mk(sel, shape, "pattern"))
        elif "focusObjectsOf" in assoc:
            sel = (triples.filter(F.col("pred") == assoc["focusObjectsOf"])
                   .select("obj_value"))
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
