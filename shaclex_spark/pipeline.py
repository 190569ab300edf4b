"""End-to-end KG construction pipeline (north_rule):

    transcripts → extraction (pandas UDF) → entity linking +
    canonicalization → triples table → shape validation → report,

with per-partition lineage metrics for idempotent checkpoint resume.

Spark-native lifecycle mapping of the reference CLI flow
(SURVEY.md §3.1 'Spark-native equivalent').
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .extraction import extract_triples
from .linking import canonicalize_triples
from .shapes import SchemaDict
from .triggers import shape_map_focus, target_focus
from .validation import ValidationEngine, ValidationResult

# Default shapes for transcript KGs: persons/courses from the extraction
# vocabulary. Mirrors examples/clingo/paper.{shex,ttl,sm} semantics
# (User shape with age integer {1,1}, knows refs, enrolledIn refs).
EX = "http://example.org/"
FOAF_KNOWS = "http://xmlns.com/foaf/0.1/knows"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

DEFAULT_SHAPES = [
    {
        "label": "PersonShape",
        "targets": [{"kind": "targetSubjectsOf", "value": FOAF_KNOWS}],
        "constraints": [
            # ages accumulate across turns (one mention per turn), so no
            # maxCount — just the ShEx-style "every age is an integer"
            {"path": EX + "age", "exclusive": True,
             "node": {"kind": "datatype", "iri": XSD_INTEGER}},
            {"path": FOAF_KNOWS,
             "node": {"kind": "nodeKind", "value": "IRI"}},
            {"path": EX + "enrolledIn",
             "node": {"kind": "pattern", "pattern": "^http://example.org/course/"}},
        ],
    },
    {
        "label": "CourseShape",
        "targets": [{"kind": "targetObjectsOf", "value": EX + "enrolledIn"}],
        "constraints": [
            {"path": EX + "hasSubject", "maxCount": 3,
             "node": {"kind": "datatype", "iri": XSD_STRING}},
        ],
    },
]


def build_kg(spark: SparkSession, transcripts: DataFrame,
             link: bool = True) -> tuple[DataFrame, DataFrame]:
    """transcripts → (canonical triples with provenance, mention mapping).

    Stage boundaries persist: extraction output is read by mention
    collection (×2) and the rewrite joins, canonical triples by focus
    selection + every constraint join — without persistence the
    pandas-UDF extraction re-executes once per consumer. (At cluster
    scale the same boundary is an Iceberg table write.)"""
    candidates = extract_triples(transcripts).persist()
    if not link:
        return candidates, None
    canonical, mapping = canonicalize_triples(candidates)
    return canonical.persist(), mapping


def validate_kg(spark: SparkSession, triples: DataFrame,
                shapes_json: list[dict] | None = None,
                shape_map: list[dict] | None = None) -> ValidationResult:
    schema = SchemaDict.from_json(shapes_json or DEFAULT_SHAPES)
    plain = triples.select("subj", "pred", "obj_kind", "obj_value",
                           "obj_dt", "obj_lang")
    engine = ValidationEngine(spark, schema, plain)
    if shape_map:
        focus = shape_map_focus(spark, plain, shape_map)
    else:
        focus = target_focus(spark, schema, plain)
    return engine.validate(focus)


N_BUCKETS = 64


def bucket_col(conv_col: str = "conv_id"):
    return F.pmod(F.xxhash64(conv_col), F.lit(N_BUCKETS)).cast("int")


def input_lineage(transcripts: DataFrame) -> DataFrame:
    """Per-bucket lineage of the INPUT: turn count + order-independent
    content fingerprint. This is the resume manifest key: a bucket
    whose input fingerprint is unchanged needs no reprocessing."""
    return (transcripts
            .groupBy(bucket_col().alias("bucket"))
            .agg(F.count("*").alias("n_turns"),
                 # bit_xor: order-independent, overflow-free fingerprint
                 F.expr("bit_xor(xxhash64(conv_id, turn_idx, text))")
                 .alias("input_fingerprint")))


def dirty_buckets(spark: SparkSession, transcripts: DataFrame,
                  output_dir: str) -> DataFrame | None:
    """Buckets whose input changed since the last run (or None = all
    dirty: no previous lineage manifest). Idempotent-restart core
    (north_rule: 'resumable from checkpoint with per-partition
    lineage + metrics')."""
    lineage_path = os.path.join(output_dir, "input_lineage")
    try:
        prev = spark.read.parquet(lineage_path)
    except Exception:
        return None
    cur = input_lineage(transcripts)
    return (cur.join(prev.withColumnRenamed("input_fingerprint", "prev_fp")
                     .withColumnRenamed("n_turns", "prev_n")
                     .select("bucket", "prev_fp", "prev_n"),
                     on="bucket", how="left")
            .filter(F.col("prev_fp").isNull()
                    | (F.col("prev_fp") != F.col("input_fingerprint"))
                    | (F.col("prev_n") != F.col("n_turns")))
            .select("bucket"))


def lineage_metrics(triples: DataFrame) -> DataFrame:
    """Per-partition lineage + triple-count metrics (north_rule):
    one row per conv_id partition bucket with triple count and a
    content fingerprint — the resume manifest. Bucketing key matches
    the write partitioning (salted hash(conv_id))."""
    bucket = F.pmod(F.xxhash64("conv_id"), F.lit(64)).alias("bucket")
    return (triples
            .groupBy(bucket)
            .agg(F.count("*").alias("n_triples"),
                 F.countDistinct("conv_id").alias("n_convs"),
                 # order-independent content fingerprint per bucket
                 F.expr("bit_xor(xxhash64(subj, pred, obj_value))")
                 .alias("fingerprint")))


def run_pipeline(spark: SparkSession, transcripts: DataFrame,
                 output_dir: str | None = None,
                 shapes_json: list[dict] | None = None,
                 resume: bool = False) -> dict:
    """Full job. If output_dir is set, materializes triples + report +
    lineage as parquet partitioned by bucket(conv_id-hash) — the
    Iceberg-table stand-in available in this environment (same layout:
    partition column + snapshot-style dynamic-partition overwrite).

    resume=True: only buckets whose input lineage changed are
    re-extracted and overwritten (dynamic partition overwrite); clean
    buckets keep their existing output — idempotent restart."""
    n_skipped = 0
    if resume and output_dir:
        dirty = dirty_buckets(spark, transcripts, output_dir)
        if dirty is not None:
            dirty_list = [r.bucket for r in dirty.collect()]
            n_skipped = N_BUCKETS - len(dirty_list)
            transcripts = transcripts.filter(
                bucket_col().isin(dirty_list) if dirty_list else F.lit(False))
    triples, mapping = build_kg(spark, transcripts)
    triples = triples.withColumn("bucket", bucket_col())
    if output_dir:
        # triples land FIRST (dynamic partition overwrite touches only
        # dirty buckets); validation + lineage then run over the FULL
        # on-disk table, so on resume the conformance/report/lineage of
        # CLEAN buckets is regenerated from their untouched triples
        # instead of being clobbered by dirty-only output. Validation
        # is whole-graph by nature (cross-bucket shape refs), so this
        # is also the semantically correct scope.
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        triples.write.mode("overwrite").partitionBy("bucket") \
            .parquet(os.path.join(output_dir, "triples"))
        all_triples = spark.read.parquet(os.path.join(output_dir, "triples"))
        result = validate_kg(spark, all_triples, shapes_json)
        lineage = lineage_metrics(all_triples)
    else:
        all_triples = triples
        result = validate_kg(spark, triples, shapes_json)
        lineage = lineage_metrics(triples)
    out = {
        "triples": all_triples,
        "mapping": mapping,
        "conformance": result.conformance,
        "report": result.report,
        "lineage": lineage,
        "n_buckets_skipped": n_skipped,
    }
    if output_dir:
        result.conformance.write.mode("overwrite") \
            .parquet(os.path.join(output_dir, "conformance"))
        result.report.write.mode("overwrite") \
            .parquet(os.path.join(output_dir, "report"))
        out["lineage"].write.mode("overwrite") \
            .parquet(os.path.join(output_dir, "lineage"))
        # input lineage manifest LAST: written only after the data
        # lands, so a crashed run re-processes its buckets
        input_lineage_all = input_lineage(transcripts)
        if resume:
            try:
                prev = spark.read.parquet(
                    os.path.join(output_dir, "input_lineage"))
                keep = prev.join(input_lineage_all.select("bucket"),
                                 on="bucket", how="left_anti")
                input_lineage_all = input_lineage_all.unionByName(keep)
            except Exception:
                pass
        input_lineage_all = input_lineage_all.localCheckpoint(eager=True)
        input_lineage_all.write.mode("overwrite") \
            .parquet(os.path.join(output_dir, "input_lineage"))
    return out
