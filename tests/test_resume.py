"""Checkpoint-resume: per-partition lineage manifest → only dirty
buckets reprocess (north_rule idempotent restart)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from shaclex_spark.pipeline import run_pipeline
from shaclex_spark.transcripts import synth_transcripts


def test_resume_skips_clean_buckets(spark):
    transcripts, _ = synth_transcripts(spark, 40, seed=42)
    with tempfile.TemporaryDirectory() as out_dir:
        first = run_pipeline(spark, transcripts, output_dir=out_dir)
        n_triples_first = spark.read.parquet(f"{out_dir}/triples").count()
        assert n_triples_first > 0
        assert first["n_buckets_skipped"] == 0

        # identical input → all buckets clean, nothing reprocessed
        second = run_pipeline(spark, transcripts, output_dir=out_dir,
                              resume=True)
        assert second["n_buckets_skipped"] == 64
        assert spark.read.parquet(f"{out_dir}/triples").count() == n_triples_first

        # perturb one conversation → only its bucket reprocesses
        perturbed = transcripts.withColumn(
            "text",
            F.when(F.col("conv_id") == "conv00000003",
                   F.concat(F.col("text"), F.lit(" edited")))
            .otherwise(F.col("text")))
        pre_conf = {(r.node, r.shape): r.conforms for r in
                    spark.read.parquet(f"{out_dir}/conformance").collect()}
        third = run_pipeline(spark, perturbed, output_dir=out_dir,
                             resume=True)
        assert third["n_buckets_skipped"] < 64
        assert third["n_buckets_skipped"] >= 60
        # triples table still covers ALL buckets (clean ones kept)
        assert spark.read.parquet(f"{out_dir}/triples").count() > 0
        buckets = {r.bucket for r in
                   spark.read.parquet(f"{out_dir}/triples")
                   .select("bucket").distinct().collect()}
        first_buckets = {r.bucket for r in
                         first["lineage"].select("bucket").collect()}
        assert buckets == first_buckets
        # incremental re-validation (arc-local DEFAULT_SHAPES): only
        # nodes incident to the dirty buckets' old/new triples were
        # re-validated — far fewer than the whole focus set
        n_focus_total = len(pre_conf)
        assert third["n_affected_nodes"] is not None
        assert third["n_affected_nodes"] < n_focus_total
        # clean-bucket conformance rows carried over UNCHANGED
        post_conf = {(r.node, r.shape): r.conforms for r in
                     spark.read.parquet(f"{out_dir}/conformance").collect()}
        assert set(post_conf) == set(pre_conf)  # same focus universe
        same = sum(1 for k in pre_conf if post_conf[k] == pre_conf[k])
        assert same >= len(pre_conf) - third["n_affected_nodes"]


def test_incremental_matches_full_revalidation(spark):
    """The incremental path's conformance must be IDENTICAL to a full
    whole-graph re-validation of the same final state (soundness of
    the arc-local gate)."""
    import tempfile

    from pyspark.sql import functions as F

    from shaclex_spark.pipeline import run_pipeline, validate_kg
    from shaclex_spark.transcripts import synth_transcripts

    transcripts, _ = synth_transcripts(spark, 40, seed=7)
    perturbed = transcripts.withColumn(
        "text",
        F.when(F.col("conv_id") == "conv00000001",
               F.lit("Alice Moore is 200 years old."))
        .otherwise(F.col("text")))
    with tempfile.TemporaryDirectory() as out_dir:
        run_pipeline(spark, transcripts, output_dir=out_dir)
        run_pipeline(spark, perturbed, output_dir=out_dir, resume=True)
        incr = {(r.node, r.shape): r.conforms for r in
                spark.read.parquet(f"{out_dir}/conformance").collect()}
        full = validate_kg(spark,
                           spark.read.parquet(f"{out_dir}/triples"))
        ref = {(r.node, r.shape): r.conforms
               for r in full.conformance.collect()}
        assert incr == ref


def test_arc_local_gate_rejects_ref_schemas():
    from shaclex_spark.pipeline import DEFAULT_SHAPES, _arc_local_schema

    assert _arc_local_schema(DEFAULT_SHAPES) is True
    assert _arc_local_schema(None) is True
    with_ref = [
        {"label": "A", "constraints": [
            {"path": "http://x/p", "node": {"kind": "ref", "label": "B"}}]},
        {"label": "B", "constraints": [{"path": "http://x/q", "minCount": 1}]},
    ]
    assert _arc_local_schema(with_ref) is False
    with_class = [{"label": "A", "constraints": [
        {"path": "http://x/p", "node": {"kind": "class", "iri": "http://x/C"}}]}]
    assert _arc_local_schema(with_class) is False
    with_seq = [{"label": "A", "constraints": [
        {"path": {"kind": "sequence", "steps": ["http://x/p", "http://x/q"]},
         "minCount": 1}]}]
    assert _arc_local_schema(with_seq) is False


def test_arc_local_gate_sees_oneof_classes():
    """Review finding: Shape.classes() skipped one_of members, so a
    class constraint hidden in a OneOf group slipped past the
    arc-local gate (class membership rides the global subClassOf*
    closure — not arc-local)."""
    from shaclex_spark.pipeline import _arc_local_schema

    with_oneof_class = [{
        "label": "A",
        "targets": [{"kind": "targetSubjectsOf", "value": "http://x/p"}],
        "oneOf": [[{"path": "http://x/p",
                    "node": {"kind": "class", "iri": "http://x/C"}}]],
    }]
    assert _arc_local_schema(with_oneof_class) is False
