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
