#!/usr/bin/env python
"""spark-submit entry point for the transcript → KG pipeline
(north_rule: "run via spark-submit --py-files on multi-executor
clusters").

Cluster usage (package the library, let spark-submit own the master/
executor topology — the session builder sets NO master here):

    zip -r shaclex_spark.zip shaclex_spark
    spark-submit --py-files shaclex_spark.zip job.py \
        --input  s3://bucket/transcripts/ \
        --output s3://bucket/kg/ \
        [--resume] [--streaming] [--shapes shapes.json]

Local smoke run:

    python job.py --input /tmp/transcripts --output /tmp/kg \
        --master "local[4]"

The batch mode is pipeline.run_pipeline (extract → link → validate →
bucketed triples/conformance/report/lineage parquet with dynamic
partition overwrite; --resume re-processes only dirty buckets and —
for arc-local schemas — re-validates only affected nodes). The
streaming mode drains new files through streaming.run_streaming_
pipeline (checkpointed, idempotent batch replay) and then validates
the accumulated table.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="transcript parquet directory (input_hint schema)")
    ap.add_argument("--output", required=True, help="output table root")
    ap.add_argument("--shapes", help="shapes JSON file (default: "
                                     "pipeline.DEFAULT_SHAPES)")
    ap.add_argument("--resume", action="store_true",
                    help="idempotent restart: only dirty buckets reprocess")
    ap.add_argument("--streaming", action="store_true",
                    help="drain new files via Structured Streaming "
                         "(availableNow), then validate")
    ap.add_argument("--master", default=None,
                    help="override master (spark-submit normally sets it)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("shaclex_spark_kg")
    if args.master:
        b = b.master(args.master)
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    b = (b.config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC"))
    spark = b.getOrCreate()

    shapes = None
    if args.shapes:
        with open(args.shapes, encoding="utf-8") as fh:
            shapes = json.load(fh)

    if args.streaming:
        from shaclex_spark.pipeline import validate_kg
        from shaclex_spark.streaming import run_streaming_pipeline

        out = run_streaming_pipeline(spark, args.input, args.output)
        if out["triples"] is None:
            print(json.dumps({"status": "no_input"}))
            return 0
        res = validate_kg(spark, out["triples"], shapes)
        res.conformance.write.mode("overwrite").parquet(
            args.output.rstrip("/") + "/conformance")
        res.report.write.mode("overwrite").parquet(
            args.output.rstrip("/") + "/report")
        n_bad = res.report.count()
        print(json.dumps({"status": "ok", "mode": "streaming",
                          "n_triples": out["triples"].count(),
                          "n_violations": n_bad}))
        return 0

    from shaclex_spark.pipeline import run_pipeline

    transcripts = spark.read.parquet(args.input)
    out = run_pipeline(spark, transcripts, output_dir=args.output,
                       shapes_json=shapes, resume=args.resume)
    print(json.dumps({
        "status": "ok", "mode": "batch",
        "n_triples": out["triples"].count(),
        "n_violations": out["report"].count(),
        "n_buckets_skipped": out["n_buckets_skipped"],
        "n_affected_nodes": out["n_affected_nodes"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
