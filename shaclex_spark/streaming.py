"""Structured-Streaming ingestion for the transcript → KG pipeline.

The production shape at 10^12-turn scale is INCREMENTAL: new
transcript files land continuously; each micro-batch runs the same
extract stage as the batch pipeline and appends to the bucketed
triples table. Spark-first mapping:

- `readStream` over the transcript directory (file source: the
  checkpoint's file log gives at-least-once batch delivery and skips
  already-processed files on restart);
- `foreachBatch` runs the EXISTING batch operators (extraction.py,
  linking.py) on each micro-batch — no operator is reimplemented;
- exactly-once lands via IDEMPOTENT batch replay: triples are written
  with dynamic partition overwrite keyed by (batch_id, bucket), so a
  crashed batch that replays simply overwrites its own partitions
  (the standard idempotent-foreachBatch pattern);
- `trigger(availableNow=True)` drains everything available then
  stops — the "incremental batch" mode a scheduled 100-TB ingest job
  runs in (continuous triggers work unchanged);
- per-batch lineage rows (batch_id, n_turns, n_triples, fingerprint)
  land partitioned by batch_id — the streaming analogue of
  pipeline.lineage_metrics (north_rule: per-partition lineage +
  metrics for idempotent checkpoint resume);
- a watermarked tumbling-window aggregation (turn_rate) demonstrates
  late-data handling for monitoring streams.

Entity linking is LATE-BOUND (round-3 ADVICE fix): per-batch
canonicalization was batch-scoped — the same entity mentioned in two
micro-batches got two canonical IRIs, silently diverging from a batch
run. Instead each batch lands triples in MENTION form plus its mention
strings as a per-batch dimension delta; `read_canonical_triples`
re-links the ACCUMULATED mention dimension (a set ≪ triples) and
applies the global mapping at read time. Canonical output at any read
instant therefore equals the batch pipeline over all landed input —
including clusters merged by a bridge mention that arrived batches
later (a fact no canonicalize-at-write scheme can retrofit without
rewriting history). Linking cost per drain is O(mentions), not
O(triples); at 10^12-turn scale the mapping join is the same
AQE-broadcast rewrite the batch path uses.

Reference mapping: the reference CLI is strictly batch
(Main.scala:256-261 parses one file); this module is the
Spark-native extension of SURVEY.md §3.1's lifecycle to continuous
ingestion. Validation runs whole-graph over the canonical view, or
incrementally via pipeline.validate_streaming_incremental (only nodes
touched by new batches / re-linked mentions re-validate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .extraction import extract_triples
from .linking import apply_mapping, extract_mentions, link_mentions
from .pipeline import bucket_col

TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def stream_transcripts(spark: SparkSession, input_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming DataFrame over a transcript parquet directory
    (input_hint schema). ``max_files_per_trigger`` bounds micro-batch
    size (backpressure knob at scale)."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def _process_batch(spark: SparkSession, output_dir: str):
    """foreachBatch body: extract one micro-batch, land mention-form
    triples + the batch's mention delta idempotently, append lineage."""
    raw_path = os.path.join(output_dir, "triples_raw")
    men_path = os.path.join(output_dir, "mentions")
    lin_path = os.path.join(output_dir, "stream_lineage")

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        candidates = extract_triples(batch).persist()
        out = (candidates
               .withColumn("bucket", bucket_col())
               .withColumn("batch_id", F.lit(batch_id)))
        # idempotent replay: dynamic overwrite scoped to THIS batch's
        # partitions — a replayed batch rewrites only itself
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        out.write.mode("overwrite").partitionBy("batch_id", "bucket") \
            .parquet(raw_path)
        # mention dimension delta, same idempotent layout (read side
        # distincts across batches; at scale a left_anti against the
        # accumulated dimension would shrink re-landed duplicates, but
        # the dimension is ≪ triples either way)
        mentions = (extract_mentions(candidates)
                    .withColumn("batch_id", F.lit(batch_id)))
        mentions.write.mode("overwrite").partitionBy("batch_id") \
            .parquet(men_path)
        # lineage over the landed (mention-form) rows; must replay
        # idempotently too: partition by batch_id with dynamic
        # overwrite, so a crash-replayed batch rewrites its own
        # lineage row instead of appending a duplicate
        lineage = (out.groupBy("batch_id")
                   .agg(F.countDistinct("conv_id").alias("n_convs"),
                        F.count("*").alias("n_triples"),
                        F.expr("bit_xor(xxhash64(subj, pred, obj_value))")
                        .alias("fingerprint")))
        lineage.write.mode("overwrite").partitionBy("batch_id") \
            .parquet(lin_path)
        candidates.unpersist()

    return process


def read_canonical_triples(spark: SparkSession, output_dir: str
                           ) -> tuple[DataFrame | None, DataFrame | None]:
    """Canonical view over everything landed so far: re-link the
    accumulated mention dimension globally, rewrite the raw triples.
    Returns (canonical_triples, mapping) — equal to the batch pipeline
    over the union of all drained input."""
    raw_path = os.path.join(output_dir, "triples_raw")
    men_path = os.path.join(output_dir, "mentions")
    try:
        raw = spark.read.parquet(raw_path)
        mentions = spark.read.parquet(men_path)
    except Exception:
        return None, None  # zero input files: nothing landed
    mapping, small_pairs = link_mentions(
        mentions.select("mention").distinct())
    return apply_mapping(raw, mapping, small_pairs), mapping


def run_streaming_pipeline(spark: SparkSession, input_dir: str,
                           output_dir: str,
                           max_files_per_trigger: int | None = None,
                           timeout_sec: float = 300.0) -> dict:
    """Drain all available transcript files through extraction, land
    bucketed mention-form triples + mention deltas + per-batch lineage,
    and return the globally-linked canonical view. Restart-safe: the
    checkpoint under ``output_dir`` skips already-processed files and
    replayed batches overwrite their own partitions. Returns
    {"triples": canonical DataFrame, "raw": DataFrame,
    "mapping": DataFrame, "lineage": DataFrame}."""
    transcripts = stream_transcripts(spark, input_dir,
                                     max_files_per_trigger)
    query = (transcripts.writeStream
             .foreachBatch(_process_batch(spark, output_dir))
             .option("checkpointLocation",
                     os.path.join(output_dir, "_checkpoint"))
             .trigger(availableNow=True)
             .start())
    finished = query.awaitTermination(timeout_sec)
    if not finished:
        # never return partially-written tables as success: stop the
        # stream (the checkpoint + idempotent partition overwrite make
        # the next drain resume cleanly) and fail loudly
        query.stop()
        raise TimeoutError(
            f"streaming drain exceeded {timeout_sec}s; stopped — "
            "re-run to resume from the checkpoint")
    out: dict = {"triples": None, "raw": None, "mapping": None,
                 "lineage": None}
    canonical, mapping = read_canonical_triples(spark, output_dir)
    if canonical is not None:
        out["triples"] = canonical
        out["mapping"] = mapping
        out["raw"] = spark.read.parquet(
            os.path.join(output_dir, "triples_raw"))
        out["lineage"] = spark.read.parquet(
            os.path.join(output_dir, "stream_lineage"))
    return out


def turn_rate(transcripts: DataFrame, window: str = "1 hour",
              watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window turn counts per role — the
    monitoring aggregation of the ingest stream. Late turns beyond the
    watermark are dropped (state is bounded: the watermark bounds how
    many windows stay open, which is what makes this runnable over an
    unbounded 10^12-turn stream)."""
    return (transcripts
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).getField("start")
                     .alias("window_start"),
                     "role")
            .agg(F.count("*").alias("n_turns"),
                 F.approx_count_distinct("conv_id").alias("n_convs")))
