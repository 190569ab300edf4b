"""Similarity search over the embeddings table.

- brute-force cosine top-k: the exact baseline (one broadcast of the
  query set; per-row JVM array math; no shuffle until the final top-k
  aggregation)
- LSH-bucketed ANN: deterministic random-hyperplane signatures from
  xxhash-seeded pseudo-planes — the scale path (candidates ∝ bucket
  size, not corpus size)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors for each query id (excluding itself).
    Output: (query_id, neighbor_id, rank, cosine)."""
    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    corpus = emb.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("cv"))
    scored = (corpus.join(F.broadcast(queries))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cosine",
                          _dot(F.col("qv"), F.col("cv"))
                          / (_norm(F.col("qv")) * _norm(F.col("cv")))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cosine", 4).alias("cosine")))


def hyperplane_signature(vec: Column, n_planes: int = 16, dim: int = 64) -> Column:
    """Deterministic random-hyperplane LSH signature (long bitmask).
    Plane p's coefficient for dimension d is pseudo-random, derived
    from xxhash64(p, d) — reproducible across runs. Planes unrolled at
    compile time (whole-stage codegen keeps this JVM-side)."""
    def coeff(p: int, d):
        h = F.xxhash64(F.lit("plane"), F.lit(p), d)
        return (F.pmod(h, F.lit(1000)).cast("double") - 499.5)

    def _mul(p: int):
        # closure factory: PySpark reflects the lambda arity, so the
        # plane index can't ride along as a defaulted parameter
        return lambda x, d: x.cast("double") * coeff(p, d)

    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), _mul(p)),
            F.lit(0.0), lambda a2, x: a2 + x)
        sig = sig.bitwiseOR(
            F.when(dot > 0, F.lit(1 << p).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    return sig


def ann_lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                 n_planes: int = 12, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share the hyperplane bucket, then
    exact cosine within candidates. Output like cosine_topk (+bucket)."""
    dim = 64
    sig = emb.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"),
                     hyperplane_signature(F.col(vec_col), n_planes, dim)
                     .alias("bucket"))
    queries = sig.filter(F.col("i").isin(query_ids)).select(
        F.col("i").alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket"))
    scored = (sig.join(F.broadcast(queries), on="bucket")
              .filter(F.col("i") != F.col("query_id"))
              .withColumn("cosine", _dot(F.col("qv"), F.col("v"))
                          / (_norm(F.col("qv")) * _norm(F.col("v")))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("i"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("i").alias("neighbor_id"), "rank",
                    F.round("cosine", 4).alias("cosine")))
