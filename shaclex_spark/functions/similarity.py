"""Similarity search over the embeddings table.

- brute-force cosine top-k: the exact baseline (one broadcast of the
  query set; per-row JVM array math; no shuffle until the final top-k
  aggregation)
- LSH-bucketed ANN: deterministic random-hyperplane signatures from
  xxhash-seeded pseudo-planes — the scale path (candidates ∝ bucket
  size, not corpus size)
- IVF ANN: spherical k-means coarse quantizer (deterministic init,
  Lloyd refinement) + n_probe nearest-list candidate join — the other
  standard scale path (candidates ∝ probed-list sizes)
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
    # PERF (r6): norms bound BEFORE the query×corpus join — the inline
    # form re-ran the interpreted 64-element norm fold twice per
    # (query, corpus) pair; binding computes each norm once per row
    # (same double ops, bit-identical cosine).
    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("__qn"))
    corpus = emb.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("cv"),
                        _norm(F.col(vec_col)).alias("__cn"))
    scored = (corpus.join(F.broadcast(queries))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .withColumn("cosine",
                          _dot(F.col("qv"), F.col("cv"))
                          / (F.col("__qn") * F.col("__cn"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("cosine", 4).alias("cosine")))


def hyperplane_signature(vec: Column, n_planes: int = 16, dim: int = 64,
                         seed: int = 0) -> Column:
    """Deterministic random-hyperplane LSH signature (long bitmask).
    Plane p's coefficient for dimension d is pseudo-random, derived
    from xxhash64(seed, p, d) — reproducible across runs; distinct
    seeds give independent hash TABLES. Planes unrolled at compile
    time (whole-stage codegen keeps this JVM-side)."""
    def coeff(p: int, d):
        h = F.xxhash64(F.lit("plane"), F.lit(seed), F.lit(p), d)
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
                 vec_col: str = "embedding",
                 n_tables: int = 4, probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: candidates share a hyperplane bucket in ANY
    of ``n_tables`` independent hash tables, with queries additionally
    probing every bucket within Hamming distance ``probe_hamming`` of
    their own (multi-probe LSH — recovers neighbors that fall just
    across one hyperplane without paying for more tables). Exact
    cosine re-ranking within candidates. Output like cosine_topk.

    Scale shape: the corpus side stays one row per (table, vector) —
    n_tables × |corpus|; only the (tiny) QUERY side fans out by
    (1 + n_planes choose ≤probe_hamming) probes and is broadcast, so
    the join cost is ∝ bucket sizes, never corpus².
    """
    dim = 64
    sig_cols = [
        F.struct(F.lit(t).alias("t"),
                 hyperplane_signature(F.col(vec_col), n_planes, dim, seed=t)
                 .alias("bucket"))
        for t in range(n_tables)
    ]
    corpus = (emb.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"),
                         F.explode(F.array(*sig_cols)).alias("tb"))
              .select("i", "v", F.col("tb.t").alias("t"),
                      F.col("tb.bucket").alias("bucket")))

    qbase = (emb.filter(F.col(id_col).isin(query_ids))
             .select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).alias("qv"),
                     F.explode(F.array(*[
                         F.struct(F.lit(t).alias("t"),
                                  hyperplane_signature(
                                      F.col(vec_col), n_planes, dim, seed=t)
                                  .alias("bucket"))
                         for t in range(n_tables)])).alias("tb"))
             .select("query_id", "qv", F.col("tb.t").alias("t"),
                     F.col("tb.bucket").alias("bucket")))
    # multi-probe: flip each subset of ≤probe_hamming sign bits
    probe_masks = [0]
    if probe_hamming >= 1:
        probe_masks += [1 << p for p in range(n_planes)]
    if probe_hamming >= 2:
        probe_masks += [(1 << p) | (1 << q)
                        for p in range(n_planes) for q in range(p + 1, n_planes)]
    queries = (qbase.withColumn(
        "bucket", F.explode(F.array(*[
            F.col("bucket").bitwiseXOR(F.lit(m).cast("long"))
            for m in probe_masks])))
    )
    cands = (corpus.join(F.broadcast(queries), on=["t", "bucket"])
             .filter(F.col("i") != F.col("query_id"))
             .select("query_id", "qv", "i", "v")
             .dropDuplicates(["query_id", "i"]))
    scored = cands.withColumn(
        "cosine", _dot(F.col("qv"), F.col("v"))
        / (_norm(F.col("qv")) * _norm(F.col("v"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("i"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("i").alias("neighbor_id"), "rank",
                    F.round("cosine", 4).alias("cosine")))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse spherical-k-means quantizer + probe join
# ---------------------------------------------------------------------------


def _ivf_assign_udf(centroids):
    """Arrow-batched assignment of vectors to their nearest (max-dot,
    i.e. cosine after normalization) centroid. numpy matmul over the
    whole batch — the vectorized slow-path boundary this module is
    allowed exactly here (dense (batch×dim) @ (dim×lists) has no
    built-in-function rendering that isn't an interpreted HOF per
    centroid per row)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype="float64")
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    def assign(v):
        M = np.stack(v.to_numpy()).astype("float64")
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series((M @ Cn.T).argmax(axis=1))

    # real (non-string) hints: the module's `from __future__ import
    # annotations` would otherwise stringify them past pandas_udf's
    # eval-type inference
    assign.__annotations__ = {"v": pd.Series, "return": pd.Series}
    return pandas_udf("int")(assign)


def train_ivf_centroids(emb: DataFrame, n_lists: int = 16,
                        n_iters: int = 3, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        seed: int = 42) -> list[list[float]]:
    """Deterministic spherical k-means. Init: the n_lists vectors with
    the smallest xxhash64(id, seed) — a reproducible uniform sample
    (no Math.random, stable across partitionings). Each Lloyd round:
    one Arrow-batched assignment pass + ONE shuffle (posexplode →
    groupBy(cluster, pos) avg with map-side partial aggregation — the
    centroid update never collects vectors, only the dim×n_lists
    means). Model state (n_lists × dim doubles) lives on the driver,
    like any fitted estimator."""
    init = (emb.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
            .limit(n_lists).collect())
    centroids = [list(r[1]) for r in init]
    for _ in range(n_iters):
        assigned = emb.select(
            _ivf_assign_udf(centroids)(F.col(vec_col)).alias("cluster"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"))
        means = (assigned.groupBy("cluster", "pos")
                 .agg(F.avg("val").alias("m"))
                 .groupBy("cluster")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                      .alias("pm"))
                 .select("cluster", F.col("pm.m").alias("centroid"))
                 .collect())
        new = list(centroids)  # empty lists keep their old centroid
        for r in means:
            new[r["cluster"]] = list(r["centroid"])
        centroids = new
    return centroids


def ann_ivf_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                 n_lists: int = 16, n_probe: int = 4,
                 n_iters: int = 3, id_col: str = "vec_id",
                 vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed by nearest
    coarse centroid (inverted lists); each query probes its n_probe
    nearest lists and re-ranks candidates by exact cosine. Output like
    cosine_topk: (query_id, neighbor_id, rank, cosine).

    Scale shape: train on a bounded sample if the corpus is huge (the
    quantizer only needs a representative sample), assignment is one
    Arrow-batched map pass, and the candidate join is (query ×
    probed-list) — cost ∝ sum of probed list sizes, never corpus².
    The (query_id, cluster) probe relation has |queries| × n_probe
    rows and is broadcast."""
    import numpy as np

    centroids = train_ivf_centroids(emb, n_lists, n_iters,
                                    id_col, vec_col, seed)
    corpus = emb.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v")) \
        .withColumn("cluster", _ivf_assign_udf(centroids)(F.col("v")))

    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    qrows = queries.collect()  # |query_ids| rows — a parameter, not data
    C = np.asarray(centroids, dtype="float64")
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    probe_pairs = []
    for r in qrows:
        q = np.asarray(r["qv"], dtype="float64")
        q /= max(np.linalg.norm(q), 1e-12)
        for c in np.argsort(-(Cn @ q))[:n_probe]:
            probe_pairs.append((r["query_id"], int(c)))
    probes = emb.sparkSession.createDataFrame(
        probe_pairs, "query_id long, cluster int")

    cands = (corpus.join(F.broadcast(probes), on="cluster")
             .filter(F.col("i") != F.col("query_id"))
             .join(F.broadcast(queries), on="query_id"))
    scored = cands.withColumn(
        "cosine", _dot(F.col("qv"), F.col("v"))
        / (_norm(F.col("qv")) * _norm(F.col("v"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("i"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("i").alias("neighbor_id"), "rank",
                    F.round("cosine", 4).alias("cosine")))
