"""Deduplication suite over the documents table.

- exact:          hash-groupBy on full text (md5), canonical = min doc_id
- ngram Jaccard:  word-shingle set similarity with LSH-banded minhash
                  blocking + exact Jaccard verification
- MinHash+LSH:    signature/band/bucket-join (shared with linking.py’s
                  machinery, here over word shingles)
- SimHash:        64-bit hyperplane-free sketch from token hashes
- embedding:      cosine near-dup over the embeddings table

Scale notes: every op is shuffle-bounded by (a) a groupBy on a content
hash (exact), or (b) the band-bucket groupBy (minhash), never by an
all-pairs join. Exact Jaccard verification touches only LSH candidate
pairs. At 100 TB the band/bucket cardinality is the tuning knob
(bands × rows trade recall vs candidate volume).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens

N_HASHES = 24


def word_shingles(col: Column, k: int = 1) -> Column:
    """Distinct lowercase word k-shingles (k=1 → vocabulary set)."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    if k == 1:
        return F.array_distinct(toks)
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " ")))


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, content_hash, canonical_id, group_size): canonical is
    the min doc_id among exact-duplicate texts. One shuffle on the
    content hash; skew-free (hash keys are uniform)."""
    hashed = docs.select("doc_id", F.md5(F.col(text_col)).alias("content_hash"))
    groups = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("group_size"))
    return (hashed.join(groups, on="content_hash")
            .select("doc_id", "content_hash", "canonical_id", "group_size"))


def minhash_sig(shingles: Column, n_hashes: int = N_HASHES) -> Column:
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, i))),
    )


def lsh_candidates(docs: DataFrame, id_col: str, text_col: str,
                   n_bands: int, rows_per_band: int,
                   shingle_k: int = 1) -> DataFrame:
    """(a, b) candidate pairs sharing ≥1 minhash band bucket."""
    sig = docs.select(
        F.col(id_col).alias("i"),
        minhash_sig(word_shingles(F.col(text_col), shingle_k),
                    n_bands * rows_per_band).alias("sig"),
    )
    bands = sig.select(
        "i",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.xxhash64(
                F.concat_ws(",", F.slice(F.col("sig"), b * rows_per_band + 1,
                                         rows_per_band)), b),
        )).alias("band", "bucket"),
    )
    left = bands.select("band", "bucket", F.col("i").alias("a"))
    right = bands.select("band", "bucket", F.col("i").alias("b"))
    return (left.join(right, on=["band", "bucket"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b").distinct())


def ngram_jaccard_pairs(docs: DataFrame, threshold: float,
                        id_col: str = "doc_id", text_col: str = "text",
                        shingle_k: int = 1,
                        n_bands: int = 24, rows_per_band: int = 1) -> DataFrame:
    """Near-duplicate pairs by word-shingle Jaccard ≥ threshold.

    rows_per_band=1 gives candidate recall 1-(1-J)^bands (≈1 at J≥0.5,
    24 bands) so results match a brute-force oracle; at larger scale
    use rows_per_band≥2 to bound candidate volume."""
    cands = lsh_candidates(docs, id_col, text_col, n_bands, rows_per_band,
                           shingle_k)
    sh = docs.select(F.col(id_col).alias("i"),
                     word_shingles(F.col(text_col), shingle_k).alias("sh"))
    a = sh.select(F.col("i").alias("a"), F.col("sh").alias("sha"))
    b = sh.select(F.col("i").alias("b"), F.col("sh").alias("shb"))
    joined = cands.join(a, on="a").join(b, on="b")
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    union = F.size(F.array_union(F.col("sha"), F.col("shb")))
    return (joined
            .withColumn("jaccard", inter.cast("double") / union)
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def simhash64(col: Column) -> Column:
    """64-bit SimHash over lowercase tokens: bit j of the sketch is the
    sign of sum over tokens of ±1 according to bit j of xxhash64(token).
    All JVM-side array algebra."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bitsum = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda j: F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.shiftleft(F.lit(1), j).cast("long")) != 0,
                                        F.lit(1)).otherwise(F.lit(-1))),
    )
    return F.aggregate(
        F.zip_with(bitsum, F.sequence(F.lit(0), F.lit(63)),
                   lambda s, j: F.when(s > 0, F.shiftleft(F.lit(1), j).cast("long"))
                                 .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def simhash_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", simhash64(F.col(text_col)).alias("simhash"))


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                            block_col: str = "label") -> DataFrame:
    """Cosine near-dup pairs, blocked by a coarse key (here the label
    column; at scale an LSH/IVF bucket) so the pair join is per-block
    instead of all-pairs."""
    norm = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x))
    e = emb.select(F.col("vec_id").alias("i"), F.col(block_col).alias("blk"),
                   F.col("embedding").alias("v"), norm.alias("n"))
    a = e.select(F.col("i").alias("a"), "blk", F.col("v").alias("va"),
                 F.col("n").alias("na"))
    b = e.select(F.col("i").alias("b"), "blk", F.col("v").alias("vb"),
                 F.col("n").alias("nb"))
    dot = F.aggregate(F.zip_with(F.col("va"), F.col("vb"),
                                 lambda x, y: x.cast("double") * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, on="blk").filter(F.col("a") < F.col("b"))
            .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", F.round("cosine", 6).alias("cosine")))
