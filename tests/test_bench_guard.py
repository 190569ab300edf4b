"""Bench regression guard (VERDICT r2 'Next round' #7): a plan
regression (lost broadcast, HOF re-evaluation, extra shuffle) should
fail CI here rather than waiting for the round bench.

Reference times are committed sf0.01 measurements with the
calibration-probe reading of the host that took them; at test time the
budget scales by the CURRENT probe reading, so a slow CI host widens
budgets instead of flaking. The deliberate-regression test pins that
the guard's margin actually separates a known-bad plan (inline
higher-order-function shingling, the measured 17x trap) from the good
one.
"""

from __future__ import annotations

import time

import pytest

SF = "/root/testdata/sf0.01"

# (seconds at sf0.01, single local[4] test session, warm-up discarded;
# calibration probe read CAL_REF when measured — round 3)
CAL_REF = 0.066
REF_SEC = {
    "kg_conformance_customer": 3.054,
    "kg_sequence_path": 3.136,
    "kg_infer_customer": 1.111,
    "txt_profile": 0.486,
    "dedup_ngram_jaccard": 1.86,  # prefix-filter join: slightly slower
    #   at 500 docs (window sort overhead) but 2x faster at sf0.1 and
    #   the asymptotic winner — candidate volume bounded by token
    #   rarity, not minhash collision luck
    "emb_topk": 0.639,
    "evt_sessionize": 0.307,
    "trx_extract": 0.659,
}


def _cal() -> float:
    import hashlib

    t0 = time.time()
    h = b"x" * 4096
    for _ in range(12000):
        h = hashlib.md5(h).digest() + h[:4080]
    return time.time() - t0


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def budget_for(ref_sec: float, cal_now: float) -> float:
    """1.8x the committed reference, scaled by host slowdown, plus a
     1.5 s absolute floor for sub-second queries whose variance is
    dominated by fixed job latency."""
    host_factor = max(cal_now / CAL_REF, 1.0)
    return max(ref_sec * 1.8 * host_factor, ref_sec * host_factor + 1.5)


def test_budget_math_flags_regressions():
    # the guard must trip on a 3x regression on a clean host...
    assert 3.0 * 2.0 > budget_for(2.0, CAL_REF)
    # ...must NOT trip on a 1.2x wobble, even on a 1.5x-throttled host
    assert 1.2 * 2.0 < budget_for(2.0, CAL_REF * 1.5)
    # ...and sub-second queries get the absolute floor
    assert budget_for(0.3, CAL_REF) >= 1.5


@pytest.mark.parametrize("name", sorted(k for k, v in REF_SEC.items()
                                        if v is not None))
def test_headline_query_within_budget(spark, name):
    import __spark_entry__ as E

    q = E.queries()[name]
    _force(q(spark, "/root/testdata/sf0.001"))  # warm-up, discarded
    spark.catalog.clearCache()
    t0 = time.time()
    _force(q(spark, SF))
    elapsed = time.time() - t0
    cal = _cal()
    assert elapsed <= budget_for(REF_SEC[name], cal), \
        f"{name}: {elapsed:.2f}s over budget {budget_for(REF_SEC[name], cal):.2f}s (cal {cal:.3f})"


def test_deliberate_regression_is_caught(spark):
    """The known-bad plan (word_shingles inline HOF — re-tokenizes per
    shingle position, the trap shingle_table exists to avoid) must
    exceed the guard margin relative to the good plan on the SAME host
    at the same moment — a ratio check, immune to host state."""
    from pyspark.sql import functions as F

    from shaclex_spark.functions.dedup import shingle_table, word_shingles

    docs = spark.read.parquet(SF + "/documents.parquet")
    # warm-up both paths once (codegen)
    _force(shingle_table(docs, "doc_id", "text", 3))
    _force(docs.select("doc_id", word_shingles(F.col("text"), 3).alias("sh")))
    t0 = time.time()
    _force(shingle_table(docs, "doc_id", "text", 3))
    good = time.time() - t0
    t0 = time.time()
    _force(docs.select("doc_id", word_shingles(F.col("text"), 3).alias("sh")))
    bad = time.time() - t0
    # measured ~17x at sf0.1; require a conservative 2x at sf0.01 —
    # if this fails, the trap disappeared (good news: update the docs)
    # or the guard margin is too tight to catch it (bad news).
    assert bad > 2.0 * good, f"good={good:.2f}s bad={bad:.2f}s"


def test_bench_input_reused_when_marker_matches(tmp_path, monkeypatch):
    """_materialize_bench_input must skip synthesis when the on-disk
    marker records the same n_convs (deterministic seed-42 input), and
    must re-synthesize on a size mismatch."""
    import subprocess

    import bench

    inp = tmp_path / "bench_input"
    inp.mkdir()
    monkeypatch.setattr(bench, "BENCH_INPUT", str(inp))
    (tmp_path / "bench_input.convs").write_text("12345")

    calls = []
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: calls.append(a) or None)
    # avoid the real sp.run import path inside the function
    import sys
    monkeypatch.setitem(sys.modules, "subprocess", subprocess)

    bench._materialize_bench_input(12345)
    assert calls == []          # marker matches -> reuse, no synthesis

    bench._materialize_bench_input(99999)
    assert len(calls) == 1      # mismatch -> re-synthesize
