"""Plan-shape regression tests: the physical plans of key registry
queries must keep the properties the 100-TB design depends on —
no cartesian products anywhere, parquet filter pushdown on selective
scans, and broadcast (not sort-merge) joins where one side is a
dimension. A refactor that silently loses one of these still passes
value-equality tests at sandbox scale; these assertions catch it."""

from __future__ import annotations

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = E.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def _ann_plan(spark, which: str) -> str:
    from shaclex_spark.functions.similarity import ann_ivf_topk, ann_lsh_topk

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    if which == "lsh":
        df = ann_lsh_topk(emb, query_ids=list(range(8)), k=5,
                          n_planes=8, n_tables=8, probe_hamming=2)
    else:
        df = ann_ivf_topk(emb, query_ids=list(range(8)), k=5,
                          n_lists=16, n_probe=8)
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_products(spark):
    """emb_topk (and the emb_ann_* GATE queries, which join the ANN
    output against that exact baseline for their recall oracle) are
    excluded from the nested-loop check: the brute-force baseline IS
    corpus × broadcast(8 queries), physically a
    BroadcastNestedLoopJoin with a tiny build side — by design. The
    raw ANN operators are pinned separately (_ann_plan)."""
    for name in ["kg_conformance_customer", "kg_sequence_path",
                 "dedup_ngram_jaccard", "evt_sessionize", "txt_profile"]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    for which in ("lsh", "ivf"):
        plan = _ann_plan(spark, which)
        assert "CartesianProduct" not in plan, which
        assert "BroadcastNestedLoopJoin" not in plan, which
    for name in ("emb_topk", "emb_ann_lsh", "emb_ann_ivf"):
        assert "CartesianProduct" not in _plan(spark, name), name


def test_ann_queries_use_broadcast_joins(spark):
    """The candidate joins of both ANN paths must broadcast the query
    side; a sort-merge join there shuffles the whole corpus."""
    for which in ("lsh", "ivf"):
        plan = _ann_plan(spark, which)
        assert "BroadcastHashJoin" in plan, which
        assert "SortMergeJoin" not in plan, which


def test_documents_scan_prunes_columns(spark):
    """txt_profile reads only (doc_id, text): the parquet ReadSchema
    must not include unused columns like url/lang/quality."""
    plan = _plan(spark, "txt_profile")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, "no parquet scan found"
    assert "url" not in read[0] and "quality" not in read[0], read[0]
