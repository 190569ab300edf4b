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


def test_no_cartesian_products(spark):
    """emb_topk is excluded from the nested-loop check: the brute-force
    baseline IS corpus × broadcast(8 queries), physically a
    BroadcastNestedLoopJoin with a tiny build side — by design."""
    for name in ["kg_conformance_customer", "kg_sequence_path",
                 "dedup_ngram_jaccard", "emb_ann_lsh",
                 "emb_ann_ivf", "evt_sessionize", "txt_profile"]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in _plan(spark, "emb_topk")


def test_ann_queries_use_broadcast_joins(spark):
    """The candidate joins of both ANN paths must broadcast the query
    side; a sort-merge join there shuffles the whole corpus."""
    for name in ["emb_ann_lsh", "emb_ann_ivf"]:
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_documents_scan_prunes_columns(spark):
    """txt_profile reads only (doc_id, text): the parquet ReadSchema
    must not include unused columns like url/lang/quality."""
    plan = _plan(spark, "txt_profile")
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, "no parquet scan found"
    assert "url" not in read[0] and "quality" not in read[0], read[0]
