"""Per-query empirical profiling harness (guide §1/§7): runs selected
registry queries with the Spark UI enabled, then pulls per-stage
metrics (duration, shuffle read/write bytes, task counts) from the
monitoring REST API and prints a compact breakdown.

Usage: python tools/profile_queries.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = ["kg_conformance_customer", "kg_sequence_path",
           "kg_infer_customer", "txt_profile", "dedup_ngram_jaccard",
           "emb_topk", "evt_sessionize", "trx_extract"]


def _api(port: int, path: str):
    with urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:] or DEFAULT

    import __spark_entry__ as E
    from shaclex_spark.session import get_spark

    spark = get_spark("profile_queries",
                      extra_conf={"spark.ui.enabled": "true"})
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app = spark.sparkContext.applicationId
    queries = E.queries()

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up pass at sf0.001 (codegen + python workers)
    for name in names:
        try:
            _force(queries[name](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
    spark.catalog.clearCache()

    for name in names:
        sc = spark.sparkContext
        sc.setJobDescription(f"profile:{name}")
        jobs_before = {j["jobId"] for j in _api(port, f"applications/{app}/jobs")}
        t0 = time.time()
        _force(queries[name](spark, SF_DIR))
        wall = time.time() - t0
        sc.setJobDescription(None)
        jobs = [j for j in _api(port, f"applications/{app}/jobs")
                if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: {wall:.2f}s wall, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages ===")
        rows = []
        for sid in stage_ids:
            try:
                stages = _api(port, f"applications/{app}/stages/{sid}")
            except Exception:
                continue
            for st in stages:
                if st["status"] == "SKIPPED":
                    continue
                dur = (st.get("executorRunTime", 0)) / 1000.0
                rows.append((
                    dur, sid, st["numCompleteTasks"],
                    st.get("executorRunTime", 0) / 1000.0,
                    st.get("shuffleReadBytes", 0) / 1e6,
                    st.get("shuffleWriteBytes", 0) / 1e6,
                    st.get("inputBytes", 0) / 1e6,
                    (st.get("name") or "")[:80],
                ))
        rows.sort(reverse=True)
        print(f"{'exec_s':>8} {'stage':>5} {'tasks':>5} {'shufR_MB':>9} "
              f"{'shufW_MB':>9} {'in_MB':>8}  name")
        for dur, sid, nt, ert, sr, sw, inp, nm in rows[:14]:
            print(f"{ert:8.2f} {sid:5d} {nt:5d} {sr:9.2f} {sw:9.2f} "
                  f"{inp:8.2f}  {nm}")
    spark.stop()


if __name__ == "__main__":
    main()
