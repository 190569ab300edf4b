#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py is FROZEN for
measurement; this file exists for guide §1 noop-sink isolation and
plan capture — its numbers are cited in OPTIMIZATION_r06.md).

Usage:
  python bench_extra.py               # time headline queries (2 passes)
  python bench_extra.py plans DIR     # dump explain('formatted') per query
  python bench_extra.py one NAME [N]  # time one query N times
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "kg_conformance_customer",
    "kg_sequence_path",
    "kg_infer_customer",
    "txt_profile",
    "dedup_ngram_jaccard",
    "emb_topk",
    "evt_sessionize",
    "trx_extract",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _session():
    from shaclex_spark.session import get_spark

    return get_spark("bench_extra", parallelism=CPUS,
                     shuffle_partitions=max(CPUS, 16))


def main_time() -> None:
    import __spark_entry__ as E

    spark = _session()
    queries = E.queries()
    # same warm-up as bench.py main()
    for name in HEADLINE:
        try:
            _force(queries[name](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
    spark.catalog.clearCache()
    per_query: dict[str, float] = {}
    min2: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            fn = queries[name]
            spark.sparkContext.setJobDescription(f"{name} pass{_pass}")
            t0 = time.time()
            _force(fn(spark, SF_DIR))
            dt = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            if _pass == 0:
                per_query[name] = dt
            min2[name] = min(dt, min2.get(name, dt))
    out = {"queries": per_query, "value": round(sum(per_query.values()), 3),
           "queries_min2": min2, "value_min2": round(sum(min2.values()), 3),
           "sf": SF_DIR}
    print(json.dumps(out))
    spark.stop()


def main_plans(outdir: str, names: list[str] | None = None) -> None:
    import __spark_entry__ as E

    os.makedirs(outdir, exist_ok=True)
    spark = _session()
    queries = E.queries()
    for name in names or HEADLINE:
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:
            plan = f"ERROR: {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}")
    spark.stop()


def main_all(sf_dir: str | None = None, passes: int = 2) -> None:
    """Time EVERY registry query (not just headline) — the round-6
    whole-surface checklist measurement. sf defaults to sf0.01 so the
    heavy quadratic oracles stay cheap; pass sf0.1 explicitly for the
    headline-scale numbers."""
    import __spark_entry__ as E

    sf = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.01")
    spark = _session()
    queries = E.queries()
    names = [n for n in queries
             if n not in ("shex_suite_scorecard", "kg_shacl_meta")]
    for name in names:
        try:
            _force(queries[name](spark, "/root/testdata/sf0.001"))
        except Exception as e:
            print(f"WARMUP FAIL {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
    spark.catalog.clearCache()
    best: dict[str, float] = {}
    first: dict[str, float] = {}
    for _pass in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} pass{_pass}")
            t0 = time.time()
            _force(queries[name](spark, sf))
            dt = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
            if _pass == 0:
                first[name] = dt
            best[name] = min(dt, best.get(name, dt))
    print(json.dumps({"sf": sf, "first": first, "min": best,
                      "total_first": round(sum(first.values()), 3),
                      "total_min": round(sum(best.values()), 3)}))
    spark.stop()


def main_one(name: str, n: int) -> None:
    import __spark_entry__ as E

    spark = _session()
    fn = E.queries()[name]
    for i in range(n):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.time()
        _force(fn(spark, SF_DIR))
        print(f"{name} rep{i}: {time.time() - t0:.3f}s")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "plans":
        main_plans(sys.argv[2], sys.argv[3:] or None)
    elif len(sys.argv) >= 3 and sys.argv[1] == "one":
        main_one(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif len(sys.argv) >= 2 and sys.argv[1] == "all":
        main_all(sys.argv[2] if len(sys.argv) > 2 else None)
    else:
        main_time()
