#!/usr/bin/env python
"""Benchmark harness.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], plus the end-to-end transcript pipeline
(synth → extract → link → validate) at two parallelism levels
(local[N/4] vs local[N]) for the north-rule scaling-efficiency
evidence (BASELINE.md protocol). Each scaling leg runs in its OWN
subprocess (fresh JVM): repeated SparkContext restarts inside one JVM
produce unreliable timings.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pipeline": {"n_turns": .., "turns_per_sec_A/B": ..,
                "scaling_efficiency": ..}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "350000"))
SKIP_SCALING = os.environ.get("SPARK_GRAFT_SKIP_SCALING", "") == "1"

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
    """Force full computation of every column (noop sink — count()
    would let Catalyst prune expensive projections)."""
    df.write.format("noop").mode("overwrite").save()


def _timed_pipeline(spark, transcripts) -> float:
    """Time one extract→link→validate pass over prepared input."""
    from shaclex_spark.extraction import extract_triples
    from shaclex_spark.linking import canonicalize_triples
    from shaclex_spark.pipeline import validate_kg

    t0 = time.time()
    candidates = extract_triples(transcripts).persist()
    canonical, _ = canonicalize_triples(candidates)
    canonical = canonical.persist()
    res = validate_kg(spark, canonical)
    _force(res.conformance)
    elapsed = time.time() - t0
    # release ALL cached blocks (engine-internal persists included);
    # leftover blocks degrade successive runs in the same JVM.
    import gc

    spark.catalog.clearCache()
    gc.collect()
    return elapsed


def run_pipeline(spark, n_convs: int, seed: int = 42) -> tuple[float, int]:
    """One end-to-end pipeline run; returns (steady-state sec, turns)."""
    from shaclex_spark.transcripts import synth_transcripts

    transcripts, _ = synth_transcripts(spark, n_convs, seed=seed)
    transcripts = transcripts.localCheckpoint(eager=True)  # pin input cost out
    n_turns = transcripts.count()
    return _timed_pipeline(spark, transcripts), n_turns


def _leg_main(par: int, n_convs: int) -> None:
    """Subprocess entry: one warm-up + median of 3 timed runs
    (BASELINE.md protocol; local-mode timings are noisy under
    storage-memory churn, the median is the robust estimator)."""
    from shaclex_spark.session import get_spark

    from shaclex_spark.transcripts import synth_transcripts

    spark = get_spark(f"bench_leg_{par}", parallelism=par,
                      shuffle_partitions=max(par, 16))
    run_pipeline(spark, max(n_convs // 20, 100))  # warm-up (JIT, workers)
    transcripts, _ = synth_transcripts(spark, n_convs, seed=42)
    transcripts = transcripts.localCheckpoint(eager=True)  # one shared input
    n_turns = transcripts.count()
    times = sorted(_timed_pipeline(spark, transcripts) for _ in range(3))
    # estimator (BASELINE.md "Protocol"): MEDIAN of 3 is the headline
    # number; the min is reported alongside because host throttling is
    # strictly additive noise, so it bounds true compute time.
    print(json.dumps({"elapsed": times[1], "elapsed_min": times[0],
                      "n_turns": n_turns, "all_runs": times}))


def _run_leg(par: int, n_convs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "leg", str(par), str(n_convs)],
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not last:
        raise RuntimeError(f"leg {par} failed: {out.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    import __spark_entry__ as E
    from shaclex_spark.session import get_spark

    out: dict = {"unit": "sec", "sf": SF_DIR,
                 "metric": "headline suite wall-clock at sf dir + "
                           "pipeline turns/sec at two parallelism levels"}

    spark = get_spark("bench_headline", parallelism=CPUS,
                      shuffle_partitions=max(CPUS, 16))
    queries = E.queries()
    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        _force(fn(spark, SF_DIR))
        dt = round(time.time() - t0, 3)
        per_query[name] = dt
        total += dt
    out["queries"] = per_query
    out["value"] = round(total, 3)
    spark.stop()

    if not SKIP_SCALING:
        # Executor-sized legs: real clusters run 4-8 core executors;
        # local[32] on a 32-vCPU VM oversubscribes (each task slot
        # carries JVM shuffle/Arrow/GC helper threads plus a Python
        # worker process) and collapses per-core efficiency, so the
        # N→4N evidence uses 2 vs 8 cores (see BASELINE.md).
        n_a = int(os.environ.get("SPARK_GRAFT_SCALE_A", "2"))    # N
        n_b = int(os.environ.get("SPARK_GRAFT_SCALE_B", "8"))    # 4N
        # cool-down: the sandbox host throttles sustained wide load
        # (steal time climbs to ~30% after ~25 s of 32-wide work);
        # idle gaps let the burst budget recover so each leg is
        # measured against the same machine state (BASELINE.md).
        cooldown = int(os.environ.get("SPARK_GRAFT_COOLDOWN", "60"))
        time.sleep(cooldown)
        leg_a = _run_leg(n_a, BENCH_CONVS)
        time.sleep(cooldown)
        leg_b = _run_leg(n_b, BENCH_CONVS)
        thr_a = leg_a["n_turns"] / leg_a["elapsed"]
        thr_b = leg_b["n_turns"] / leg_b["elapsed"]
        out["pipeline"] = {
            "n_turns": leg_b["n_turns"],
            "cores_A": n_a, "cores_B": n_b,
            "sec_A": round(leg_a["elapsed"], 3),
            "sec_B": round(leg_b["elapsed"], 3),
            "all_runs_A": [round(x, 2) for x in leg_a.get("all_runs", [])],
            "all_runs_B": [round(x, 2) for x in leg_b.get("all_runs", [])],
            "turns_per_sec_A": round(thr_a, 1),
            "turns_per_sec_B": round(thr_b, 1),
            "scaling_efficiency": round(thr_b / (4.0 * thr_a), 3),
        }
        out["turns_per_sec"] = round(thr_b, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "leg":
        _leg_main(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
