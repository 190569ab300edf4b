#!/usr/bin/env python
"""Phase-level profiler for the transcript pipeline's serial term.

Runs the SAME timed window bench.py uses, but instruments each driver
barrier separately so the Amdahl serial term s can be attributed:

  t_synth      input synthesis + localCheckpoint (outside bench timer)
  t_link       extract→mentions→collect→mapping (actions 1..3)
  t_build      validate_kg() plan construction (pure py4j, executors idle)
  t_force      the final conformance noop write (one job)

Each (width, n_convs) config runs in its own subprocess (fresh JVM).
Two sizes at the same width split s from W (T = s + w*n); per-phase
walls say WHERE s lives. Job/stage counts come from the status tracker.

Usage: python tools/profile_pipeline.py [leg WIDTH N_CONVS]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def leg(par: int, n_convs: int) -> None:
    from shaclex_spark.session import get_spark

    spark = get_spark(f"profile_{par}", parallelism=par,
                      shuffle_partitions=par,
                      extra_conf={
                          "spark.sql.adaptive.enabled":
                              os.environ.get("PROFILE_AQE", "false"),
                          "spark.driver.extraJavaOptions":
                              f"-XX:ParallelGCThreads={max(par, 4)} "
                              f"-XX:ConcGCThreads=2"})
    from shaclex_spark.extraction import extract_triples
    from shaclex_spark.linking import canonicalize_triples
    from shaclex_spark.pipeline import validate_kg
    from shaclex_spark.transcripts import synth_transcripts

    # warm-up (JIT, python workers) at 1/40 size, discarded
    def run(transcripts, out: dict | None) -> None:
        sc = spark.sparkContext
        st = sc.statusTracker()

        def jobs():
            return st.getJobIdsForGroup(None) or []

        def stages(since_jobs):
            n = 0
            for j in jobs():
                if j in since_jobs:
                    continue
                info = st.getJobInfo(j)
                if info:
                    n += len(info.stageIds)
            return n

        j0 = set(jobs())
        t0 = time.time()
        candidates = extract_triples(transcripts).persist()
        canonical, _ = canonicalize_triples(candidates)
        canonical = canonical.persist()
        t1 = time.time()
        stg_link = stages(j0)
        j1 = set(jobs())
        res = validate_kg(spark, canonical)
        t2 = time.time()
        res.conformance.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        stg_force = stages(j1)
        if out is not None:
            out.update({
                "t_link": round(t1 - t0, 3),
                "t_build": round(t2 - t1, 3),
                "t_force": round(t3 - t2, 3),
                "t_total": round(t3 - t0, 3),
                "stg_link": stg_link,
                "stg_force": stg_force,
            })
        import gc
        spark.catalog.clearCache()
        gc.collect()

    w, _ = synth_transcripts(spark, max(n_convs // 40, 100), seed=7)
    w = w.localCheckpoint(eager=True)
    w.count()
    run(w, None)

    t0 = time.time()
    transcripts, _ = synth_transcripts(spark, n_convs, seed=42)
    transcripts = transcripts.localCheckpoint(eager=True)
    n_turns = transcripts.count()
    t_synth = time.time() - t0
    out: dict = {"par": par, "n_convs": n_convs, "n_turns": n_turns,
                 "t_synth": round(t_synth, 3)}
    st = spark.sparkContext.statusTracker()
    jobs_before = len(st.getJobIdsForGroup(None) or [])
    reps = []
    for _ in range(int(os.environ.get("PROFILE_REPS", "3"))):
        rep: dict = {}
        run(transcripts, rep)
        reps.append(rep)
    out["n_jobs"] = (len(st.getJobIdsForGroup(None) or []) - jobs_before) \
        // max(len(reps), 1)
    out["reps"] = reps
    for k in ("t_link", "t_build", "t_force", "t_total"):
        out[k] = min(r[k] for r in reps)
    for k in ("stg_link", "stg_force"):
        out[k] = reps[-1][k]
    print(json.dumps(out))


def main() -> None:
    here = os.path.abspath(__file__)
    configs = [(4, 250_000), (4, 1_000_000), (1, 250_000)]
    results = []
    for par, n in configs:
        out = subprocess.run(
            [sys.executable, here, "leg", str(par), str(n)],
            capture_output=True, text=True, timeout=900)
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print(f"LEG {par}x{n} FAILED:\n{out.stderr[-3000:]}")
            continue
        rec = json.loads(lines[-1])
        results.append(rec)
        print(json.dumps(rec))
        time.sleep(10)
    # Amdahl split from the two width-4 sizes: T = s + w*n/4
    four = [r for r in results if r["par"] == 4]
    if len(four) == 2:
        a, b = sorted(four, key=lambda r: r["n_convs"])
        w_per_conv = (b["t_total"] - a["t_total"]) / (b["n_convs"] - a["n_convs"]) * 4
        s = a["t_total"] - w_per_conv * a["n_convs"] / 4
        print(json.dumps({"amdahl_s": round(s, 2),
                          "w_core_s_per_M": round(w_per_conv * 1e6, 1)}))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "leg":
        leg(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
