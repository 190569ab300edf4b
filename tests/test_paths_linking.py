"""Unit tests for path algebra variants and connected components not
exercised by the oracle-parity registry."""

from __future__ import annotations

from pyspark.sql import functions as F

from shaclex_spark.linking import connected_components, jaccard_verify
from shaclex_spark.paths import path_pairs
from shaclex_spark.shapes import Path

from conftest import triples_df

EX = "http://example.org/"


def edges(spark, pairs, pred=EX + "p"):
    rows = [(a, pred, "iri", b, None, None) for a, b in pairs]
    return triples_df(spark, rows)


def srcs(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "n string")


def pairset(df):
    return {(r.src, r.v_value) for r in df.collect()}


def test_alternative_path(spark):
    t = triples_df(spark, [
        (EX + "a", EX + "p", "iri", EX + "x", None, None),
        (EX + "a", EX + "q", "iri", EX + "y", None, None),
        (EX + "a", EX + "r", "iri", EX + "z", None, None),
    ])
    p = Path("alternative", steps=(Path("pred", iri=EX + "p"),
                                   Path("pred", iri=EX + "q")))
    got = pairset(path_pairs(t, p, srcs(spark, [EX + "a"])))
    assert got == {(EX + "a", EX + "x"), (EX + "a", EX + "y")}


def test_zero_or_one_path(spark):
    t = edges(spark, [(EX + "a", EX + "b")])
    p = Path("zeroOrOne", steps=(Path("pred", iri=EX + "p"),))
    got = pairset(path_pairs(t, p, srcs(spark, [EX + "a", EX + "c"])))
    assert got == {(EX + "a", EX + "a"), (EX + "a", EX + "b"),
                   (EX + "c", EX + "c")}


def test_one_or_more_cycle_terminates(spark):
    # cycle a->b->c->a : closure must terminate and reach all three
    t = edges(spark, [(EX + "a", EX + "b"), (EX + "b", EX + "c"),
                      (EX + "c", EX + "a")])
    p = Path("oneOrMore", steps=(Path("pred", iri=EX + "p"),))
    got = pairset(path_pairs(t, p, srcs(spark, [EX + "a"])))
    assert got == {(EX + "a", EX + "b"), (EX + "a", EX + "c"),
                   (EX + "a", EX + "a")}


def test_inverse_of_sequence(spark):
    t = triples_df(spark, [
        (EX + "a", EX + "p", "iri", EX + "m", None, None),
        (EX + "m", EX + "q", "iri", EX + "z", None, None),
    ])
    inner = Path("sequence", steps=(Path("pred", iri=EX + "p"),
                                    Path("pred", iri=EX + "q")))
    p = Path("inverse", steps=(inner,))
    got = pairset(path_pairs(t, p, srcs(spark, [EX + "z"])))
    assert got == {(EX + "z", EX + "a")}


def test_connected_components_two_clusters(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "a string, b string")
    v = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("y",), ("lone",)], "node string")
    comps = {r.node: r.comp for r in connected_components(e, v).collect()}
    assert comps["a"] == comps["b"] == comps["c"] == "a"
    assert comps["x"] == comps["y"] == "x"
    assert comps["lone"] == "lone"


def test_jaccard_verify_threshold(spark):
    pairs = spark.createDataFrame(
        [("alice_moore", "alice_m_moore"), ("alice_moore", "bob_stone")],
        "a string, b string")
    got = {(r.a, r.b) for r in jaccard_verify(pairs, 0.55).collect()}
    assert ("alice_moore", "alice_m_moore") in got
    assert ("alice_moore", "bob_stone") not in got


def test_frame_sample(spark):
    from shaclex_spark.functions.multimodal import frame_sample, synth_media

    docs = spark.createDataFrame(
        [(2, "x" * 25000), (5, "y" * 100)], "doc_id long, text string")
    media = synth_media(docs)  # doc_id%3==2 → video/mp4
    frames = frame_sample(media, every_ms=10_000).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_ts_ms)
    # duration for doc 2 = 1000 + 25000 % 60000 = 26000ms → 2 frames
    assert sorted(by_doc[2]) == [0, 10000]
    assert sorted(by_doc[5]) == [0]  # 1100ms → 1 frame
