"""Connected components on known graphs (SURVEY.md §5): chain, star,
two components, singletons — asserting the *documented* transitive
semantics (main_ldu_hw.py:27-28), for both algorithms."""

import pytest

from record_linkage_ldu_spark.operators.cc import connected_components

GRAPHS = {
    "chain": (
        [("a", "b"), ("b", "c"), ("c", "d")],
        {"a": "a", "b": "a", "c": "a", "d": "a"},
    ),
    "star": (
        [("hub", "s1"), ("hub", "s2"), ("hub", "s3")],
        {"hub": "hub", "s1": "hub", "s2": "hub", "s3": "hub"},
    ),
    "two_components": (
        [("a", "b"), ("c", "d"), ("d", "e")],
        {"a": "a", "b": "a", "c": "c", "d": "c", "e": "c"},
    ),
    "triangle_plus_edge": (
        [("x", "y"), ("y", "z"), ("x", "z"), ("p", "q")],
        {"x": "x", "y": "x", "z": "x", "p": "p", "q": "p"},
    ),
    "reversed_ids": (  # min label must win regardless of edge direction
        [("z9", "z1"), ("z1", "z5")],
        {"z1": "z1", "z5": "z1", "z9": "z1"},
    ),
    "long_chain": (
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)],
        {f"n{i:02d}": "n00" for i in range(13)},
    ),
}


@pytest.mark.parametrize("method", ["alternating-star", "label-prop", "driver-uf"])
@pytest.mark.parametrize("name", list(GRAPHS))
def test_cc_golden(spark, method, name):
    edges, expected = GRAPHS[name]
    df = spark.createDataFrame(edges, ["doc_id_1", "doc_id_2"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, method=method).collect()
    }
    assert got == expected


@pytest.mark.parametrize("method", ["alternating-star", "label-prop", "driver-uf"])
def test_cc_singletons_via_vertices(spark, method):
    edges = spark.createDataFrame([("a", "b")], ["doc_id_1", "doc_id_2"])
    verts = spark.createDataFrame([("a",), ("b",), ("lonely",)], ["doc_id"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, vertices=verts, method=method).collect()
    }
    assert got == {"a": "a", "b": "a", "lonely": "lonely"}


def test_cc_empty_edges(spark):
    edges = spark.createDataFrame([], "doc_id_1 string, doc_id_2 string")
    verts = spark.createDataFrame([("a",), ("b",)], ["doc_id"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, vertices=verts).collect()
    }
    assert got == {"a": "a", "b": "b"}


def test_cc_methods_agree_on_random_graph(spark):
    import random

    rng = random.Random(3)
    nodes = [f"v{i:03d}" for i in range(120)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    df = spark.createDataFrame(edges, ["doc_id_1", "doc_id_2"])
    a = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, method="alternating-star").collect()
    }
    b = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, method="label-prop").collect()
    }
    assert a == b


def test_cc_methods_agree_driver_uf(spark):
    import random

    rng = random.Random(7)
    nodes = [f"w{i:03d}" for i in range(150)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(180)]
    df = spark.createDataFrame(edges, ["doc_id_1", "doc_id_2"])
    star = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, method="alternating-star").collect()
    }
    uf = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, method="driver-uf").collect()
    }
    assert star == uf


def test_cc_auto_dispatch(spark, monkeypatch):
    """auto -> driver-uf under the gate, alternating-star above it."""
    from record_linkage_ldu_spark.operators import cc as cc_mod

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["doc_id_1", "doc_id_2"]
    )
    expected = {"a": "a", "b": "a", "c": "a"}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, method="auto").collect()
    }
    assert got == expected
    # force the distributed path by shrinking the gate to zero
    monkeypatch.setattr(cc_mod, "DRIVER_UF_MAX_EDGES", 0)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, method="auto").collect()
    }
    assert got == expected


def test_golden_records_survivorship(spark):
    """One golden row per cluster: modal non-empty value per field,
    ties broken by value ascending, all-empty fields NULL, singletons
    pass through."""
    from record_linkage_ldu_spark.operators.evaluate import golden_records

    records = spark.createDataFrame(
        [
            # cluster A: 'acme corp' wins name 2-1; phone tie 1-1 ->
            # lexicographically smaller '111' wins; email all empty
            ("a1", "acme corp", "111", "", "1 main st"),
            ("a2", "acme corp", "222", None, "1 main st"),
            ("a3", "acme inc", "", "", "1 main st"),
            # singleton cluster B
            ("b1", "solo llc", "999", "s@x.com", ""),
        ],
        "doc_id string, name string, phone string, email string, "
        "address string",
    )
    clusters = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("a3", "a1"), ("b1", "b1")],
        "doc_id string, cluster_id string",
    )
    out = {r["cluster_id"]: r for r in golden_records(records, clusters).collect()}
    a = out["a1"]
    assert (a["cluster_size"], a["name"], a["phone"], a["email"], a["address"]) == (
        3, "acme corp", "111", None, "1 main st",
    )
    b = out["b1"]
    assert (b["cluster_size"], b["name"], b["email"], b["address"]) == (
        1, "solo llc", "s@x.com", None,
    )
