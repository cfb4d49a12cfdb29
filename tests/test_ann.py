"""ANN operators: IVF exactness/recall anchors and LSH recall sanity.

IVF's KMeans quantizer has no DuckDB twin, so these tests are its
correctness gate (the driver entry is rows-only): at
``nprobe == n_centroids`` every cell is probed and the result must
EQUAL brute force; at partial probe the measured recall against brute
force must clear a floor.
"""

import pytest
from pyspark.sql import functions as F

from record_linkage_ldu_spark.operators.ann import (
    cosine_topk,
    ivf_index,
    ivf_topk,
    load_ivf_index,
    lsh_topk,
    save_ivf_index,
)

SF_DIR = "/root/testdata/sf0.001"
K = 5
N_QUERIES = 20


@pytest.fixture(scope="module")
def embeddings(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.where(F.col("vec_id") < N_QUERIES)


@pytest.fixture(scope="module")
def exact(spark, embeddings, queries):
    return {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(embeddings, queries, k=K).collect()
    }


def test_ivf_full_probe_equals_brute_force(spark, embeddings, queries, exact):
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            embeddings, queries, k=K, n_centroids=8, nprobe=8
        ).collect()
    }
    assert got == exact


def test_ivf_partial_probe_recall(spark, embeddings, queries, exact):
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            embeddings, queries, k=K, n_centroids=8, nprobe=4
        ).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, recall
    # every returned neighbor is a true corpus member with a sane rank
    assert all(q < N_QUERIES for q, _ in got)


def test_ivf_prebuilt_index_probe_matches_inline_build(
    spark, embeddings, queries, tmp_path
):
    """The production split: build once (``ivf_index``), persist
    (``save_ivf_index``), probe against the loaded index — results
    must equal the convenience inline-build path (same seed)."""
    inline = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(
            embeddings, queries, k=K, n_centroids=8, nprobe=4
        ).collect()
    }
    centroids, assigned = ivf_index(embeddings, n_centroids=8)
    save_ivf_index(centroids, assigned, str(tmp_path / "ivf"))
    loaded = load_ivf_index(spark, str(tmp_path / "ivf"))
    probed = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(
            embeddings, queries, k=K, nprobe=4, index=loaded
        ).collect()
    }
    assert probed == inline


def test_lsh_topk_finds_planted_near_duplicates(spark, embeddings):
    """Sign-LSH is a near-duplicate-grade filter: generic top-k
    neighbors of near-random vectors rarely share all sign bits
    (measured recall ~0.02 vs brute force — a property of the data,
    not a bug), but a true near-duplicate agrees on every axis sign.
    Plant scaled copies (same direction -> cosine 1.0, same bucket)
    and assert each copy retrieves its original at rank 1."""
    n_planted = 20
    planted = embeddings.where(F.col("vec_id") < n_planted).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x * F.lit(1.1)).cast("float")
        ).alias("embedding"),
    )
    corpus = embeddings.select("vec_id", "embedding").unionByName(planted)
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in lsh_topk(corpus, k=1, nbits=8).collect()
        if r["query_id"] >= 100_000
    }
    assert len(top1) == n_planted
    assert all(top1[100_000 + i] == i for i in range(n_planted)), top1
