"""Incremental (micro-batch) linkage: per-batch work is bounded by the
touched blocks / new-side pairs, results equal the full batch run, and
the Structured-Streaming wrapper drives the same path end-to-end."""

from pyspark.sql import functions as F

from record_linkage_ldu_spark.plans.linkage import (
    LinkageConfig,
    LinkagePipeline,
)
from record_linkage_ldu_spark.sources.synth import synth_documents
from record_linkage_ldu_spark.streaming.incremental import (
    incremental_linkage_batch,
    stream_documents_to_clusters,
)


def _docs(spark):
    return synth_documents(
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    )


def _cluster_set(df):
    rows = df.select("doc_id", "cluster_id").collect()
    return {(r["doc_id"], r["cluster_id"]) for r in rows}


def test_incremental_two_batches_match_full_run(spark, tmp_path):
    docs = _docs(spark).localCheckpoint(eager=True)
    batch1 = docs.where(F.substring("doc_id", 1, 1) != "c")
    batch2 = docs.where(F.substring("doc_id", 1, 1) == "c")
    store = str(tmp_path / "store")

    s1 = incremental_linkage_batch(spark, batch1, store)
    s2 = incremental_linkage_batch(spark, batch2, store)

    full = LinkagePipeline(spark, LinkageConfig()).run(docs)
    got = _cluster_set(spark.read.parquet(f"{store}/clusters"))
    want = _cluster_set(full.clusters)
    assert got == want

    # batch 2 scored only new-side pairs, strictly less than the full
    # pipeline's candidate set
    full_pairs = full.pairs.count()
    assert 0 < s2["pairs_scored"] < full_pairs
    assert s2["docs"] == docs.count()


def test_incremental_replay_is_idempotent(spark, tmp_path):
    docs = _docs(spark).localCheckpoint(eager=True)
    store = str(tmp_path / "store")
    s1 = incremental_linkage_batch(spark, docs, store)
    before = _cluster_set(spark.read.parquet(f"{store}/clusters"))
    s2 = incremental_linkage_batch(spark, docs, store)  # replay same batch
    after = _cluster_set(spark.read.parquet(f"{store}/clusters"))
    assert before == after
    assert s2["new_docs"] == 0
    assert s2["pairs_scored"] == 0


def test_streaming_wrapper_available_now(spark, tmp_path):
    docs = _docs(spark).localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    docs.where(F.substring("doc_id", 1, 1) == "a").coalesce(1).write.parquet(
        src
    )
    docs.where(F.substring("doc_id", 1, 1) != "a").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    store = str(tmp_path / "store")
    q = stream_documents_to_clusters(
        spark, src, store, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    full = LinkagePipeline(spark, LinkageConfig()).run(docs)
    got = _cluster_set(spark.read.parquet(f"{store}/clusters"))
    assert got == _cluster_set(full.clusters)
