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


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """The applyInPandasWithState sessionizer must assign the SAME
    session numbers as the batch window-function form even when a
    user's session spans micro-batch boundaries (state carries the
    last event epoch + session counter across batches)."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from record_linkage_ldu_spark.streaming.incremental import (
        sessionize,
        sessionize_stream,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cut = events.agg(
        F.expr("percentile(cast(cast(ts as timestamp) as double), 0.5)").alias("m")
    ).collect()[0]["m"]

    stream_dir = tmp_path / "stream_in"
    stream_dir.mkdir()
    for i, half in enumerate(
        (
            events.where(F.col("ts").cast("timestamp").cast("double") <= cut),
            events.where(F.col("ts").cast("timestamp").cast("double") > cut),
        )
    ):
        stage = tmp_path / f"stage{i}"
        half.coalesce(1).write.parquet(str(stage))
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        dst = stream_dir / f"batch{i}.parquet"
        shutil.copy(part, dst)
        # file source replays in modification-time order
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sess_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["event_id"], r["session_no"])
        for r in spark.table("sess_stream_out").collect()
    }
    expected = {
        (r["event_id"], r["session_no"])
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert len(got) == events.count()
    assert got == expected
