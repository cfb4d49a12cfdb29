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


def sessionize_stream(
    events_stream: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Streaming twin of ``sessionize``: gap-based session numbers as a
    custom STATEFUL operator via ``applyInPandasWithState`` keyed by
    user.

    Per-user state = (last event epoch, current session_no); each
    micro-batch sorts its slice by ts, continues the numbering from
    state, and persists the tail for the next batch — so sessions that
    span micro-batch boundaries get the SAME numbering the batch
    window-function form assigns on the full history (asserted by
    tests/test_incremental.py against ``sessionize``).  Events must
    reach their key in event-time order across batches (file-ordered
    replay or an upstream watermark+sort); out-of-order arrivals
    within one batch are handled by concatenating ALL of the key's
    Arrow chunks and sorting once — applyInPandasWithState delivers a
    key's batch as an iterator of chunks (split at
    arrow.maxRecordsPerBatch, default 10k) with no ts ordering ACROSS
    chunks, so a per-chunk sort would misnumber any key with more
    events than one chunk in a single micro-batch.  The concat bounds
    memory at one key's events per micro-batch — the same bound the
    batch window form's per-key partition already implies.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "event_id bigint, user_id bigint, ts timestamp, "
        "event_type string, session_no bigint"
    )
    state_schema = "last_epoch double, session_no bigint"
    gap_s = float(gap_minutes) * 60.0

    def assign(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        last_epoch, sess_no = (
            state.get if state.exists else (None, 0)
        )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "ts", kind="mergesort"
            )
            epochs = (
                pd.to_datetime(pdf["ts"]).astype("int64") / 1e9
            ).to_numpy()
            nums = []
            for e in epochs:
                if last_epoch is None or (e - last_epoch) > gap_s:
                    sess_no += 1
                nums.append(sess_no)
                last_epoch = float(e)
            out = pdf[["event_id", "user_id", "ts", "event_type"]].copy()
            out["session_no"] = nums
            yield out
        state.update((last_epoch, int(sess_no)))

    return (
        events_stream.select("event_id", "user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            assign,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def incremental_linkage_batch(
    spark,
    new_documents: DataFrame,
    store_dir: str,
    cfg=None,
) -> dict:
    """foreachBatch body for incremental linkage.

    Per-batch SCORING work is incremental, not a full re-run:
      1. only the new documents are normalized; prior batches' records
         are read back from ``<store>/records`` (normalize once);
      2. candidate generation runs over the full record store (cheap:
         key projection + joins) but only pairs with at least one NEW
         side are scored — an old-old equality-key pair was already
         generated when both members were present (blocking is
         deterministic), and an old-old sorted-neighborhood pair can
         only LEAVE the window as new ranks push old ranks apart,
         never newly appear;
      3. new match edges union into ``<store>/edges``; connected
         components re-runs over the union (labels are min-doc_id, so
         labels of untouched components are stable across batches);
      4. ``<store>/clusters`` is overwritten.

    Returns counters: docs in store, pairs scored this batch, total
    edges, clusters.
    """
    import os

    from ..config import SELF_COMPARE_FIELDS
    from ..operators import rules
    from ..operators.blocking import generate_candidates
    from ..operators.cc import connected_components
    from ..operators.scoring import (
        attach_pair_sides,
        score_pairs_self,
        with_combined_score,
    )
    from ..plans.linkage import LinkageConfig, records_view

    cfg = cfg or LinkageConfig()
    records_path = os.path.join(store_dir, "records")
    edges_path = os.path.join(store_dir, "edges")
    clusters_path = os.path.join(store_dir, "clusters")

    new_records = records_view(
        new_documents.dropDuplicates(["doc_id"]), cfg
    ).localCheckpoint(eager=True)

    if os.path.exists(records_path):
        old_records = spark.read.parquet(records_path)
        # idempotent replay: a doc already in the store is not "new"
        new_records = new_records.join(
            old_records.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        all_records = old_records.unionByName(new_records).localCheckpoint(
            eager=True
        )
    else:
        all_records = new_records

    pairs, _ = generate_candidates(all_records, cfg.blocking)
    new_ids = new_records.select("doc_id")
    pairs = (
        pairs.join(
            new_ids.withColumnRenamed("doc_id", "doc_id_1"),
            "doc_id_1",
            "left_semi",
        )
        .unionByName(
            pairs.join(
                new_ids.withColumnRenamed("doc_id", "doc_id_2"),
                "doc_id_2",
                "left_semi",
            )
        )
        .dropDuplicates(["doc_id_1", "doc_id_2"])
    )

    wide = attach_pair_sides(pairs, all_records, SELF_COMPARE_FIELDS)
    scored = with_combined_score(
        score_pairs_self(wide, with_jw=cfg.with_jw), mode="self"
    )
    new_edges = rules.match(scored, "self").select("doc_id_1", "doc_id_2")
    n_scored = scored.count()

    if os.path.exists(edges_path):
        edges = (
            spark.read.parquet(edges_path)
            .unionByName(new_edges)
            .dropDuplicates(["doc_id_1", "doc_id_2"])
        )
    else:
        edges = new_edges
    edges = edges.localCheckpoint(eager=True)

    clusters = connected_components(
        edges, vertices=all_records.select("doc_id"), method=cfg.cc_method
    )

    all_records.write.mode("overwrite").parquet(records_path)
    edges.write.mode("overwrite").parquet(edges_path)
    clusters.write.mode("overwrite").parquet(clusters_path)
    return {
        "docs": all_records.count(),
        "new_docs": new_records.count(),
        "pairs_scored": n_scored,
        "edges": edges.count(),
        "clusters": clusters.select("cluster_id").distinct().count(),
    }


def stream_documents_to_clusters(
    spark,
    source_path: str,
    store_dir: str,
    checkpoint_path: str,
    cfg=None,
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
        incremental_linkage_batch(spark, df, store_dir, cfg=cfg)

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
