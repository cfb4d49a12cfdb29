"""Multimodal column plumbing: media spans as opaque binary + typed
metadata, decode/feature steps as Arrow-batched mapInPandas.

The interleaved documents carry media spans (kind='media',
media_ref=URI).  A 100TB pipeline treats payloads as opaque
``binary`` columns with a typed metadata struct; decode / resize /
frame-sample are per-batch Pandas functions.  The image/audio codec
libraries are NOT in this container (environment constraint), so the
decode kernel is a clearly-marked deterministic stub — the Spark-side
contract (schema, batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, media_type string, "
    "payload binary, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "doc_id string, media_ref string, media_type string, "
    "feature array<float>, decode_ok boolean"
)


def media_table(documents: DataFrame) -> DataFrame:
    """Explode media spans into a typed media table.  Payloads are
    synthesized deterministically from the ref (stand-in for an object
    -store fetch, which would be an Iceberg `binary` column or a
    FileIO read inside the same mapInPandas pass)."""
    media = (
        documents.select(
            "doc_id", F.explode("spans").alias("s")
        )
        .where(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    return media.select(
        "doc_id",
        "media_ref",
        F.when(F.col("media_ref").startswith("img://"), "image")
        .when(F.col("media_ref").startswith("aud://"), "audio")
        .when(F.col("media_ref").startswith("vid://"), "video")
        .otherwise("unknown")
        .alias("media_type"),
        F.encode(F.col("media_ref"), "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def extract_media_features(
    media: DataFrame, feature_dim: int = 8, batch_hint: int = 1024
) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    Real deployments swap ``_decode_batch`` for an image/audio decoder
    (PIL/torchvision/ffmpeg); this container has none, so the decode
    step is a STUB producing a deterministic md5-derived feature — the
    distributed plumbing (mapInPandas, schema, batch shape) is the part
    under test.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = []
            ok = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    ok.append(False)
                    continue
                # STUB decode: deterministic pseudo-feature from bytes.
                # Replace with a real decoder where codecs exist; raise
                # NotImplementedError for types a deployment refuses.
                digest = hashlib.md5(bytes(payload)).digest()
                feats.append(
                    [
                        float(digest[i % len(digest)]) / 255.0
                        for i in range(feature_dim)
                    ]
                )
                ok.append(True)
            out = pdf[["doc_id", "media_ref", "media_type"]].copy()
            out["feature"] = feats
            out["decode_ok"] = ok
            yield out

    return media.mapInPandas(_decode_batch, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id string, media_ref string, media_type string, "
    "width int, height int, out_width int, out_height int, "
    "payload binary"
)

FRAME_SCHEMA = (
    "doc_id string, media_ref string, media_type string, "
    "frame_idx int, ts_ms int, frame_ref string, frame_payload binary"
)


def resize_media(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize plan over the media table
    (mapInPandas; the Arrow batch is where a real deployment calls
    PIL/libvips).  Source dimensions come from the decoder — stubbed
    here as md5-derived 64..1084px sides (no codecs in this
    container); the TARGET-dimension arithmetic (scale to the longer
    side, floor, min 1px) is the real, tested logic.  Rows whose
    payload is null pass through with null dims (decode failure —
    downstream filters on them)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            w_in, h_in, w_out, h_out = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    w_in.append(None)
                    h_in.append(None)
                    w_out.append(None)
                    h_out.append(None)
                    continue
                d = hashlib.md5(bytes(payload)).digest()
                # STUB decode dims; replace with the codec's size read
                w, h = 64 + d[2] * 4, 64 + d[3] * 4
                if max(w, h) <= max_side:
                    tw, th = w, h
                else:
                    # expression ORDER matters for oracle parity:
                    # w*max_side (exact in double) then /longest —
                    # same double ops as the SQL twin's
                    # floor(w * 256.0 / m), so the floor can't flip
                    # on a last-ulp difference
                    m = max(w, h)
                    tw = max(1, int(w * max_side / m))
                    th = max(1, int(h * max_side / m))
                w_in.append(w)
                h_in.append(h)
                w_out.append(tw)
                h_out.append(th)
            out = pdf[["doc_id", "media_ref", "media_type"]].copy()
            out["width"] = pd.array(w_in, dtype="Int64")
            out["height"] = pd.array(h_in, dtype="Int64")
            out["out_width"] = pd.array(w_out, dtype="Int64")
            out["out_height"] = pd.array(h_out, dtype="Int64")
            # STUB: a real kernel writes the re-encoded bytes here
            out["payload"] = pdf["payload"]
            yield out

    return media.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_duration_ms: int = 30_000
) -> DataFrame:
    """Frame/segment sampling plan: one output row per sampled
    timestamp — the mapInPandas fan-out shape (variable rows per
    input row) a video pipeline needs.  Still images yield exactly
    one frame at ts 0; audio/video get an md5-derived stub duration
    (1s..max) sampled every ``every_ms`` (a real deployment reads the
    container header and decodes keyframes in the same batch pass).
    Frame payloads are stubbed as the frame_ref bytes."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        cols = (
            "doc_id", "media_ref", "media_type",
            "frame_idx", "ts_ms", "frame_ref", "frame_payload",
        )
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, ref, mtype, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["media_type"],
                pdf["payload"],
            ):
                if payload is None:
                    continue
                if mtype in ("video", "audio"):
                    d = hashlib.md5(bytes(payload)).digest()
                    duration = 1000 + (
                        ((d[0] << 8) | d[1]) % (max_duration_ms - 1000)
                    )
                else:
                    duration = 1  # still image: single frame at ts 0
                for idx, ts in enumerate(range(0, duration, every_ms)):
                    fref = f"{ref}#{idx}"
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    out["media_type"].append(mtype)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    out["frame_ref"].append(fref)
                    out["frame_payload"].append(fref.encode())
            yield pd.DataFrame(out, columns=list(cols))

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact content dedup over the media table: md5 of the payload
    bytes, canonical = lexicographically-least (doc_id, media_ref)
    holder of each hash, ``keep=0`` for the other copies — the
    binary-column analogue of ``dedup.exact_duplicates`` (the same
    image uploaded under many refs collapses to one stored copy; the
    span keeps its media_ref, the store keeps one object).

    Scale shape: one hash-groupBy on the content hash + a join back on
    the same key (both sides partition identically — one shuffle
    each).  A hash group is a duplicate family (bounded); the join
    carries only (hash, canonical).  At 100TB the hash is computed
    where the bytes already are (scan-side projection), so full
    payloads never shuffle — only (id, ref, 32-byte hash).
    """
    base = media.select(
        "doc_id", "media_ref", F.md5("payload").alias("content_hash")
    )
    canon = base.groupBy("content_hash").agg(
        F.min(F.struct("doc_id", "media_ref")).alias("_c"),
        F.count("*").cast("long").alias("n_copies"),
    )
    return base.join(canon, "content_hash").select(
        "doc_id",
        "media_ref",
        "content_hash",
        "n_copies",
        (
            (F.col("doc_id") == F.col("_c.doc_id"))
            & (F.col("media_ref") == F.col("_c.media_ref"))
        )
        .cast("int")
        .alias("keep"),
    )
