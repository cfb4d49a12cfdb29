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
