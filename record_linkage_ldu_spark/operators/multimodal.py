"""Multimodal column plumbing: media spans as opaque binary + typed
metadata, decode/feature steps as Arrow-batched mapInPandas.

The interleaved documents carry media spans (kind='media',
media_ref=URI).  A 100TB pipeline treats payloads as opaque
``binary`` columns with a typed metadata struct; decode / resize /
frame-sample are per-batch Pandas functions.

Decode is REAL for image payloads (round 4): PIL when importable,
else the stdlib-only codec in ``functions/media_codec.py`` (header
probe for PNG/GIF/BMP/JPEG; full pixel decode + nearest resample +
re-encode for baseline PNG via ``zlib``).  Non-image payloads — the
synthetic ref-bytes this repo's testdata carries — keep the
md5-derived deterministic stub of rounds 1-3, byte-identical, which
is the path the DuckDB oracle twins; the real path is pytest-gated on
generated PNG fixtures (tests/test_multimodal.py).
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


def _real_feature(decoded, feature_dim: int) -> list[float]:
    """Deterministic pixel-statistics feature from a decoded image:
    per-channel means and stds (grayscale replicated across the RGB
    slots), aspect ratio, and alpha coverage — the classic cheap
    embedding a dedup/quality pipeline derives before a learned one
    exists.  All components are in [0, 1]."""
    import numpy as np

    w, h, ch, px = decoded
    a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(-1, ch)
    has_alpha = ch in (2, 4)
    color = a[:, :-1] if has_alpha else a
    if color.shape[1] == 1:
        color = np.repeat(color, 3, axis=1)
    means = color.mean(axis=0) / 255.0
    stds = color.std(axis=0) / 255.0
    alpha = float(a[:, -1].mean()) / 255.0 if has_alpha else 1.0
    vec = [
        float(means[0]), float(means[1]), float(means[2]),
        float(stds[0]), float(stds[1]), float(stds[2]),
        float(w) / float(w + h),
        alpha,
    ]
    return (vec + [0.0] * feature_dim)[:feature_dim]


def extract_media_features(
    media: DataFrame, feature_dim: int = 8, batch_hint: int = 1024
) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    Decode is REAL where the payload is a decodable image: PIL when
    importable, else the stdlib PNG decoder
    (functions/media_codec.try_decode) — the feature is then actual
    pixel statistics (_real_feature).  Payloads that are not decodable
    images (this repo's synthetic ref-bytes payloads, or formats with
    header-only support) keep the md5-derived STUB feature, byte-
    identical to rounds 1-3, which is the path the DuckDB oracle
    twins — so the hash gate still holds while real images get real
    features (pytest-gated on generated PNG fixtures).
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from ..functions.media_codec import try_decode

        for pdf in batches:
            feats = []
            ok = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    ok.append(False)
                    continue
                decoded = try_decode(bytes(payload))
                if decoded is not None:
                    feats.append(_real_feature(decoded, feature_dim))
                    ok.append(True)
                    continue
                # STUB fallback: deterministic pseudo-feature from the
                # bytes (non-image payloads / formats without a pixel
                # decoder here).
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
    """Aspect-preserving resize over the media table (mapInPandas —
    the Arrow batch is where a production deployment calls
    PIL/libvips).

    Three tiers, chosen per row by what the payload actually is:
      * decodable image (PIL, or stdlib-PNG via media_codec): REAL
        source dims, REAL nearest-neighbor resample, payload replaced
        with the re-encoded PNG bytes;
      * recognizable image header without a pixel decoder here
        (JPEG/GIF/BMP when PIL is absent): REAL dims from the header,
        target arithmetic applied, payload passed through;
      * anything else (this repo's synthetic ref-bytes payloads): the
        md5-derived stub dims of rounds 1-3 — byte-identical, which is
        the path the DuckDB oracle twins.
    Rows whose payload is null pass through with null dims (decode
    failure — downstream filters on them)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from ..functions.media_codec import (
            encode_png,
            probe_image,
            resize_nearest,
            try_decode,
        )

        def target(w: int, h: int) -> tuple[int, int]:
            if max(w, h) <= max_side:
                return w, h
            # expression ORDER matters for oracle parity: w*max_side
            # (exact in double) then /longest — same double ops as the
            # SQL twin's floor(w * 256.0 / m), so the floor can't flip
            # on a last-ulp difference
            m = max(w, h)
            return max(1, int(w * max_side / m)), max(1, int(h * max_side / m))

        for pdf in batches:
            w_in, h_in, w_out, h_out, payloads = [], [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    w_in.append(None)
                    h_in.append(None)
                    w_out.append(None)
                    h_out.append(None)
                    payloads.append(None)
                    continue
                raw = bytes(payload)
                decoded = try_decode(raw)
                if decoded is not None:
                    w, h, ch, px = decoded
                    tw, th = target(w, h)
                    if (tw, th) != (w, h):
                        px = resize_nearest(w, h, ch, px, tw, th)
                    payloads.append(encode_png(tw, th, ch, bytes(px)))
                else:
                    probed = probe_image(raw)
                    if probed is not None:
                        _, w, h = probed
                    else:
                        d = hashlib.md5(raw).digest()
                        # STUB dims (non-image payload)
                        w, h = 64 + d[2] * 4, 64 + d[3] * 4
                    tw, th = target(w, h)
                    payloads.append(raw)
                w_in.append(w)
                h_in.append(h)
                w_out.append(tw)
                h_out.append(th)
            out = pdf[["doc_id", "media_ref", "media_type"]].copy()
            out["width"] = pd.array(w_in, dtype="Int64")
            out["height"] = pd.array(h_in, dtype="Int64")
            out["out_width"] = pd.array(w_out, dtype="Int64")
            out["out_height"] = pd.array(h_out, dtype="Int64")
            out["payload"] = payloads
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

    NULL payloads (a fetch that failed, a ref with no stored object)
    stay in the output as their OWN one-row family: ``content_hash``
    NULL, ``n_copies=1``, ``keep=1`` — two missing payloads are NOT
    the same content, and dropping the rows (what a bare inner join on
    the NULL hash would do) breaks the one-row-per-input contract the
    exact_duplicates family guarantees.
    """
    base = media.select(
        "doc_id", "media_ref", F.md5("payload").alias("content_hash")
    )
    hashed = base.where(F.col("content_hash").isNotNull())
    nulls = base.where(F.col("content_hash").isNull()).select(
        "doc_id",
        "media_ref",
        "content_hash",
        F.lit(1).cast("long").alias("n_copies"),
        F.lit(1).cast("int").alias("keep"),
    )
    canon = hashed.groupBy("content_hash").agg(
        F.min(F.struct("doc_id", "media_ref")).alias("_c"),
        F.count("*").cast("long").alias("n_copies"),
    )
    deduped = hashed.join(canon, "content_hash").select(
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
    return deduped.unionByName(nulls)


PHASH_SCHEMA = "media_ref string, phash long"


def media_phash(media: DataFrame) -> DataFrame:
    """64-bit perceptual hash (aHash) per media row — the image-side
    analogue of the text SimHash sketch.  Exact content dedup
    (:func:`media_dedup`) misses re-encoded / resized / slightly
    edited copies of the same picture; aHash (mean-threshold over an
    8x8 downsample of the grayscale image) maps those to sketches
    within a few bits of each other, so the text pipeline's hamming
    banding applies unchanged to images.

    Decode tiers mirror :func:`extract_media_features`:
      * decodable image (PIL or the stdlib codec): REAL aHash —
        grayscale = channel mean (alpha dropped), nearest-neighbor
        8x8 downsample, bit i (row-major) set iff pixel > mean;
      * anything else (this repo's synthetic ref-bytes payloads):
        deterministic stub = first 8 bytes of md5(payload) big-endian
        — the path the DuckDB oracle twins; identical payloads still
        collide at hamming 0, so the stub degrades to exact dedup.
    NULL payloads are dropped (nothing to hash).

    The u64 bit pattern is stored as a signed long, same convention as
    the text ``simhash`` column, so band extraction
    (shiftrightunsigned) and XOR+popcount verification reuse the same
    machinery.
    """

    def _phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from ..functions.media_codec import resize_nearest, try_decode

        for pdf in batches:
            refs: list = []
            hashes: list = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                decoded = try_decode(raw)
                if decoded is not None:
                    w, h, ch, px = decoded
                    a = np.frombuffer(bytes(px), dtype=np.uint8).reshape(
                        -1, ch
                    )
                    color = a[:, :-1] if ch in (2, 4) else a
                    gray = (
                        color.mean(axis=1).astype(np.uint8)
                        if color.shape[1] > 1
                        else color[:, 0]
                    )
                    small = np.frombuffer(
                        resize_nearest(w, h, 1, gray.tobytes(), 8, 8),
                        dtype=np.uint8,
                    ).astype(np.float64)
                    mean = small.mean()
                    v = 0
                    for i, pix in enumerate(small):
                        if pix > mean:
                            v |= 1 << i
                else:
                    v = int.from_bytes(
                        hashlib.md5(raw).digest()[:8], "big"
                    )
                if v >= 1 << 63:
                    v -= 1 << 64
                refs.append(ref)
                hashes.append(v)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "phash": pd.array(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(_phash, schema=PHASH_SCHEMA)


def media_phash_near_dups(
    media: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket_size: int | None = 1000,
    with_census: bool = False,
):
    """Perceptual near-duplicate image pairs: aHash sketches routed
    through the text pipeline's SimHash hamming-banding machinery
    (``dedup.simhash_near_duplicates`` — multi-probe band buckets with
    the census/cap/salt skew tiers, pigeonhole-lossless for
    ``max_hamming <= n_bands - 1``, native XOR+popcount verify).

    One operator family, two modalities: the banding, skew handling,
    and recall guarantee are shared code, only the sketch function
    differs.  Output: (media_ref_1, media_ref_2, hamming).

    The pigeonhole recall guarantee holds only for band buckets UNDER
    ``max_bucket_size * drop_factor``; degenerate sketches break it —
    aHash maps every flat/solid-color image to phash=0, so a corpus
    heavy in such images puts them all in one mega-bucket per band,
    which the cap tier DROPS.  Pass ``with_census=True`` to get
    ``(pairs, dropped_census)`` and surface those drops (same contract
    as `simhash_near_duplicates`); leaving it False on an unknown
    corpus silently loses exactly the most-duplicated content.
    """
    from .dedup import simhash_near_duplicates

    sk = media_phash(media).select(
        F.col("media_ref").alias("doc_id"), F.col("phash").alias("simhash")
    )
    res = simhash_near_duplicates(
        sk,
        max_hamming=max_hamming,
        n_bands=n_bands,
        max_bucket_size=max_bucket_size,
        with_census=with_census,
    )
    pairs, census = res if with_census else (res, None)
    out = pairs.select(
        F.col("doc_id_1").alias("media_ref_1"),
        F.col("doc_id_2").alias("media_ref_2"),
        "hamming",
    )
    return (out, census) if with_census else out
