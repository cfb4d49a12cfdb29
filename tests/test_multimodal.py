"""Multimodal plumbing: typed media table, Arrow-batched decode stub,
resize arithmetic, frame-sampling fan-out.  The decode itself is a
documented stub (no codec libs in this container); these tests pin the
REAL parts — schemas, batch shapes, per-type routing, and the
deterministic arithmetic the DuckDB oracle cross-checks at the driver
level."""

import hashlib

from pyspark.sql import functions as F

from record_linkage_ldu_spark.operators.multimodal import (
    extract_media_features,
    media_table,
    resize_media,
    sample_frames,
)


def _media_df(spark, refs):
    """A media table with synthetic refs (payload = utf8(ref), the
    same stand-in media_table uses)."""
    docs = spark.createDataFrame(
        [
            (
                f"d{i}",
                [("media", None, ref, 0)],
            )
            for i, ref in enumerate(refs)
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    return media_table(docs)


def test_media_table_types_and_payload(spark):
    m = _media_df(
        spark, ["img://a", "aud://b", "vid://c", "weird://d"]
    ).collect()
    types = {r["media_ref"]: r["media_type"] for r in m}
    assert types == {
        "img://a": "image",
        "aud://b": "audio",
        "vid://c": "video",
        "weird://d": "unknown",
    }
    assert all(bytes(r["payload"]).decode() == r["media_ref"] for r in m)


def test_resize_scales_longer_side_and_passes_small(spark):
    out = {
        r["media_ref"]: r
        for r in resize_media(
            _media_df(spark, [f"img://x{i}" for i in range(50)]),
            max_side=256,
        ).collect()
    }
    assert len(out) == 50
    for ref, r in out.items():
        d = hashlib.md5(ref.encode()).digest()
        w, h = 64 + d[2] * 4, 64 + d[3] * 4
        assert (r["width"], r["height"]) == (w, h)
        if max(w, h) <= 256:
            assert (r["out_width"], r["out_height"]) == (w, h)
        else:
            m = max(w, h)
            assert r["out_width"] == max(1, int(w * 256 / m))
            assert r["out_height"] == max(1, int(h * 256 / m))
            assert max(r["out_width"], r["out_height"]) == 256


def test_frame_sample_video_fanout_image_single(spark):
    frames = sample_frames(
        _media_df(spark, ["img://still", "vid://clip", "aud://talk"]),
        every_ms=1000,
    ).collect()
    by_ref = {}
    for r in frames:
        by_ref.setdefault(r["media_ref"], []).append(r)

    # image: exactly one frame at ts 0
    assert len(by_ref["img://still"]) == 1
    assert by_ref["img://still"][0]["ts_ms"] == 0
    assert by_ref["img://still"][0]["frame_ref"] == "img://still#0"

    # video/audio: md5-derived duration, one frame per second,
    # contiguous frame indexes aligned with timestamps
    for ref in ("vid://clip", "aud://talk"):
        d = hashlib.md5(ref.encode()).digest()
        duration = 1000 + (((d[0] << 8) | d[1]) % 29_000)
        rows = sorted(by_ref[ref], key=lambda r: r["frame_idx"])
        assert len(rows) == len(range(0, duration, 1000)) and len(rows) >= 2
        for i, r in enumerate(rows):
            assert r["frame_idx"] == i and r["ts_ms"] == i * 1000
            assert bytes(r["frame_payload"]).decode() == f"{ref}#{i}"


def test_features_deterministic_and_flagged(spark):
    feats = extract_media_features(
        _media_df(spark, ["img://a", "img://a", "img://b"])
    ).collect()
    by_ref = {}
    for r in feats:
        assert r["decode_ok"]
        by_ref.setdefault(r["media_ref"], set()).add(
            tuple(round(x, 6) for x in r["feature"])
        )
    assert len(by_ref["img://a"]) == 1  # identical payload -> identical feature
    assert by_ref["img://a"] != by_ref["img://b"]


def test_media_dedup_collapses_equal_payloads(spark):
    from record_linkage_ldu_spark.operators.multimodal import media_dedup

    rows = [
        ("a1", "img://a1", b"SAME"),
        ("b1", "img://b1", b"SAME"),
        ("c9", "img://c9", b"SAME"),
        ("d1", "img://d1", b"other"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, media_ref string, payload binary"
    )
    out = media_dedup(df).toPandas().set_index("doc_id")
    # least (doc_id, media_ref) holder keeps; others dropped
    assert out.loc["a1", "keep"] == 1 and out.loc["a1", "n_copies"] == 3
    assert out.loc["b1", "keep"] == 0 and out.loc["c9", "keep"] == 0
    assert out.loc["d1", "keep"] == 1 and out.loc["d1", "n_copies"] == 1
    # hashes partition the set: equal payloads share one hash
    assert out.loc["a1", "content_hash"] == out.loc["b1", "content_hash"]
    assert out.loc["a1", "content_hash"] != out.loc["d1", "content_hash"]
