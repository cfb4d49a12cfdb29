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


def test_media_dedup_null_payload_passes_through(spark):
    """NULL payloads must stay in the output as their own one-row
    family (keep=1, n_copies=1, NULL hash) — md5(NULL) is NULL and a
    bare inner join on the hash would silently drop the rows."""
    from record_linkage_ldu_spark.operators.multimodal import media_dedup

    rows = [
        ("a1", "img://a1", b"SAME"),
        ("b1", "img://b1", b"SAME"),
        ("n1", "img://n1", None),
        ("n2", "img://n2", None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, media_ref string, payload binary"
    )
    out = media_dedup(df).toPandas().set_index("doc_id")
    assert len(out) == 4  # one row per input, nulls included
    for n in ("n1", "n2"):
        assert out.loc[n, "keep"] == 1
        assert out.loc[n, "n_copies"] == 1
        assert out.loc[n, "content_hash"] is None or (
            out.loc[n, "content_hash"] != out.loc[n, "content_hash"]
        )
    assert out.loc["a1", "keep"] == 1 and out.loc["b1", "keep"] == 0


# ---------------------------------------------------------------------
# round 4: REAL decode path (stdlib PNG codec; PIL when importable)
# ---------------------------------------------------------------------


def _make_png(w, h, ch=3):
    """Deterministic test image: pixel (x, y) channel c =
    (x * 7 + y * 13 + c * 29) % 256."""
    from record_linkage_ldu_spark.functions.media_codec import encode_png

    px = bytearray(w * h * ch)
    i = 0
    for y in range(h):
        for x in range(w):
            for c in range(ch):
                px[i] = (x * 7 + y * 13 + c * 29) % 256
                i += 1
    return encode_png(w, h, ch, bytes(px)), bytes(px)


def test_png_codec_roundtrip_and_probe():
    from record_linkage_ldu_spark.functions.media_codec import (
        decode_png,
        probe_image,
    )

    data, px = _make_png(20, 11)
    assert probe_image(data) == ("png", 20, 11)
    w, h, ch, out = decode_png(data)
    assert (w, h, ch) == (20, 11, 3)
    assert bytes(out) == px
    # non-image bytes probe as None
    assert probe_image(b"img://a0000000011") is None
    # GIF / BMP / JPEG headers probe dims without a pixel decoder
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 33, 44) + b"\x00" * 20
    assert probe_image(gif) == ("gif", 33, 44)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 55, 66) + b"\x00" * 20
    assert probe_image(bmp) == ("bmp", 55, 66)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"      # APP0
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 77, 99)                       # h=77, w=99
        + b"\x03" + b"\x00" * 20
    )
    assert probe_image(jpeg) == ("jpeg", 99, 77)


def test_media_features_real_pixels(spark):
    """A real PNG payload must yield pixel-statistics features (channel
    means/stds), not the md5 stub."""
    data, px = _make_png(16, 8)
    df = spark.createDataFrame(
        [("d0", "img://real", "image", bytearray(data), None, None, None)],
        "doc_id string, media_ref string, media_type string, "
        "payload binary, width int, height int, duration_ms int",
    )
    row = extract_media_features(df).collect()[0]
    assert row["decode_ok"]
    import numpy as np

    a = np.frombuffer(px, dtype=np.uint8).reshape(-1, 3)
    want_means = a.mean(axis=0) / 255.0
    got = row["feature"]
    for i in range(3):
        assert abs(got[i] - want_means[i]) < 1e-6
    # array<float> carries float32: compare with tolerance
    assert abs(got[6] - 16.0 / 24.0) < 1e-6  # aspect w/(w+h)


def test_media_resize_real_pixels_roundtrip(spark):
    """A big real PNG is actually resampled: output payload is a valid
    PNG at the target dims whose pixels equal a reference
    nearest-neighbor resample."""
    from record_linkage_ldu_spark.functions.media_codec import (
        decode_png,
        resize_nearest,
    )

    data, px = _make_png(512, 256)
    df = spark.createDataFrame(
        [("d0", "img://big", "image", bytearray(data), None, None, None)],
        "doc_id string, media_ref string, media_type string, "
        "payload binary, width int, height int, duration_ms int",
    )
    row = resize_media(df, max_side=256).collect()[0]
    assert (row["width"], row["height"]) == (512, 256)
    assert (row["out_width"], row["out_height"]) == (256, 128)
    w, h, ch, out_px = decode_png(bytes(row["payload"]))
    assert (w, h, ch) == (256, 128, 3)
    assert bytes(out_px) == bytes(resize_nearest(512, 256, 3, px, 256, 128))


def test_media_resize_header_only_dims(spark):
    """A GIF payload (no pixel decoder without PIL): REAL header dims,
    target arithmetic applied, payload passed through unchanged."""
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 640, 120) + b"\x00" * 30
    df = spark.createDataFrame(
        [("d0", "img://gif", "image", bytearray(gif), None, None, None)],
        "doc_id string, media_ref string, media_type string, "
        "payload binary, width int, height int, duration_ms int",
    )
    row = resize_media(df, max_side=256).collect()[0]
    assert (row["width"], row["height"]) == (640, 120)
    assert (row["out_width"], row["out_height"]) == (256, 48)
    assert bytes(row["payload"]) == gif


def test_media_stub_path_unchanged(spark):
    """Non-image payloads keep the md5 stub behavior byte-identically
    (the DuckDB oracle twins this path)."""
    import hashlib

    payload = b"img://a0000000042"
    d = hashlib.md5(payload).digest()
    df = spark.createDataFrame(
        [("d0", "img://a0000000042", "image", bytearray(payload),
          None, None, None)],
        "doc_id string, media_ref string, media_type string, "
        "payload binary, width int, height int, duration_ms int",
    )
    row = resize_media(df).collect()[0]
    assert (row["width"], row["height"]) == (64 + d[2] * 4, 64 + d[3] * 4)
    frow = extract_media_features(df).collect()[0]
    assert abs(frow["feature"][0] - float(d[0]) / 255.0) < 1e-6


def test_media_content_blocking_links_shared_payloads(spark):
    """Media-content blocking tier (driver query media_block_pairs):
    docs whose media payloads are identical — here, refs with the same
    digit core, the synth stand-in for the same uploaded image — pair
    up; distinct payloads and media-less docs never do."""
    from record_linkage_ldu_spark.operators.blocking import candidate_pairs

    media = _media_df(
        spark,
        ["img://a042", "img://b042", "img://c042", "img://a777"],
    )
    keys = media.select(
        "doc_id",
        F.concat(
            F.lit("mc:"),
            F.md5(F.encode(F.regexp_replace("media_ref", "[^0-9]", ""), "utf-8")),
        ).alias("block_key"),
    )
    pairs = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in candidate_pairs(keys, dedup=False).collect()
    }
    assert pairs == {("d0", "d1"), ("d0", "d2"), ("d1", "d2")}


def _make_bmp(w, h, top_down=False, bpp=24):
    """Hand-built BI_RGB BMP with deterministic pixels; returns
    (bmp_bytes, rgb_pixels_top_down)."""
    import struct

    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    rows = []
    rgb = bytearray()
    for y in range(h):
        row = bytearray()
        for x in range(w):
            r, g, b = (x * 7 + y) % 256, (y * 11) % 256, (x * 3) % 256
            rgb += bytes((r, g, b) if ch == 3 else (r, g, b, (x + y) % 256))
            row += bytes((b, g, r) if ch == 3 else (b, g, r, (x + y) % 256))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    body = b"".join(rows if top_down else rows[::-1])
    h_field = -h if top_down else h
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h_field, 1, bpp, 0,
                      len(body), 2835, 2835, 0, 0)
    )
    return header + body, bytes(rgb)


def test_decode_bmp_bottom_up_top_down_and_32bpp():
    from record_linkage_ldu_spark.functions.media_codec import (
        decode_bmp,
        try_decode,
    )

    for top_down in (False, True):
        data, rgb = _make_bmp(5, 3, top_down=top_down)
        assert decode_bmp(data) == (5, 3, 3, rgb)
        assert try_decode(data) == (5, 3, 3, rgb)
    data32, rgba = _make_bmp(4, 2, bpp=32)
    assert decode_bmp(data32) == (4, 2, 4, rgba)


def test_media_features_real_bmp_pixels(spark):
    """A real BMP payload now yields pixel-statistics features through
    the same kernel as PNG (try_decode's BMP path)."""
    data, rgb = _make_bmp(8, 4)
    df = spark.createDataFrame(
        [("d0", "img://real.bmp", "image", bytearray(data), None, None, None)],
        "doc_id string, media_ref string, media_type string, "
        "payload binary, width int, height int, duration_ms int",
    )
    row = extract_media_features(df).collect()[0]
    assert row["decode_ok"]
    import numpy as np

    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    want_means = a.mean(axis=0) / 255.0
    for i in range(3):
        assert abs(row["feature"][i] - want_means[i]) < 1e-6


def _make_gif(w, h, palette, indexes):
    """Minimal valid GIF89a writer for fixtures: global color table,
    one image block, LZW stream that emits CLEAR before every pixel
    code (table never grows, so codes stay min_code_size+1 bits —
    a legal, trivially-correct encoder)."""
    import struct

    n = max(2, (len(palette) - 1).bit_length())  # GCT size exponent
    gct_entries = 1 << n
    mcs = max(2, n)
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes = []
    for px in indexes:
        codes += [clear, px]
    codes.append(end)
    code_size = mcs + 1
    val = nbits = 0
    packed = bytearray()
    for c in codes:
        val |= c << nbits
        nbits += code_size
        while nbits >= 8:
            packed.append(val & 0xFF)
            val >>= 8
            nbits -= 8
    if nbits:
        packed.append(val & 0xFF)
    gct = bytearray()
    for rgb in palette:
        gct += bytes(rgb)
    gct += b"\x00" * (3 * gct_entries - len(gct))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (n - 1), 0, 0])  # GCT flag + size
    out += gct
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([mcs])
    i = 0
    while i < len(packed):  # sub-blocks of <=255 bytes
        blk = packed[i : i + 255]
        out += bytes([len(blk)]) + blk
        i += 255
    out += b"\x00\x3b"
    return bytes(out)


def test_decode_gif_first_frame_pixels():
    from record_linkage_ldu_spark.functions.media_codec import (
        decode_gif,
        probe_image,
        try_decode,
    )

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0, 0, 1, 0, 2]  # 4x3
    data = _make_gif(4, 3, palette, idx)
    assert probe_image(data) == ("gif", 4, 3)
    w, h, ch, px = decode_gif(data)
    assert (w, h, ch) == (4, 3, 3)
    want = b"".join(bytes(palette[i]) for i in idx)
    assert px == want
    assert try_decode(data) == (4, 3, 3, want)


def test_media_features_real_gif_pixels(spark):
    palette = [(10, 20, 30), (200, 100, 50)]
    idx = [0, 1] * 8  # 4x4
    data = _make_gif(4, 4, palette, idx)
    df = spark.createDataFrame(
        [("d0", "img://real.gif", "image", bytearray(data), None, None, None)],
        "doc_id string, media_ref string, media_type string, "
        "payload binary, width int, height int, duration_ms int",
    )
    row = extract_media_features(df).collect()[0]
    assert row["decode_ok"]
    import numpy as np

    rgb = b"".join(bytes(palette[i]) for i in idx)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
    want_means = a.mean(axis=0) / 255.0
    for i in range(3):
        assert abs(row["feature"][i] - want_means[i]) < 1e-6


def test_lzw_table_growth_and_code_widening():
    """A hand-packed LZW stream that actually grows the table: after
    CLEAR(4) 0 1, code 6 refers to the just-added [0,1] entry, and the
    table reaching 8 entries widens codes to 4 bits — END(5) must be
    read at the new width."""
    from record_linkage_ldu_spark.functions.media_codec import _lzw_decode

    codes_and_sizes = [(4, 3), (0, 3), (1, 3), (6, 3), (5, 4)]
    val = nbits = 0
    packed = bytearray()
    for c, size in codes_and_sizes:
        val |= c << nbits
        nbits += size
        while nbits >= 8:
            packed.append(val & 0xFF)
            val >>= 8
            nbits -= 8
    if nbits:
        packed.append(val & 0xFF)
    assert _lzw_decode(2, bytes(packed), 4) == bytes([0, 1, 0, 1])


def test_media_phash_real_and_stub(spark):
    """aHash on real PNG pixels: identical payloads hash identically
    (hamming 0 pair), a strongly different image (inverted gradient)
    is far in hamming space and pairs with nothing; a non-decodable
    payload takes the md5-stub sketch bit-for-bit."""
    import hashlib

    from record_linkage_ldu_spark.functions.media_codec import encode_png
    from record_linkage_ldu_spark.operators.multimodal import (
        media_phash,
        media_phash_near_dups,
    )

    w = h = 32
    grad = bytes((x * 255 // (w - 1)) for _ in range(h) for x in range(w))
    inv = bytes(255 - b for b in grad)
    png_a = encode_png(w, h, 1, grad)
    png_c = encode_png(w, h, 1, inv)
    stub_payload = b"aud://123"

    rows = [
        ("d1", "r_a1", "image", png_a, None, None, None),
        ("d2", "r_a2", "image", png_a, None, None, None),
        ("d3", "r_c", "image", png_c, None, None, None),
        ("d4", "r_s", "audio", stub_payload, None, None, None),
        ("d5", "r_null", "image", None, None, None, None),
    ]
    from record_linkage_ldu_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    hashes = {r["media_ref"]: r["phash"] for r in media_phash(media).collect()}
    assert "r_null" not in hashes            # null payload dropped
    assert hashes["r_a1"] == hashes["r_a2"]  # identical pixels
    ham_ac = bin((hashes["r_a1"] ^ hashes["r_c"]) & ((1 << 64) - 1)).count("1")
    assert ham_ac > 3                        # inverted image is far
    v = int.from_bytes(hashlib.md5(stub_payload).digest()[:8], "big")
    if v >= 1 << 63:
        v -= 1 << 64
    assert hashes["r_s"] == v                # md5 stub, bit-for-bit

    pairs = {
        (r["media_ref_1"], r["media_ref_2"]): r["hamming"]
        for r in media_phash_near_dups(media).collect()
    }
    assert pairs == {("r_a1", "r_a2"): 0}


def test_jpeg_decode_and_reencoded_copy_caught_by_phash(spark):
    """VERDICT r4 item 4: baseline JPEG decodes to real pixels via the
    stdlib codec (no PIL in this environment), and a RE-ENCODED JPEG
    copy — same picture, different bytes, the case md5 content hashing
    can never catch — lands at hamming ~0 from the original and is
    caught by media_phash_near_dups.  A non-image payload still takes
    the md5-stub sketch bit-for-bit (the DuckDB-twin path)."""
    import hashlib

    from record_linkage_ldu_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )
    from record_linkage_ldu_spark.functions.media_codec import try_decode
    from record_linkage_ldu_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_phash,
        media_phash_near_dups,
    )

    w = h = 32
    # bimodal 4x4-cell checkerboard (cells aligned with aHash's 8x8
    # grid): every cell sits far from the global mean, so the sketch
    # is stable under lossy re-encode — a diagonal gradient would put
    # half the cells AT the mean, where aHash is deliberately
    # boundary-sensitive
    px = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (
            (40, 60, 50) if (x // 8 + y // 8) % 2 == 0 else (210, 190, 200)
        )
    )
    jpg = encode_jpeg(w, h, 3, px, quality=90)
    # re-encode: decode then encode at a different quality and
    # subsampling -> different bytes, same picture
    dw, dh, dch, dpx = decode_jpeg(jpg)
    assert (dw, dh, dch) == (w, h, 3)
    jpg2 = encode_jpeg(dw, dh, dch, dpx, quality=55, subsampling="420")
    assert jpg2 != jpg
    assert hashlib.md5(jpg2).digest() != hashlib.md5(jpg).digest()
    # the codec is wired into the generic decode path
    got = try_decode(jpg)
    assert got is not None and got[:3] == (w, h, 3)
    # decode produced REAL pixels: mean abs error from the source is
    # small (lossy, not stubbed)
    mae = sum(abs(a - b) for a, b in zip(px, dpx)) / len(px)
    assert mae < 8.0, mae
    inv = bytes(255 - b for b in px)
    jpg_far = encode_jpeg(w, h, 3, inv, quality=90)
    stub_payload = b"aud://999"
    rows = [
        ("d1", "r_orig", "image", jpg, None, None, None),
        ("d2", "r_reenc", "image", jpg2, None, None, None),
        ("d3", "r_far", "image", jpg_far, None, None, None),
        ("d4", "r_stub", "audio", stub_payload, None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r["media_ref_1"], r["media_ref_2"]): r["hamming"]
        for r in media_phash_near_dups(media).collect()
    }
    assert ("r_orig", "r_reenc") in pairs, pairs
    assert all("r_far" not in p and "r_stub" not in p for p in pairs)
    hashes = {
        r["media_ref"]: r["phash"] for r in media_phash(media).collect()
    }
    v = int.from_bytes(hashlib.md5(stub_payload).digest()[:8], "big")
    if v >= 1 << 63:
        v -= 1 << 64
    assert hashes["r_stub"] == v  # md5 stub unchanged, bit-for-bit


def test_jpeg_codec_roundtrip_matrix(spark):
    """Codec conformance matrix: every encoder subsampling (4:4:4,
    4:2:2, 4:2:0) x restart interval (off, 1, 3 MCUs) roundtrips
    above 30 dB PSNR on a noisy gradient with non-multiple-of-8
    dimensions.  The restart rows pin the decoder's DRI/RSTn path —
    a real camera-JPEG feature — including the byte-aligned-marker
    consumption bug this test originally caught (missed RSTn => every
    later bit reads 0 => the image flattens at ~15 dB)."""
    import math
    import random

    from record_linkage_ldu_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = random.Random(5)
    w, h = 36, 28
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(
                [
                    min(255, 4 * x + rng.randint(0, 10)),
                    min(255, 5 * y + rng.randint(0, 10)),
                    130,
                ]
            )
    for sub in ("444", "422", "420"):
        for ri in (0, 1, 3):
            data = encode_jpeg(
                w, h, 3, bytes(px), quality=85, subsampling=sub,
                restart_interval=ri,
            )
            if ri:
                assert b"\xff\xdd" in data  # DRI present
            dw, dh, dch, out = decode_jpeg(data)
            assert (dw, dh, dch) == (w, h, 3)
            mse = sum((a - b) ** 2 for a, b in zip(px, out)) / len(px)
            psnr = 10 * math.log10(255 * 255 / mse)
            assert psnr > 30, (sub, ri, psnr)


def test_jpeg_roundtrip_property(spark):
    """Property sweep: random small images (odd dims, every channel
    mode, every subsampling, restart on/off) encode to a valid stream
    and decode to the exact input dimensions at sane fidelity."""
    import math
    import random

    from record_linkage_ldu_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = random.Random(11)
    for trial in range(8):
        w = rng.randint(5, 40)
        h = rng.randint(5, 40)
        ch = rng.choice([1, 3])
        sub = rng.choice(["444", "422", "420"]) if ch == 3 else "444"
        ri = rng.choice([0, 0, 1, 2])
        base = [rng.randint(0, 3) for _ in range(3)]
        px = bytes(
            min(255, base[c] * 40 + ((x * 5 + y * 3) % 128)
                + rng.randint(0, 8))
            for y in range(h)
            for x in range(w)
            for c in range(ch)
        )
        data = encode_jpeg(
            w, h, ch, px, quality=rng.randint(70, 95),
            subsampling=sub, restart_interval=ri,
        )
        dw, dh, dch, out = decode_jpeg(data)
        assert (dw, dh, dch) == (w, h, ch), (trial, w, h, ch, sub, ri)
        mse = sum((a - b) ** 2 for a, b in zip(px, out)) / len(px)
        psnr = 10 * math.log10(255 * 255 / max(mse, 1e-9))
        assert psnr > 26, (trial, w, h, ch, sub, ri, psnr)
