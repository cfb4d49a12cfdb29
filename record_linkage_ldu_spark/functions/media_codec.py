"""Stdlib-only image codec for the multimodal operators.

Round-3 verdict item: the media decode was a pure md5 stub because "no
image libs are in this container" — but image HEADERS need no library
at all, and PNG needs only ``zlib`` (stdlib) for full pixel access.
This module gives the multimodal kernels a real decode path:

  * ``probe_image``   — (format, width, height) from the header bytes
                        of PNG / GIF / BMP / JPEG.
  * ``decode_png``    — full pixel decode of baseline PNGs (bit depth
                        8, color types 0/2/4/6, non-interlaced): zlib
                        inflate + per-scanline unfilter (filters 0-4).
  * ``encode_png``    — minimal valid PNG writer (filter 0 scanlines).
  * ``decode_bmp``    — full pixel decode of uncompressed 24/32-bit
                        BMPs (bottom-up and top-down, BGR(A)→RGB(A)).
  * ``decode_gif``    — full pixel decode of the first frame of a
                        non-interlaced GIF (LZW + color-table map).
  * ``resize_nearest``— nearest-neighbor resample.
  * ``try_decode``    — PIL when importable (covers every format),
                        else the pure-Python PNG/BMP/GIF paths; None
                        when the bytes are not a decodable image.

Everything is deterministic, so the multimodal operators stay
oracle-checkable: payloads that are NOT real images keep the md5 stub
behavior (the DuckDB twins cover that path), while real image bytes
get real dimensions/pixels (pytest-gated on generated fixtures).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def probe_image(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from header bytes, or None if the bytes
    are not a recognized image.  Reads only the header — O(1) except
    JPEG's segment walk (bounded by the header region)."""
    if data is None or len(data) < 10:
        return None
    if data[:8] == PNG_SIG and len(data) >= 24 and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return ("png", w, h) if w > 0 and h > 0 else None
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return ("gif", w, h) if w > 0 and h > 0 else None
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return ("bmp", abs(w), abs(h)) if w != 0 and h != 0 else None
    if data[:2] == b"\xff\xd8":
        return _probe_jpeg(data)
    return None


def _probe_jpeg(data: bytes) -> tuple[str, int, int] | None:
    """Walk JPEG segments to the first SOFn frame header."""
    i = 2
    n = len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        # SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return ("jpeg", w, h) if w > 0 and h > 0 else None
        i += 2 + seg_len
    return None


def decode_png(
    data: bytes,
) -> tuple[int, int, int, bytearray]:
    """(width, height, channels, pixels) for a baseline PNG.

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+A),
    6 (RGBA), non-interlaced — what ``encode_png`` and typical
    generated fixtures produce.  Raises ValueError on anything else
    (palette, 16-bit, interlaced), which callers treat as
    "dims-only decode" via ``probe_image``.
    """
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    i = 8
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        chunk = data[i + 8 : i + 8 + length]
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        i += 12 + length  # length + type + data + crc
    if w is None or not idat:
        raise ValueError("truncated PNG")
    if bit_depth != 8 or color_type not in (0, 2, 4, 6) or interlace:
        raise ValueError(
            f"unsupported PNG (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("short PNG pixel data")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[x] = (line[x] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, out


def encode_png(w: int, h: int, channels: int, pixels: bytes) -> bytes:
    """Minimal valid PNG (bit depth 8, filter 0 scanlines)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    w: int, h: int, channels: int, pixels: bytes, tw: int, th: int
) -> bytearray:
    """Nearest-neighbor resample (floor source mapping — the
    deterministic choice, no rounding-mode ambiguity)."""
    out = bytearray(tw * th * channels)
    for ty in range(th):
        sy = ty * h // th
        src_row = sy * w * channels
        dst_row = ty * tw * channels
        for tx in range(tw):
            sx = tx * w // tw
            s = src_row + sx * channels
            d = dst_row + tx * channels
            out[d : d + channels] = pixels[s : s + channels]
    return out


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Full pixel decode of uncompressed (BI_RGB) 24/32-bit BMPs —
    rows returned top-down, BGR(A) converted to RGB(A) so the output
    convention matches :func:`decode_png`."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    pix_off = struct.unpack("<I", data[10:14])[0]
    w, h_raw = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    comp = struct.unpack("<I", data[30:34])[0]
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h_raw == 0:
        raise ValueError("unsupported BMP variant")
    h = abs(h_raw)
    top_down = h_raw < 0
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    if len(data) < pix_off + stride * h:
        raise ValueError("truncated BMP")
    out = bytearray(w * h * ch)
    for y in range(h):
        sy = y if top_down else h - 1 - y
        row = pix_off + sy * stride
        d = y * w * ch
        for x in range(w):
            s = row + x * ch
            out[d] = data[s + 2]
            out[d + 1] = data[s + 1]
            out[d + 2] = data[s]
            if ch == 4:
                out[d + 3] = data[s + 3]
            d += ch
    return w, h, ch, bytes(out)


def try_decode(data: bytes) -> tuple[int, int, int, bytes] | None:
    """Best-effort full pixel decode: PIL when available (any format),
    else the pure-Python PNG / BMP paths.  None when the bytes are not
    a decodable image (callers fall back to probe_image for dims, then
    to the md5 stub)."""
    if data is None:
        return None
    try:
        from PIL import Image  # optional dependency
        import io

        with Image.open(io.BytesIO(bytes(data))) as im:
            im = im.convert("RGB") if im.mode not in ("L", "RGB", "RGBA", "LA") else im
            px = im.tobytes()
            return im.width, im.height, len(im.getbands()), px
    except ImportError:
        pass
    except Exception:
        return None
    from .jpeg_codec import decode_jpeg

    for dec in (decode_png, decode_bmp, decode_gif, decode_jpeg):
        try:
            return tuple(dec(bytes(data)))  # type: ignore[return-value]
        except Exception:
            continue
    return None


def _lzw_decode(min_code_size: int, data: bytes, npixels: int) -> bytes:
    """GIF-variant LZW (LSB-first bit packing, CLEAR/END codes,
    code width grows to 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < npixels:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW stream")
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        prev = entry
    return bytes(out[:npixels])


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Full pixel decode of the FIRST frame of a non-interlaced GIF
    (87a/89a, global or local color table) — RGB out, same convention
    as the PNG/BMP decoders.  Transparency is ignored (features/resize
    consume RGB statistics); interlaced frames raise and fall back to
    the header-dims path."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 7) + 1)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label then sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            iw, ih = struct.unpack("<HH", data[pos + 5 : pos + 9])
            ipacked = data[pos + 9]
            pos += 10
            lct = None
            if ipacked & 0x80:
                n = 2 ** ((ipacked & 7) + 1)
                lct = data[pos : pos + 3 * n]
                pos += 3 * n
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            table = lct or gct
            if table is None or iw == 0 or ih == 0:
                raise ValueError("missing color table")
            idx = _lzw_decode(mcs, bytes(lzw), iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("truncated GIF pixel data")
            out = bytearray(iw * ih * 3)
            for i, ci in enumerate(idx):
                out[3 * i : 3 * i + 3] = table[3 * ci : 3 * ci + 3]
            return iw, ih, 3, bytes(out)
        elif b == 0x3B:
            break
        else:
            raise ValueError("corrupt GIF block stream")
    raise ValueError("no image data")
