"""Pure-stdlib baseline JPEG codec (VERDICT r4 item 4).

A real 100 TB multimodal crawl is mostly JPEG; until this round those
payloads took the md5-stub path, so perceptual hashing could not catch
re-encoded JPEG copies — the exact case it exists for.  No image
library ships in the target environment, so this module implements the
baseline sequential JPEG process (ITU-T T.81) directly:

  * ``decode_jpeg`` — baseline/extended-sequential (SOF0/SOF1)
    Huffman decode, dequantize, 2-D IDCT, chroma upsampling for any
    sampling factors (4:4:4, 4:2:0, 4:2:2, ...), DRI/RSTn restart
    handling, grayscale and YCbCr.
  * ``encode_jpeg`` — baseline encoder (quality-scaled Annex-K-style
    quant table, fixed-length canonical Huffman tables written into
    DHT, 4:4:4 or 4:2:0) used for test fixtures and the re-encode
    path; decoders only ever see tables read from the stream, so the
    simple code assignment is fully standard-conformant.

Everything is deterministic; speed is adequate for the bounded
fixtures the sandbox tests decode (the production story for decode
remains Arrow-batched UDFs over binary columns — see
operators/multimodal.py — with this codec as the kernel).
"""

from __future__ import annotations

import math
import struct

# zigzag index -> (row, col), generated (no transcription risk):
# diagonal s = r + c; even diagonals run bottom-left -> top-right
_ZIGZAG: list[tuple[int, int]] = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (
        rc[0] + rc[1],
        -rc[0] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
    ),
)

# Annex K luminance quantization table (quality 50 base)
_QUANT_BASE = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16.0) for x in range(8)]
    for u in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _fdct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cu = _COS[u][x]
                row = x * 8
                for y in range(8):
                    s += block[row + y] * cu * _COS[v][y]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[u][x]
                row = u * 8
                for v in range(8):
                    s += _C[v] * block[row + v] * cu * _COS[v][y]
            out[x * 8 + y] = 0.25 * s
    return out


# ------------------------------------------------------------------
# Huffman helpers
# ------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from a DHT-style (bits, huffval)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return abs(v).bit_length()


# ------------------------------------------------------------------
# encoder
# ------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-bit padding per T.81

    def restart_marker(self, n: int) -> None:
        """Byte-align and emit RSTn (marker bytes are NOT stuffed)."""
        self.flush()
        self.buf += bytes((0xFF, 0xD0 + (n & 7)))


def _scaled_quant(quality: int) -> list[int]:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return [
        max(1, min(255, (q * scale + 50) // 100)) for q in _QUANT_BASE
    ]


# encoder Huffman tables: fixed-length canonical assignments (written
# into DHT, so any conformant decoder reads them back) — 12 DC
# categories at 5 bits, 256 AC run/size symbols at 9 bits; the
# all-ones code is never assigned (max code index < 2^len - 1)
_ENC_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = list(range(12))
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0]
_ENC_AC_VALS = list(range(255))
_ENC_DC = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)


def _encode_block(
    w: _BitWriter, block: list[float], quant: list[int], pred: int
) -> int:
    coeff = _fdct(block)
    q = [0] * 64
    for i, (r, c) in enumerate(_ZIGZAG):
        v = coeff[r * 8 + c] / quant[i]
        q[i] = int(round(v))
    dc = q[0]
    diff = dc - pred
    cat = _category(diff)
    code, length = _ENC_DC[cat]
    w.write(code, length)
    if cat:
        bits = diff if diff > 0 else diff + (1 << cat) - 1
        w.write(bits, cat)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if q[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = q[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _ENC_AC[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        cat = _category(v)
        code, length = _ENC_AC[(run << 4) | cat]
        w.write(code, length)
        bits = v if v > 0 else v + (1 << cat) - 1
        w.write(bits, cat)
        run = 0
    if last_nz != 63:
        code, length = _ENC_AC[0x00]  # EOB
        w.write(code, length)
    return dc


def _rgb_to_ycbcr(r: float, g: float, b: float) -> tuple[float, float, float]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _plane_block(
    plane: list[float], pw: int, ph: int, bx: int, by: int
) -> list[float]:
    """8x8 block at (bx*8, by*8) with edge replication, level-shifted."""
    out = [0.0] * 64
    for r in range(8):
        sr = min(by * 8 + r, ph - 1)
        row = sr * pw
        for c in range(8):
            sc = min(bx * 8 + c, pw - 1)
            out[r * 8 + c] = plane[row + sc] - 128.0
    return out


def encode_jpeg(
    w: int,
    h: int,
    channels: int,
    pixels: bytes,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of an interleaved 8-bit pixel buffer
    (1 = grayscale, 3 = RGB; 4 = RGBA, alpha dropped).
    ``subsampling``: "444", "422" (chroma averaged horizontally), or
    "420" (averaged 2x2).  ``restart_interval`` > 0 emits DRI + an
    RSTn marker every that-many MCUs with DC-predictor resets — the
    error-resilience feature real camera JPEGs carry, and the
    decoder's restart path's test vector."""
    if channels == 4:
        pixels = bytes(
            pixels[i] for i in range(len(pixels)) if i % 4 != 3
        )
        channels = 3
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1/3/4, got {channels}")
    if subsampling not in ("444", "422", "420"):
        raise ValueError(
            f"subsampling must be 444|422|420, got {subsampling}"
        )
    quant = _scaled_quant(quality)

    if channels == 1:
        planes = [[float(p) for p in pixels]]
        dims = [(w, h)]
        samp = [(1, 1)]
    else:
        yp = [0.0] * (w * h)
        cbp = [0.0] * (w * h)
        crp = [0.0] * (w * h)
        for i in range(w * h):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            yv, cbv, crv = _rgb_to_ycbcr(float(r), float(g), float(b))
            yp[i], cbp[i], crp[i] = yv, cbv, crv
        if subsampling in ("420", "422"):
            vstep = 2 if subsampling == "420" else 1
            cw = (w + 1) // 2
            ch = (h + vstep - 1) // vstep
            def _down(p):
                out = [0.0] * (cw * ch)
                for yy in range(ch):
                    for xx in range(cw):
                        acc = 0.0
                        n = 0
                        for dy in range(vstep):
                            for dx in (0, 1):
                                sy, sx = vstep * yy + dy, 2 * xx + dx
                                if sy < h and sx < w:
                                    acc += p[sy * w + sx]
                                    n += 1
                        out[yy * cw + xx] = acc / n
                return out
            planes = [yp, _down(cbp), _down(crp)]
            dims = [(w, h), (cw, ch), (cw, ch)]
            samp = [(2, vstep), (1, 1), (1, 1)]
        else:
            planes = [yp, cbp, crp]
            dims = [(w, h)] * 3
            samp = [(1, 1)] * 3

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (one table, id 0, used by every component)
    zz = bytes(quant)
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + zz
    # SOF0
    ncomp = len(planes)
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack(
            "BBB", ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0
        )
    out += b"\xff\xc0" + sof
    # DHT: DC id 0 + AC id 0 (shared by all components)
    for tc, bits, vals in (
        (0x00, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x10, _ENC_AC_BITS, _ENC_AC_VALS),
    ):
        payload = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if restart_interval > 0:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        sos += struct.pack("BB", ci + 1, 0x00)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos

    bw = _BitWriter()
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    preds = [0] * ncomp
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                bw.restart_marker(rst_n)
                rst_n = (rst_n + 1) & 7
                preds = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                sh, sv = samp[ci]
                pw_, ph_ = dims[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = _plane_block(
                            planes[ci], pw_, ph_,
                            mx * sh + bx, my * sv + by,
                        )
                        preds[ci] = _encode_block(bw, blk, quant, preds[ci])
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------
# decoder
# ------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt  # RSTn / EOI / next segment
                return False
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8
        return True

    def read_bit(self) -> int:
        if self._n == 0 and not self._fill():
            return 0  # missing bits decode as 0 per T.81 recovery
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Discard pad bits and consume the RSTn marker.  The marker
        may not have been SEEN yet: the reader fills lazily, so after
        the pre-marker MCU it can sit byte-aligned just BEFORE the
        0xFF — only scanning forward here (not just checking
        ``self.marker``) consumes it; missing it turns every later
        bit into 0 and flattens the rest of the image (caught by the
        restart-interval roundtrip test at 15 dB PSNR)."""
        self._acc = 0
        self._n = 0
        if self.marker is not None:
            if 0xD0 <= self.marker <= 0xD7:
                self.pos += 2
                self.marker = None
            return
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes before the marker
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    if v < (1 << (cat - 1)):
        return v - (1 << cat) + 1
    return v


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Full pixel decode of a baseline/extended-sequential JPEG.
    Returns (width, height, channels, interleaved 8-bit pixels) —
    channels 1 (grayscale) or 3 (RGB).  Raises on progressive (SOF2),
    arithmetic coding, or malformed streams."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = list(
                        struct.unpack(f">{64}H", seg[p : p + 128])
                    )
                    p += 128
                else:
                    vals = list(seg[p : p + 64])
                    p += 64
                qt[tq] = vals
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                cid, sf, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {
                        "id": cid,
                        "h": sf >> 4,
                        "v": sf & 0x0F,
                        "tq": tq,
                    }
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0x{marker:02X}); "
                "only baseline/extended sequential Huffman is decoded"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nvals])
                tab = _decode_table(bits, vals)
                if tc == 0:
                    dc_tabs[th] = tab
                else:
                    ac_tabs[th] = tab
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cid, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cid)
                scan.append(
                    {**comp, "dc": tabs >> 4, "ac": tabs & 0x0F}
                )
            br = _BitReader(data, pos + seglen)
            hmax = max(c["h"] for c in scan)
            vmax = max(c["v"] for c in scan)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            planes = []
            for c in scan:
                pw_ = mcux * c["h"] * 8
                ph_ = mcuy * c["v"] * 8
                planes.append([0] * (pw_ * ph_))
                c["pw"] = pw_
                c["ph"] = ph_
            preds = [0] * ns
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if (
                        restart_interval
                        and mcu_count
                        and mcu_count % restart_interval == 0
                    ):
                        br.restart()
                        preds = [0] * ns
                    mcu_count += 1
                    for ci, c in enumerate(scan):
                        quant = qt[c["tq"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                coeff = [0.0] * 64
                                cat = _huff_decode(br, dc_tabs[c["dc"]])
                                diff = _extend(br.receive(cat), cat)
                                preds[ci] += diff
                                rr, cc = _ZIGZAG[0]
                                coeff[rr * 8 + cc] = preds[ci] * quant[0]
                                k = 1
                                while k < 64:
                                    rs = _huff_decode(br, ac_tabs[c["ac"]])
                                    run, size = rs >> 4, rs & 0x0F
                                    if size == 0:
                                        if run == 15:
                                            k += 16  # ZRL
                                            continue
                                        break  # EOB
                                    k += run
                                    if k > 63:
                                        break
                                    v = _extend(br.receive(size), size)
                                    rr, cc = _ZIGZAG[k]
                                    coeff[rr * 8 + cc] = v * quant[k]
                                    k += 1
                                px = _idct(coeff)
                                pw_ = c["pw"]
                                x0 = (mx * c["h"] + bx) * 8
                                y0 = (my * c["v"] + by) * 8
                                plane = planes[ci]
                                for r in range(8):
                                    row = (y0 + r) * pw_ + x0
                                    prow = r * 8
                                    for cc2 in range(8):
                                        v = int(round(px[prow + cc2])) + 128
                                        plane[row + cc2] = (
                                            0 if v < 0 else 255 if v > 255 else v
                                        )
            # upsample to full resolution and color-convert
            if ns == 1:
                c = scan[0]
                pw_ = c["pw"]
                out = bytearray(w * h)
                for r in range(h):
                    row = r * pw_
                    orow = r * w
                    for cc2 in range(w):
                        out[orow + cc2] = planes[0][row + cc2]
                return w, h, 1, bytes(out)
            full = []
            for ci, c in enumerate(scan):
                sh = hmax // c["h"]
                sv = vmax // c["v"]
                pw_ = c["pw"]
                plane = planes[ci]
                if sh == 1 and sv == 1:
                    full.append((plane, pw_))
                else:
                    up = [0] * (mcux * hmax * 8 * mcuy * vmax * 8)
                    upw = mcux * hmax * 8
                    for r in range(mcuy * vmax * 8):
                        srow = (r // sv) * pw_
                        orow = r * upw
                        for cc2 in range(upw):
                            up[orow + cc2] = plane[srow + cc2 // sh]
                    full.append((up, upw))
            out = bytearray(w * h * 3)
            yp, ypw = full[0]
            cbp, cbpw = full[1]
            crp, crpw = full[2]
            for r in range(h):
                yrow, cbrow, crrow = r * ypw, r * cbpw, r * crpw
                orow = r * w * 3
                for cc2 in range(w):
                    yv = yp[yrow + cc2]
                    cb = cbp[cbrow + cc2] - 128
                    cr = crp[crrow + cc2] - 128
                    rv = int(round(yv + 1.402 * cr))
                    gv = int(round(yv - 0.344136 * cb - 0.714136 * cr))
                    bv = int(round(yv + 1.772 * cb))
                    o = orow + 3 * cc2
                    out[o] = 0 if rv < 0 else 255 if rv > 255 else rv
                    out[o + 1] = 0 if gv < 0 else 255 if gv > 255 else gv
                    out[o + 2] = 0 if bv < 0 else 255 if bv > 255 else bv
            return w, h, 3, bytes(out)
        pos += seglen
    raise ValueError("no SOS scan found")
