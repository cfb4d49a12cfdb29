"""Pure-stdlib PNG plot sink (reference parity: main_ldu_hw.py:239-261
pie 'Matches evaluation' -> plots/Evaluation.png, and :276-326 stacked
per-column score histograms -> plots/combined_plot.png).

No plotting libraries ship in this sandbox, so this is a tiny software
rasterizer: an RGB canvas with a 5x7 bitmap font, bar/pie primitives,
and :func:`media_codec.encode_png` as the writer.  The goal is the
reference's *artifacts* — threshold-picking histograms and an
evaluation pie a human can open — produced from the same hash-green
driver queries the correctness harness checks, with zero new
dependencies.  Outputs round-trip through ``media_codec.decode_png``
(pytest-gated: bar heights and wedge areas are re-measured from the
decoded pixels).
"""

from __future__ import annotations

import math

from .media_codec import encode_png

# 5x7 bitmap font (7 space-separated rows of 5 bits, '1' = lit).
# Digits, A-Z and the punctuation the plot labels need; text renders
# uppercase.
_LETTERS = {
    "0": "01100 10010 10110 11010 10010 10010 01100",
    "1": "00100 01100 00100 00100 00100 00100 01110",
    "2": "01100 10010 00010 00100 01000 10000 11110",
    "3": "11110 00010 00100 01100 00010 10010 01100",
    "4": "00010 00110 01010 10010 11111 00010 00010",
    "5": "11110 10000 11100 00010 00010 10010 01100",
    "6": "00110 01000 10000 11100 10010 10010 01100",
    "7": "11110 00010 00100 00100 01000 01000 01000",
    "8": "01100 10010 10010 01100 10010 10010 01100",
    "9": "01100 10010 10010 01110 00010 00100 11000",
    "A": "01100 10010 10010 11110 10010 10010 10010",
    "B": "11100 10010 10010 11100 10010 10010 11100",
    "C": "01110 10000 10000 10000 10000 10000 01110",
    "D": "11100 10010 10010 10010 10010 10010 11100",
    "E": "11110 10000 10000 11100 10000 10000 11110",
    "F": "11110 10000 10000 11100 10000 10000 10000",
    "G": "01110 10000 10000 10110 10010 10010 01110",
    "H": "10010 10010 10010 11110 10010 10010 10010",
    "I": "01110 00100 00100 00100 00100 00100 01110",
    "J": "00110 00010 00010 00010 00010 10010 01100",
    "K": "10010 10100 11000 10000 11000 10100 10010",
    "L": "10000 10000 10000 10000 10000 10000 11110",
    "M": "10001 11011 10101 10101 10001 10001 10001",
    "N": "10010 11010 11010 10110 10110 10010 10010",
    "O": "01100 10010 10010 10010 10010 10010 01100",
    "P": "11100 10010 10010 11100 10000 10000 10000",
    "Q": "01100 10010 10010 10010 10110 10010 01101",
    "R": "11100 10010 10010 11100 10100 10010 10010",
    "S": "01110 10000 10000 01100 00010 00010 11100",
    "T": "11111 00100 00100 00100 00100 00100 00100",
    "U": "10010 10010 10010 10010 10010 10010 01100",
    "V": "10001 10001 10001 01010 01010 00100 00100",
    "W": "10001 10001 10101 10101 10101 11011 10001",
    "X": "10001 01010 00100 00100 00100 01010 10001",
    "Y": "10001 01010 00100 00100 00100 00100 00100",
    "Z": "11111 00010 00100 00100 01000 10000 11111",
    ".": "00000 00000 00000 00000 00000 00100 00100",
    "-": "00000 00000 00000 01110 00000 00000 00000",
    "%": "11001 11010 00010 00100 01000 01011 10011",
    ":": "00000 00100 00000 00000 00000 00100 00000",
    "/": "00001 00010 00010 00100 01000 01000 10000",
    "(": "00010 00100 01000 01000 01000 00100 00010",
    ")": "01000 00100 00010 00010 00010 00100 01000",
    "=": "00000 01110 00000 01110 00000 00000 00000",
    " ": "00000 00000 00000 00000 00000 00000 00000",
}


def _glyph_rows(ch: str) -> list[str]:
    return _LETTERS.get(ch.upper(), _LETTERS[" "]).split()


class Canvas:
    """Minimal RGB raster canvas."""

    def __init__(self, w: int, h: int, bg: tuple[int, int, int] = (250, 250, 247)):
        self.w, self.h = w, h
        self.px = bytearray(bytes(bg) * (w * h))

    def set(self, x: int, y: int, c: tuple[int, int, int]) -> None:
        if 0 <= x < self.w and 0 <= y < self.h:
            i = (y * self.w + x) * 3
            self.px[i : i + 3] = bytes(c)

    def rect(self, x0, y0, x1, y1, c) -> None:
        x0, x1 = max(0, min(x0, x1)), min(self.w - 1, max(x0, x1))
        y0, y1 = max(0, min(y0, y1)), min(self.h - 1, max(y0, y1))
        row = bytes(c) * (x1 - x0 + 1)
        for y in range(y0, y1 + 1):
            i = (y * self.w + x0) * 3
            self.px[i : i + len(row)] = row

    def hline(self, x0, x1, y, c) -> None:
        self.rect(x0, y, x1, y, c)

    def vline(self, x, y0, y1, c) -> None:
        self.rect(x, y0, x, y1, c)

    def text(self, x: int, y: int, s: str, c=(40, 40, 40), scale: int = 1) -> None:
        cx = x
        for ch in s:
            rows = _glyph_rows(ch)
            for ry, row in enumerate(rows):
                for rx, bit in enumerate(row):
                    if bit == "1":
                        self.rect(
                            cx + rx * scale,
                            y + ry * scale,
                            cx + rx * scale + scale - 1,
                            y + ry * scale + scale - 1,
                            c,
                        )
            cx += 6 * scale
        return None

    def to_png(self) -> bytes:
        return encode_png(self.w, self.h, 3, bytes(self.px))


# matplotlib-tab10-ish wedge colors (public knowledge, not a lib dep)
PALETTE = [
    (31, 119, 180),
    (255, 127, 14),
    (44, 160, 44),
    (214, 39, 40),
    (148, 103, 189),
    (140, 86, 75),
]
_AXIS = (70, 70, 70)
_BAR = (66, 133, 188)


def histogram_grid_png(
    panels: list[tuple[str, list[tuple[float, int]]]],
    path: str,
    panel_w: int = 640,
    panel_h: int = 220,
) -> dict:
    """Stacked per-field histogram grid (reference combined_plot.png).

    ``panels`` = [(field, [(bin_lo, count), ...]), ...]; one bar chart
    per field, stacked vertically in a single PNG like the reference's
    ``plt.subplots(len(columns))``.  Returns plot geometry for tests
    (bar pixel rects per panel).
    """
    ml, mr, mt, mb = 56, 16, 26, 26
    w = panel_w
    h = panel_h * len(panels)
    cv = Canvas(w, h)
    geom: dict = {"panels": []}
    for pi, (field, bins) in enumerate(panels):
        oy = pi * panel_h
        x0, y0 = ml, oy + mt
        x1, y1 = w - mr, oy + panel_h - mb
        cv.text(ml, oy + 8, field.upper(), scale=2)
        cv.hline(x0, x1, y1, _AXIS)
        cv.vline(x0, y0, y1, _AXIS)
        peak = max((n for _, n in bins), default=1) or 1
        nb = len(bins) or 1
        bw = (x1 - x0 - 4) // nb
        bars = []
        for bi, (lo, n) in enumerate(bins):
            bx0 = x0 + 2 + bi * bw
            bx1 = bx0 + bw - 2
            bh = int(round((y1 - y0 - 2) * n / peak))
            if n > 0:
                bh = max(bh, 1)
                cv.rect(bx0, y1 - bh, bx1, y1 - 1, _BAR)
            bars.append(
                {"x0": bx0, "x1": bx1, "h": bh, "count": n, "lo": lo}
            )
            if bi % max(nb // 10, 1) == 0:
                cv.text(bx0, y1 + 4, f"{lo:.2f}")
        cv.text(x0 - 52, y0 - 4, str(peak))
        geom["panels"].append(
            {"field": field, "y_axis": y1, "y_top": y0, "bars": bars}
        )
    with open(path, "wb") as f:
        f.write(cv.to_png())
    geom.update({"w": w, "h": h})
    return geom


def pie_png(
    slices: list[tuple[str, float]],
    title: str,
    path: str,
    size: int = 420,
) -> dict:
    """Pie chart (reference Evaluation.png): labeled wedges with
    percentage text, drawn by per-pixel angle test.  Returns wedge
    angle spans + colors for tests (decoded-pixel area ~ fraction)."""
    w, h = size + 240, size + 60
    cv = Canvas(w, h)
    cv.text(16, 10, title.upper(), scale=2)
    cx, cy, r = 30 + size // 2, 40 + size // 2, size // 2
    total = sum(max(v, 0.0) for _, v in slices) or 1.0
    spans = []
    a = -math.pi / 2
    for i, (label, v) in enumerate(slices):
        frac = max(v, 0.0) / total
        spans.append(
            {
                "label": label,
                "frac": frac,
                "a0": a,
                "a1": a + frac * 2 * math.pi,
                "color": PALETTE[i % len(PALETTE)],
            }
        )
        a += frac * 2 * math.pi
    for y in range(cy - r, cy + r + 1):
        for x in range(cx - r, cx + r + 1):
            dx, dy = x - cx, y - cy
            if dx * dx + dy * dy > r * r:
                continue
            ang = math.atan2(dy, dx)
            # normalize into [-pi/2, 3pi/2) to match the start angle
            if ang < -math.pi / 2:
                ang += 2 * math.pi
            for s in spans:
                if s["a0"] <= ang < s["a1"] or (
                    s is spans[-1] and ang >= s["a1"]
                ):
                    cv.set(x, y, s["color"])
                    break
    ly = 46
    for s in spans:
        cv.rect(size + 70, ly, size + 86, ly + 14, s["color"])
        cv.text(size + 92, ly + 3, f"{s['label']} {s['frac'] * 100:.2f}%")
        ly += 24
    with open(path, "wb") as f:
        f.write(cv.to_png())
    return {"w": w, "h": h, "center": (cx, cy), "r": r, "spans": spans}
