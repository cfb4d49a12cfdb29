"""PNG plot sink (functions/plotting.py — the reference's
combined_plot.png / Evaluation.png artifacts, main_ldu_hw.py:239-326):
rendered output is verified by decoding the PNG back with the stdlib
codec and re-measuring bar heights and wedge areas from pixels."""

from __future__ import annotations

import math
from collections import Counter

from record_linkage_ldu_spark.functions.media_codec import decode_png
from record_linkage_ldu_spark.functions.plotting import (
    histogram_grid_png,
    pie_png,
)

_BAR = (66, 133, 188)


def test_histogram_grid_bars_match_counts(tmp_path):
    counts = [0, 5, 10, 3, 20, 0, 7, 1, 2, 9]
    path = str(tmp_path / "hist.png")
    geom = histogram_grid_png(
        [
            ("name", [(i * 0.05, n) for i, n in enumerate(counts)]),
            ("email", [(i * 0.05, n) for i, n in enumerate([1, 2, 3])]),
        ],
        path,
    )
    w, h, ch, px = decode_png(open(path, "rb").read())
    assert (w, h, ch) == (geom["w"], geom["h"], 3)

    def column_height(x: int, y_top: int, y_axis: int) -> int:
        return sum(
            1
            for y in range(y_top, y_axis)
            if tuple(px[(y * w + x) * 3 : (y * w + x) * 3 + 3]) == _BAR
        )

    for panel in geom["panels"]:
        peak = max(b["count"] for b in panel["bars"]) or 1
        for b in panel["bars"]:
            mid = (b["x0"] + b["x1"]) // 2
            measured = column_height(mid, panel["y_top"], panel["y_axis"])
            assert measured == b["h"], (panel["field"], b)
            if b["count"] == 0:
                assert measured == 0
            else:
                # height proportional to count (within 1px rounding)
                expect = (b["count"] / peak) * max(
                    bb["h"] for bb in panel["bars"]
                )
                assert abs(measured - expect) <= 1.5


def test_pie_wedge_areas_match_fractions(tmp_path):
    path = str(tmp_path / "pie.png")
    spans = pie_png(
        [("true", 70.0), ("false", 20.0), ("missed", 10.0)],
        "matches evaluation",
        path,
    )
    w, h, ch, px = decode_png(open(path, "rb").read())
    assert (w, h, ch) == (spans["w"], spans["h"], 3)
    cx, cy = spans["center"]
    r = spans["r"]
    cnt: Counter = Counter()
    for y in range(cy - r, cy + r + 1):
        for x in range(cx - r, cx + r + 1):
            i = (y * w + x) * 3
            cnt[tuple(px[i : i + 3])] += 1
    area = math.pi * r * r
    for s in spans["spans"]:
        pixel_frac = cnt[s["color"]] / area
        assert abs(pixel_frac - s["frac"]) < 0.01, s["label"]


def test_pie_zero_slice_draws_nothing(tmp_path):
    path = str(tmp_path / "pie0.png")
    spans = pie_png(
        [("true", 1.0), ("false", 0.0)], "eval", path
    )
    w, h, ch, px = decode_png(open(path, "rb").read())
    cx, cy = spans["center"]
    r = spans["r"]
    zero_color = spans["spans"][1]["color"]
    hits = sum(
        1
        for y in range(cy - r, cy + r + 1)
        for x in range(cx - r, cx + r + 1)
        if tuple(px[((y * w + x) * 3) : ((y * w + x) * 3) + 3]) == zero_color
        and (x - cx) ** 2 + (y - cy) ** 2 <= r * r
    )
    assert hits == 0
