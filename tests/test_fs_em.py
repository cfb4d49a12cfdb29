"""EM-estimated Fellegi-Sunter parameters (operators/fs_em.py):
recovery of planted mixture parameters from exact expected pattern
counts, and the Spark aggregation + weight emission path."""

from __future__ import annotations

from itertools import product

from pyspark.sql import functions as F

from record_linkage_ldu_spark.operators.fs_em import (
    estimate_fs_weights,
    fs_em,
    fs_pattern_counts,
)


def _expected_counts(n, p, m, u):
    """Exact expected pattern counts of the two-class FS mixture."""
    nf = len(m)
    counts = []
    for bits in product((0, 1), repeat=nf):
        g = sum(b << (nf - 1 - i) for i, b in enumerate(bits))
        pm = p
        pu = 1.0 - p
        for i, b in enumerate(bits):
            pm *= m[i] if b else 1.0 - m[i]
            pu *= u[i] if b else 1.0 - u[i]
        counts.append((g, round(n * (pm + pu))))
    return sorted(counts)


def test_fs_em_recovers_planted_mixture():
    true_p, true_m, true_u = 0.08, [0.95, 0.9, 0.85, 0.92], [0.05, 0.02, 0.1, 0.03]
    counts = _expected_counts(2_000_000, true_p, true_m, true_u)
    fit = fs_em(counts, 4, iters=200)
    assert abs(fit["p"] - true_p) < 0.01
    for i in range(4):
        assert abs(fit["m"][i] - true_m[i]) < 0.03, ("m", i, fit["m"])
        assert abs(fit["u"][i] - true_u[i]) < 0.03, ("u", i, fit["u"])


def test_fs_em_degenerate_counts_stay_finite():
    """All-agree + all-disagree only (the saturation shape that used
    to 0/0): params clamp into (0,1) and stay finite."""
    fit = fs_em([(0, 900), (15, 100)], 4, iters=50)
    for v in (fit["p"], *fit["m"], *fit["u"]):
        assert 0.0 < v < 1.0


def test_estimate_fs_weights_spark_path(spark):
    """End-to-end over a scored-pairs frame: matched pairs sim ~1,
    unmatched ~0 with some chance agreement — m >> u per field and
    w_agree > 1 > w_disagree."""
    rows = []
    for i in range(300):
        if i % 10 == 0:  # matched pair: all fields agree
            rows.append((0.99, 0.97, 1.0, 0.95))
        else:  # unmatched: name agrees by chance 10% of the time
            rows.append((0.9 if i % 10 == 1 else 0.1, 0.0, 0.2, 0.3))
    df = spark.createDataFrame(
        rows, "name double, phone double, email double, address double"
    )
    fields = ("name", "phone", "email", "address")
    pats = {
        r["g"]: r["c"]
        for r in fs_pattern_counts(df, fields, tau=0.85).collect()
    }
    assert pats[15] == 30 and pats[8] == 30 and pats[0] == 240
    out = {
        r["field"]: r
        for r in estimate_fs_weights(spark, df, fields, iters=50).collect()
    }
    assert set(out) == set(fields)
    for f in fields:
        assert out[f]["m"] > out[f]["u"]
        assert out[f]["w_agree"] > 1.0 > out[f]["w_disagree"]
    # fitted prevalence ~ the planted 10%
    assert abs(out["name"]["p"] - 0.1) < 0.02


def test_fs_match_probability_separates_classes(spark):
    from record_linkage_ldu_spark.operators.fs_em import (
        fs_match_probability,
    )

    rows = []
    for i in range(300):
        pre = (f"a{i}", f"b{i}")
        if i % 10 == 0:
            rows.append((*pre, 0.99, 0.97, 1.0, 0.95))
        else:
            rows.append((*pre, 0.9 if i % 10 == 1 else 0.1, 0.0, 0.2, 0.3))
    df = spark.createDataFrame(
        rows,
        "doc_id_1 string, doc_id_2 string, name double, phone double, "
        "email double, address double",
    )
    fields = ("name", "phone", "email", "address")
    pats = sorted(
        (r["g"], r["c"])
        for r in fs_pattern_counts(df, fields, tau=0.85).collect()
    )
    fit = fs_em(pats, 4, iters=50)
    out = fs_match_probability(df, fit, fields).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r["match_prob"])
    # all-agree pattern -> near-certain match; all-disagree -> near 0;
    # name-only chance agreement -> still low
    assert min(by_g[15]) > 0.99
    assert max(by_g[0]) < 0.01
    assert max(by_g[8]) < 0.5


def test_fs_decisions_three_way(spark):
    """Posterior band split: link / possible (clerical) / non-link
    with per-band counts and mean posterior."""
    from record_linkage_ldu_spark.operators.fs_em import fs_decisions

    posterior = spark.createDataFrame(
        [("a", "b", 3, 0.97), ("c", "d", 3, 0.93), ("e", "f", 1, 0.5),
         ("g", "h", 0, 0.05)],
        "doc_id_1 string, doc_id_2 string, g int, match_prob double",
    )
    out = {r["decision"]: r for r in fs_decisions(posterior).collect()}
    assert out["link"]["n_pairs"] == 2
    assert out["link"]["avg_prob"] == 0.95
    assert out["possible"]["n_pairs"] == 1
    assert out["non-link"]["avg_prob"] == 0.05


def test_review_queue_margin_order_and_band(spark):
    """Queue holds only in-band pairs, nearest-to-threshold first,
    with the would-be decision and fired-field count attached."""
    from record_linkage_ldu_spark.config import (
        SCORE_THRESHOLDS,
        SELF_SCORE_FIELDS,
    )
    from record_linkage_ldu_spark.operators.rules import review_queue

    base = {f: 0.0 for f in SELF_SCORE_FIELDS}
    rows = [
        {"doc_id_1": "a", "doc_id_2": "b", "score": 4.8, **base,
         "email": 0.95},                     # margin 0.1
        {"doc_id_1": "c", "doc_id_2": "d", "score": 5.3, **base},  # 0.4
        {"doc_id_1": "e", "doc_id_2": "f", "score": 9.0, **base},  # out
        {"doc_id_1": "g", "doc_id_2": "h", "score": 4.9, **base},  # 0.0
    ]
    out = review_queue(spark.createDataFrame(rows), k=10).collect()
    assert [r["doc_id_1"] for r in out] == ["g", "a", "c"]
    assert [r["margin"] for r in out] == [0.0, 0.1, 0.4]
    assert out[0]["decided"] is True and out[1]["decided"] is False
    # email cleared its 0.5 threshold; zero-threshold fields always fire
    always_on = sum(
        1 for f in SELF_SCORE_FIELDS if SCORE_THRESHOLDS[f] <= 0.0
    )
    assert out[1]["n_fired"] == always_on + 1
    assert out[2]["n_fired"] == always_on  # all-zero sims row
    assert review_queue(spark.createDataFrame(rows), k=2).count() == 2


def test_rule_precision_prices_each_mask(spark):
    """Hand-computed per-mask precision; 'any' is the union, not the
    sum; zero-fired masks report precision 0."""
    from record_linkage_ldu_spark.config import SELF_SCORE_FIELDS
    from record_linkage_ldu_spark.operators.rules import rule_precision

    base = {f: 0.0 for f in SELF_SCORE_FIELDS}
    base["fax"] = 0.0
    rows = [
        # mask0 (score>=4.9) fires, labeled true
        {"doc_id_1": "a", "doc_id_2": "b", "score": 5.0, **base},
        # mask0 fires, NOT labeled -> fp
        {"doc_id_1": "c", "doc_id_2": "d", "score": 5.0, **base},
        # mask3 (exact email) fires, labeled true; also below 4.9
        {"doc_id_1": "e", "doc_id_2": "f", "score": 1.0, **{**base, "email": 1.0}},
        # nothing fires
        {"doc_id_1": "g", "doc_id_2": "h", "score": 1.0, **base},
    ]
    labeled = spark.createDataFrame(
        [("a", "b", True), ("e", "f", True), ("c", "d", False)],
        "doc_id_1 string, doc_id_2 string, is_match boolean",
    )
    out = {
        r["rule"]: r
        for r in rule_precision(
            spark.createDataFrame(rows), labeled
        ).collect()
    }
    assert out["mask0"]["n_fired"] == 2 and out["mask0"]["n_true"] == 1
    assert out["mask0"]["precision"] == 0.5
    assert out["mask3"]["n_fired"] == 1 and out["mask3"]["precision"] == 1.0
    assert out["mask2"]["n_fired"] == 0 and out["mask2"]["precision"] == 0.0
    assert out["any"]["n_fired"] == 3 and out["any"]["n_true"] == 2
