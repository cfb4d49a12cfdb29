"""End-to-end gates (BASELINE.md): pairwise F1 >= 0.99 on labeled pairs
at the blocking keys, golden clusters at tiny scale, invariants,
determinism."""

from pyspark.sql import functions as F

from record_linkage_ldu_spark.operators.evaluate import (
    clusters_to_pairs,
    pairwise_prf,
    validate_clusters,
)
from record_linkage_ldu_spark.plans.linkage import LinkageConfig, LinkagePipeline
from record_linkage_ldu_spark.sources.datagen import (
    expected_clusters,
    labeled_pairs,
)


def _run(spark, gen, **cfg_kwargs):
    pipe = LinkagePipeline(spark, LinkageConfig(**cfg_kwargs))
    return pipe.run(gen.select("doc_id", "spans"))


def test_f1_gate_small(spark, small_gen):
    """The BASELINE gate at reference-like scale (~2k docs)."""
    res = _run(spark, small_gen)
    lab = labeled_pairs(small_gen.select("doc_id", "entity_id"))
    pred = clusters_to_pairs(res.clusters)
    blocked = pairwise_prf(pred, lab, candidates=res.pairs)
    overall = pairwise_prf(pred, lab)
    assert blocked["f1"] >= 0.99, blocked
    assert overall["f1"] >= 0.99, overall


def test_golden_clusters_tiny(spark, tiny_gen):
    """Exact-match clustering against the generator's entity
    assignment (FIXTURES.md §3)."""
    res = _run(spark, tiny_gen)
    expected = {
        (r["doc_id"], r["cluster_id"])
        for r in expected_clusters(
            tiny_gen.select("doc_id", "entity_id")
        ).collect()
    }
    got = {(r["doc_id"], r["cluster_id"]) for r in res.clusters.collect()}
    assert got == expected


def test_every_doc_in_exactly_one_cluster(spark, tiny_gen):
    res = _run(spark, tiny_gen)
    stats = validate_clusters(res.clusters)
    assert stats["docs_in_multiple_clusters"] == 0
    assert res.clusters.count() == tiny_gen.count()
    # cluster label = min member doc_id
    bad = (
        res.clusters.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("mn"))
        .where(F.col("cluster_id") != F.col("mn"))
        .count()
    )
    assert bad == 0


def test_rerun_determinism(spark, tiny_gen):
    a = _run(spark, tiny_gen).clusters.collect()
    b = _run(spark, tiny_gen).clusters.collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cc_method_equivalence_e2e(spark, tiny_gen):
    star = _run(spark, tiny_gen, cc_method="alternating-star").clusters
    prop = _run(spark, tiny_gen, cc_method="label-prop").clusters
    assert sorted(map(tuple, star.collect())) == sorted(map(tuple, prop.collect()))


def test_cross_f1_gate_small(spark, small_gen):
    """Cross-pipeline twin of the BASELINE F1 gate at reference-like
    scale: split every entity's copies across two sources (left = the
    x0 copy, right = the rest) and require pairwise F1 >= 0.99 of the
    reassembled clusters against the planted labels.  Transitivity
    through the left hub recovers right-right duplicate pairs, so the
    gate runs over ALL labeled pairs, not just cross-side ones."""
    from record_linkage_ldu_spark.plans.linkage import CrossLinkagePipeline

    docs = small_gen.select("doc_id", "spans")
    left = docs.where(F.col("doc_id").endswith("x0"))
    right = docs.where(~F.col("doc_id").endswith("x0"))
    res = CrossLinkagePipeline(spark, LinkageConfig()).run(left, right)
    lab = labeled_pairs(small_gen.select("doc_id", "entity_id"))
    pred = clusters_to_pairs(res.clusters)
    overall = pairwise_prf(pred, lab)
    assert overall["f1"] >= 0.99, overall


def test_cross_pipeline_golden(spark, tiny_gen):
    """CrossLinkagePipeline (the reference's LDU x HW flow): left =
    first copy of every entity, right = the remaining copies.  Every
    entity's copies must reassemble into one cluster through
    left-right match edges alone."""
    from record_linkage_ldu_spark.plans.linkage import CrossLinkagePipeline

    docs = tiny_gen.select("doc_id", "spans")
    left = docs.where(F.col("doc_id").endswith("x0"))
    right = docs.where(~F.col("doc_id").endswith("x0"))
    res = CrossLinkagePipeline(spark, LinkageConfig()).run(left, right)

    # every match edge crosses the two sources
    bad = res.matches.where(
        ~F.col("doc_id_1").endswith("x0") & ~F.col("doc_id_2").endswith("x0")
    ).count()
    same_side = res.matches.where(
        F.col("doc_id_1").endswith("x0") & F.col("doc_id_2").endswith("x0")
    ).count()
    assert bad == 0 and same_side == 0

    expected = {
        (r["doc_id"], r["cluster_id"])
        for r in expected_clusters(
            tiny_gen.select("doc_id", "entity_id")
        ).collect()
    }
    got = {(r["doc_id"], r["cluster_id"]) for r in res.clusters.collect()}
    assert got == expected


def test_merge_recompare_complementary_evidence(spark):
    """Merge-and-recompare (Swoosh family): cluster A holds the phone,
    cluster B holds the email variant — NO record pair fires a match
    rule, but the golden pair (modal fields pooled per cluster) does,
    so the two clusters merge.  Also a coarsening invariant: input
    clusters map whole into one supercluster."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    none = {f: None for f in E._PAIR_FIELDS}
    rows = [
        # cluster r1: name+zip on r1, phone+email+zip on r2
        {"doc_id": "r1", **none, "name": "acme corporation", "zip": "62704"},
        {"doc_id": "r2", **none, "phone": "1112223333",
         "email": "ac@xy.com", "zip": "62704"},
        # cluster r3: near-variant name / phone / email, same zip
        {"doc_id": "r3", **none, "name": "acme corporatin", "zip": "62704"},
        {"doc_id": "r4", **none, "phone": "1112223334",
         "email": "ac@xz.com", "zip": "62704"},
        # unrelated singleton
        {"doc_id": "r5", **none, "name": "zeta gmbh", "zip": "99999"},
    ]
    records = spark.createDataFrame(
        rows, "doc_id string, " + ", ".join(f"`{f}` string" for f in E._PAIR_FIELDS)
    )
    clusters = spark.createDataFrame(
        [("r1", "r1"), ("r2", "r1"), ("r3", "r3"), ("r4", "r3"),
         ("r5", "r5")],
        "doc_id string, cluster_id string",
    )
    # precondition: at RECORD level no candidate pair fires a rule
    kept, _ = E.cap_blocks(E.block_keys(records, E._BLK), E._BLK)
    scored = E._native_scores(records, E.candidate_pairs(kept))
    assert scored.where(E._self_match_pred()).count() == 0
    # golden level: r1-cluster's pooled (name, phone, email) vs
    # r3-cluster's → mask 2 fires, clusters merge
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in E.merge_recompare(records, clusters).collect()
    }
    assert out["r1"] == out["r2"] == out["r3"] == out["r4"] == "r1"
    assert out["r5"] == "r5"


def test_cross_coverage_sides_and_rates(spark):
    """Coverage rows = one per side; counts tie out to the records
    and the cross match set."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = {r["side"]: r for r in E.queries()["cross_coverage"](spark, sf).collect()}
    assert set(out) == {"left", "right"}
    recs = E._records(spark, sf)
    n_left = recs.where(F.substring("doc_id", 1, 1) == "a").count()
    assert out["left"]["n_docs"] == n_left
    assert out["left"]["n_docs"] + out["right"]["n_docs"] == recs.count()
    for side in out.values():
        assert 0.0 <= side["match_rate"] <= 1.0
        assert side["n_matched"] <= side["n_docs"]
        assert side["n_multi"] <= side["n_matched"]
    # every a-doc has a planted b counterpart: left coverage is full
    assert out["left"]["match_rate"] > 0.95


def test_multimodal_matches_fusion_tiers(spark):
    """Fused pairs: text-evidence rows exactly cover the rule-match
    set; 'both' pairs (text + shared media content) exist on the
    planted corpus and are a subset of it."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    fused = E.queries()["multimodal_matches"](spark, sf)
    tiers = {r["evidence"]: r["count"]
             for r in fused.groupBy("evidence").count().collect()}
    n_matches = E._matches(spark, sf).count()
    assert tiers.get("both", 0) > 0
    assert tiers.get("both", 0) + tiers.get("text", 0) == n_matches
    # media-evidence pairs are symmetric-ordered and unique
    assert fused.count() == fused.dropDuplicates(
        ["doc_id_1", "doc_id_2"]
    ).count()
    assert fused.where(F.col("doc_id_1") >= F.col("doc_id_2")).count() == 0


def test_pipeline_sparsify_knob(spark):
    """sparsify_top_k=0 (default) leaves the pipeline byte-identical;
    a generous k changes nothing on the hub-free fixture (every true
    cluster is <= 3 members, mutual top-3 keeps all their edges)."""
    from record_linkage_ldu_spark.plans.linkage import (
        LinkageConfig,
        LinkagePipeline,
    )
    from record_linkage_ldu_spark.sources.synth import synth_documents

    docs = synth_documents(
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    ).localCheckpoint(eager=True)
    base = LinkagePipeline(spark, LinkageConfig()).run(docs)
    sparse = LinkagePipeline(
        spark, LinkageConfig(sparsify_top_k=3)
    ).run(docs)
    want = {
        (r["doc_id"], r["cluster_id"]) for r in base.clusters.collect()
    }
    got = {
        (r["doc_id"], r["cluster_id"]) for r in sparse.clusters.collect()
    }
    assert got == want


def test_pipeline_all_r4c_knobs_on_keeps_f1(spark, small_gen):
    """Turning on every r4c knob at once (NYSIIS + nickname key
    families, mutual top-k sparsified closure) must not break the
    fixture's F1 gate.  k follows the losslessness rule (mutual top-k
    keeps every edge of a clique with <= k+1 members; this fixture
    plants duplicate families up to 8 copies, so k=8) — a SMALL k on
    clean many-copy entities deliberately trades their recall for the
    degree bound, which is the knob's documented contract, not a
    bug."""
    import dataclasses

    from record_linkage_ldu_spark.plans.linkage import default_blocking

    blk = dataclasses.replace(
        default_blocking(), use_nysiis=True, use_nickname_soundex=True
    )
    res = _run(spark, small_gen, blocking=blk, sparsify_top_k=8)
    lab = labeled_pairs(small_gen.select("doc_id", "entity_id"))
    pred = clusters_to_pairs(res.clusters)
    overall = pairwise_prf(pred, lab)
    assert overall["f1"] >= 0.99, overall


def test_null_score_model_separates_from_cutoffs(spark):
    """The calibration claim as data: hash-seeded random pairs score
    far below the rule cutoffs — (virtually) all null mass sits under
    the lowest threshold (3.4), and nothing reaches the hard 4.9."""
    import sys, os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as E

    rows = E.queries()["null_score_histogram"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    total = sum(r["n_pairs"] for r in rows)
    assert total > 100
    below = sum(r["n_pairs"] for r in rows if r["score_bin"] < 3.4)
    assert below / total >= 0.99, (below, total)
    assert not [r for r in rows if r["score_bin"] >= 4.9]


def test_fold_accents_knob_recovers_accented_match(spark):
    """LinkageConfig(fold_accents=True): 'Müller GmbH' and 'Muller
    GmbH' match via the exact-name rule after folding; without the
    knob the normalizers strip the accented codepoint ('mller') and
    the pair is missed — the documented recall failure the knob
    exists for."""
    docs = spark.createDataFrame(
        [
            (
                "d1",
                [("name", "Müller GmbH", None, 0)],
            ),
            (
                "d2",
                [("name", "Muller GmbH", None, 0)],
            ),
        ],
        "doc_id string, spans array<struct<"
        "kind string, text string, media_ref string, offset int>>",
    )
    base = LinkagePipeline(spark, LinkageConfig()).run(docs)
    assert base.matches.count() == 0
    folded = LinkagePipeline(
        spark, LinkageConfig(fold_accents=True)
    ).run(docs)
    got = [
        (r["doc_id_1"], r["doc_id_2"])
        for r in folded.matches.select("doc_id_1", "doc_id_2").collect()
    ]
    assert got == [("d1", "d2")]
    # clusters merge only under the fold
    n_base = base.clusters.select("cluster_id").distinct().count()
    n_fold = folded.clusters.select("cluster_id").distinct().count()
    assert n_base == 2 and n_fold == 1


def test_unicode_names_knob_links_cjk_duplicates(spark):
    """VERDICT r4 item 6, linkage side: under the reference-faithful
    default the `[^a-z0-9 ]` strip deletes CJK names outright (no
    phonetic key, no SN rank, no name similarity), so a planted CJK
    duplicate pair is unreachable.  With `unicode_names=True` +
    `blocking.use_qgram_name=True` (the script-agnostic key family)
    the pair is blocked, scored on the real characters, and clustered
    — while the distinct CJK record pairs with nothing under either
    config."""
    from record_linkage_ldu_spark.operators.blocking import BlockingConfig
    from record_linkage_ldu_spark.operators.spans import DOCUMENTS_SCHEMA

    def doc(doc_id, name, zip_, phone, email):
        spans = [
            ("name", name, None, 0),
            ("address", "12 sakura street", None, 1),
            ("city", "shibuya", None, 2),
            ("state", "tokyo", None, 3),
            ("zip", zip_, None, 4),  # 3 chars: below the zp: key floor
            ("country", "japan", None, 5),
            ("phone", phone, None, 6),
            ("email", email, None, 7),
        ]
        return (doc_id, spans)

    rows = [
        doc("d1", "山田太郎商事株式会社", "123", "81355550001", "a@x1.example"),
        doc("d2", "山田太郎商店株式会社", "123", "81355550002", "b@x2.example"),
        doc("d3", "鈴木電機製作所一同", "123", "81355550003", "c@x3.example"),
        doc("d4", "acme trading company", "123", "81355550004", "d@x4.example"),
        doc("d5", "acme tradings company", "123", "81355550005", "e@x5.example"),
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)

    def matched_pairs(cfg):
        res = LinkagePipeline(spark, cfg).run(docs)
        return {
            (r["doc_id_1"], r["doc_id_2"])
            for r in res.matches.select("doc_id_1", "doc_id_2").collect()
        }

    default = matched_pairs(LinkageConfig())
    assert ("d1", "d2") not in default          # CJK names deleted
    # and crucially NOT welded through sim('','')=1.0 either: with no
    # shared block key the pair is simply never generated
    assert not any("d1" in p or "d2" in p or "d3" in p for p in default)
    assert ("d4", "d5") in default              # Latin control links

    uni = matched_pairs(
        LinkageConfig(
            unicode_names=True,
            blocking=BlockingConfig(
                use_sorted_neighborhood=False,
                sn_window=0,
                use_qgram_name=True,
            ),
        )
    )
    assert ("d1", "d2") in uni                  # blocked + scored + linked
    assert ("d4", "d5") in uni                  # Latin path unaffected
    assert not any("d3" in p for p in uni)      # distinct CJK stays single
