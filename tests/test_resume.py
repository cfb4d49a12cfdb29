"""Checkpoint/resume (north rule): a killed run resumes from the last
complete stage; completed stages are NOT recomputed; output identical."""

import json
import os

from record_linkage_ldu_spark.plans.linkage import LinkagePipeline
from record_linkage_ldu_spark.sources.io import StageStore, input_fingerprint


def test_stage_store_resume_and_atomicity(spark, tmp_path):
    store = StageStore(spark, str(tmp_path / "stages"))
    df = spark.createDataFrame([(i,) for i in range(100)], ["v"])
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return df

    r1 = store.run_stage("s1", "fp-a", compute)
    assert not r1.resumed and calls["n"] == 1
    r2 = store.run_stage("s1", "fp-a", compute)
    assert r2.resumed and calls["n"] == 1  # no recompute
    assert sorted(x["v"] for x in r2.df.collect()) == list(range(100))
    # fingerprint change invalidates
    r3 = store.run_stage("s1", "fp-b", compute)
    assert not r3.resumed and calls["n"] == 2
    # manifest carries lineage metadata
    m = store.manifest("s1")
    assert m["status"] == "complete" and m["rows"] == 100
    assert store.metrics("s1") is not None


def test_incomplete_stage_is_recomputed(spark, tmp_path):
    """Simulated mid-write kill: data present but no complete manifest
    -> stage recomputes (atomic-rename commit semantics)."""
    store = StageStore(spark, str(tmp_path / "stages"))
    df = spark.createDataFrame([(1,)], ["v"])
    store.run_stage("s1", "fp", lambda: df)
    # corrupt: drop manifest status
    mpath = os.path.join(str(tmp_path / "stages"), "s1", "_stage_manifest.json")
    m = json.load(open(mpath))
    m["status"] = "writing"
    json.dump(m, open(mpath, "w"))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return df

    r = store.run_stage("s1", "fp", compute)
    assert not r.resumed and calls["n"] == 1


def test_pipeline_kill_resume_identical_output(spark, tiny_gen, tmp_path):
    """Run with checkpoints; 'kill' after the scores stage by wiping
    later stages; rerun -> early stages resumed (not recomputed),
    final clusters identical to a fresh full run."""
    docs = tiny_gen.select("doc_id", "spans")

    store = StageStore(spark, str(tmp_path / "ckpt"))
    full = LinkagePipeline(spark, store=store).run(docs)
    full_clusters = sorted(map(tuple, full.clusters.collect()))
    assert not full.stage_info["records"]["resumed"]

    # simulate mid-run failure: later stages lost, early stages intact
    store.clear("matches")
    store.clear("clusters")

    rerun = LinkagePipeline(spark, store=store).run(docs)
    assert rerun.stage_info["records"]["resumed"]
    assert rerun.stage_info["pairs"]["resumed"]
    assert rerun.stage_info["scores"]["resumed"]
    assert not rerun.stage_info["matches"]["resumed"]
    assert sorted(map(tuple, rerun.clusters.collect())) == full_clusters


def test_input_fingerprint_order_insensitive(spark):
    a = spark.createDataFrame([("x",), ("y",), ("z",)], ["doc_id"])
    b = spark.createDataFrame([("z",), ("x",), ("y",)], ["doc_id"])
    c = spark.createDataFrame([("x",), ("y",)], ["doc_id"])
    assert input_fingerprint(a, ["doc_id"]) == input_fingerprint(b, ["doc_id"])
    assert input_fingerprint(a, ["doc_id"]) != input_fingerprint(c, ["doc_id"])


def test_cross_pipeline_resume(spark, tiny_gen, tmp_path):
    """CrossLinkagePipeline under a StageStore: a second run resumes
    every stage (fingerprint covers BOTH inputs) and reproduces the
    clusters exactly; perturbing the right input invalidates resume."""
    from pyspark.sql import functions as F

    from record_linkage_ldu_spark.plans.linkage import (
        CrossLinkagePipeline,
        LinkageConfig,
    )

    docs = tiny_gen.select("doc_id", "spans")
    left = docs.where(F.col("doc_id").endswith("x0"))
    right = docs.where(~F.col("doc_id").endswith("x0"))

    store = StageStore(spark, str(tmp_path / "xstages"))
    r1 = CrossLinkagePipeline(spark, LinkageConfig(), store=store).run(
        left, right
    )
    c1 = sorted(map(tuple, r1.clusters.collect()))
    assert all(not v["resumed"] for k, v in r1.stage_info.items()
               if isinstance(v, dict))

    r2 = CrossLinkagePipeline(spark, LinkageConfig(), store=store).run(
        left, right
    )
    c2 = sorted(map(tuple, r2.clusters.collect()))
    assert c1 == c2
    assert all(v["resumed"] for k, v in r2.stage_info.items()
               if isinstance(v, dict))

    # a changed right-side input must invalidate the fingerprint
    r3 = CrossLinkagePipeline(spark, LinkageConfig(), store=store).run(
        left, right.limit(50)
    )
    assert not r3.stage_info["pairs"]["resumed"]


def test_cross_resume_is_side_sensitive(spark, tiny_gen, tmp_path):
    """Swapping the left/right arguments must NOT resume: the stages
    were computed with the opposite field orientation (a_<hw> fields
    vs b_<ldu> fields), so a side-blind fingerprint would silently
    serve stale scores.  The per-side concatenated fingerprint makes
    the swap a cache miss."""
    from pyspark.sql import functions as F

    from record_linkage_ldu_spark.plans.linkage import (
        CrossLinkagePipeline,
        LinkageConfig,
    )

    docs = tiny_gen.select("doc_id", "spans")
    left = docs.where(F.col("doc_id").endswith("x0"))
    right = docs.where(~F.col("doc_id").endswith("x0"))

    store = StageStore(spark, str(tmp_path / "swapstages"))
    CrossLinkagePipeline(spark, LinkageConfig(), store=store).run(left, right)
    swapped = CrossLinkagePipeline(spark, LinkageConfig(), store=store).run(
        right, left
    )
    assert all(
        not v["resumed"]
        for v in swapped.stage_info.values()
        if isinstance(v, dict)
    )


def test_one_fingerprint_job_per_run(spark, tiny_gen, tmp_path, monkeypatch):
    """The resume fingerprint is a full scan+agg of the input — the
    self pipeline must compute it ONCE per run (per-stage recomputation
    would cost 4 extra full input scans at 100TB); the cross pipeline
    once per side."""
    import record_linkage_ldu_spark.plans.linkage as L

    calls = {"n": 0}
    real_fp = input_fingerprint

    def counting_fp(df, cols):
        calls["n"] += 1
        return real_fp(df, cols)

    monkeypatch.setattr(L, "input_fingerprint", counting_fp)
    docs = tiny_gen.select("doc_id", "spans")
    store = StageStore(spark, str(tmp_path / "fpstages"))
    L.LinkagePipeline(spark, store=store).run(docs)
    assert calls["n"] == 1

    from pyspark.sql import functions as F

    calls["n"] = 0
    xstore = StageStore(spark, str(tmp_path / "fpxstages"))
    L.CrossLinkagePipeline(spark, store=xstore).run(
        docs.where(F.col("doc_id").endswith("x0")),
        docs.where(~F.col("doc_id").endswith("x0")),
    )
    assert calls["n"] == 2
