#!/usr/bin/env python
"""Physical-plan invariant checks (.explain as a gate, not a vibe).

Asserts the plan properties the engine's scale story depends on:

  1. pair dedup fused with the scoring repartition = ONE exchange
     above the candidate union (no dedup shuffle + reshuffle);
  2. parquet scans under projection/filter push columns and predicates
     into the scan (ReadSchema pruned, PushedFilters non-empty);
  3. the linkage plan contains no CartesianProduct / BroadcastNestedLoop
     join anywhere (blocking must keep every join an equi-join);
  4. the record normalizers compile into WholeStageCodegen (no
     Python eval in the normalize projection);
  5. small-side joins (census caps, cluster mapping) broadcast.

Usage: python tools/check_plans.py [sf_dir]   (default sf0.001)
Exits non-zero on the first violated invariant.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAILURES: list[str] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    print(f"{'OK  ' if ok else 'FAIL'}  {name}" + (f" — {detail}" if detail and not ok else ""))
    if not ok:
        FAILURES.append(name)


def executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main(sf_dir: str) -> int:
    from pyspark.sql import functions as F

    from record_linkage_ldu_spark.operators.blocking import generate_candidates
    from record_linkage_ldu_spark.plans.linkage import (
        LinkageConfig,
        LinkagePipeline,
        records_view,
    )
    from record_linkage_ldu_spark.session import build_session
    from record_linkage_ldu_spark.sources.synth import synth_documents

    spark = build_session(app_name="plan-checks", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_documents(spark.read.parquet(f"{sf_dir}/customer.parquet"))
    cfg = LinkageConfig()
    records = records_view(docs, cfg)

    # 1. fused dedup: exactly one exchange between the pair union and
    # the dedup aggregate, an explicit REPARTITION_BY_NUM
    pairs, _ = generate_candidates(records, cfg.blocking, num_partitions=32)
    plan = executed_plan(pairs)
    top = plan.split("Union", 1)[0]
    n_exchanges = top.count("Exchange hashpartitioning(doc_id_1")
    check(
        "pair dedup single exchange",
        n_exchanges == 1 and "REPARTITION_BY_NUM" in top,
        f"exchanges above union: {n_exchanges}",
    )

    # 2. pushdown and pruning on a raw parquet scan
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity")
    )
    ep = optimized_explain(li)
    pushed = re.search(r"PushedFilters: \[[^\]]*GreaterThan\(l_quantity", ep)
    schema = re.search(r"ReadSchema: [^\n]*l_orderkey[^\n]*l_quantity", ep)
    wide_schema = re.search(r"ReadSchema: [^\n]*l_comment", ep)
    check("filter pushed to parquet scan", bool(pushed))
    check(
        "column pruning at scan",
        bool(schema) and not wide_schema,
        "scan reads more columns than the projection needs",
    )

    # 3-5. full linkage plan properties (scores stage carries the whole
    # chain: normalize -> keys -> join -> dedup -> sides -> kernels)
    res = LinkagePipeline(spark, cfg).run(docs)
    full = executed_plan(res.scores)
    check(
        "no cartesian/nested-loop joins in linkage plan",
        "CartesianProduct" not in full and "BroadcastNestedLoop" not in full,
    )
    # normalize: a single narrow projection straight over the scan —
    # no exchange, no Python eval.  (It is deliberately NOT whole-stage
    # codegen: the stopword filter is a lambda HOF, and the measured
    # codegen-capable alternative — a ~185-way regexp alternation —
    # runs 2.4x slower than the interpreted InSet probe; see
    # functions/normalizers.py.)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(f"{td}/docs")
        pdocs = spark.read.parquet(f"{td}/docs")
        narrow = executed_plan(
            records_view(pdocs, cfg).select("doc_id", "name", "phone")
        )
        check(
            "normalize is one narrow scan->project stage",
            "Exchange" not in narrow
            and "BatchEvalPython" not in narrow
            and "FileScan parquet" in narrow,
            narrow.strip().splitlines()[0][:100],
        )
    check(
        "no row-at-a-time Python eval in linkage plan",
        "BatchEvalPython" not in full,
    )
    check("census cap join broadcasts", "BroadcastHashJoin" in full)

    # 4b. every opt-in similarity kernel stays JVM-side when
    # kernels.jar is loadable — DL included (VERDICT r4 item 5: a cfg
    # routing the name field through DL refinement must not
    # re-introduce a Python worker into the scoring stage)
    from record_linkage_ldu_spark.functions.similarity import (
        dl_sim_col,
        jw_sim_col,
        ro_sim_col,
    )

    two = spark.createDataFrame(
        [("alpha", "aplha")], "a string, b string"
    )
    kplan = executed_plan(
        two.select(
            ro_sim_col(F.col("a"), F.col("b")),
            jw_sim_col(F.col("a"), F.col("b")),
            dl_sim_col(F.col("a"), F.col("b")),
        )
    )
    check(
        "RO/JW/DL kernels run as JVM UDFs (no ArrowEvalPython)",
        "ArrowEvalPython" not in kplan
        and "BatchEvalPython" not in kplan
        and "rlds_dl" in kplan,
        kplan.strip().splitlines()[0][:100],
    )

    # 6. incremental micro-batch: the new-keys side of the pair join is
    # broadcast, so the stored key table is never shuffled per batch
    # (a localCheckpointed new side has no size stats — without the
    # explicit hint Spark plans a sort-merge join that exchanges BOTH
    # sides, including the whole store).
    import tempfile as _tf

    from record_linkage_ldu_spark.streaming.incremental import (
        incremental_linkage_batch,
    )
    from record_linkage_ldu_spark.operators.blocking import (
        block_keys, candidate_pairs,
    )

    with _tf.TemporaryDirectory() as td:
        store = f"{td}/store"
        incremental_linkage_batch(
            spark, docs.where(F.substring("doc_id", 1, 1) == "a"), store
        )
        stored = spark.read.parquet(f"{store}/keys")
        new_keys = block_keys(
            records_view(
                docs.where(F.substring("doc_id", 1, 1) == "b"), cfg
            ),
            cfg.blocking,
        ).localCheckpoint(eager=True)
        inc_plan = executed_plan(
            candidate_pairs(F.broadcast(new_keys), stored, dedup=False)
        )
        check(
            "incremental pair join broadcasts the new side",
            "BroadcastHashJoin" in inc_plan
            and "SortMergeJoin" not in inc_plan,
        )
        check(
            "incremental store-side keys not shuffled",
            "Exchange hashpartitioning" not in inc_plan,
        )

    # 7. corpus family: the stratified-sample filter is scan-level (no
    # exchange — the draw is a pure per-row expression), and the
    # decontaminate benchmark side broadcasts (the corpus fp table
    # must never shuffle for the membership mark)
    from record_linkage_ldu_spark.operators import corpus as corpus_ops

    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    samp_plan = executed_plan(
        corpus_ops.stratified_sample(docs_tbl, rates={"en": 0.5})
    )
    check(
        "stratified sample is one scan-level filter (no exchange)",
        "Exchange" not in samp_plan and "FileScan parquet" in samp_plan,
    )
    decon_plan = executed_plan(
        corpus_ops.decontaminate(
            docs_tbl.where(F.col("doc_id") % 37 != 0),
            docs_tbl.where(F.col("doc_id") % 37 == 0),
        )
    )
    check(
        "decontaminate broadcasts the benchmark fingerprints",
        "BroadcastHashJoin" in decon_plan
        and "SortMergeJoin" not in decon_plan,
    )
    bloom_plan = executed_plan(
        corpus_ops.bloom_decontaminate(
            docs_tbl.where(F.col("doc_id") % 37 != 0),
            docs_tbl.where(F.col("doc_id") % 37 == 0),
        )
    )
    check(
        "bloom pre-filter probes via broadcast (no SMJ on positions)",
        bloom_plan.count("BroadcastHashJoin") >= 2  # bloom set + exact
        and "CartesianProduct" not in bloom_plan,
    )
    ld_plan = executed_plan(corpus_ops.line_dedup(docs_tbl))
    check(
        "line_dedup: equi-joins only, no cartesian/nested-loop",
        "CartesianProduct" not in ld_plan
        and "BroadcastNestedLoopJoin" not in ld_plan,
    )

    # r4 scorers/graph ops: the pair dot product and the wedge join
    # must stay keyed equi-joins; the only nested-loop allowed in
    # tfidf is the broadcast of the 1-row corpus count
    from record_linkage_ldu_spark.operators.cc import edge_corroboration
    from record_linkage_ldu_spark.operators.scoring import (
        monge_elkan_scores,
        tfidf_token_cosine,
    )

    # checkpoint the sample inputs: these ops reference their inputs
    # 3-5 times, and each reference would DUPLICATE the full
    # candidate-generation logical plan (Catalyst optimization is
    # super-linear in plan size — measured minutes of pure plan build
    # without the cut; the driver queries don't hit this because the
    # shared chain is persisted, which substitutes InMemoryRelation
    # at analysis time)
    recs_nm = records.select("doc_id", "name").localCheckpoint(eager=True)
    some_pairs = pairs.limit(1000).localCheckpoint(eager=True)
    tf_plan = executed_plan(tfidf_token_cosine(recs_nm, some_pairs))
    check(
        "tfidf cosine: keyed equi-joins + one broadcast 1-row N",
        "CartesianProduct" not in tf_plan
        and tf_plan.count("BroadcastNestedLoopJoin") <= 1,
        f"nested loops: {tf_plan.count('BroadcastNestedLoopJoin')}",
    )
    me_plan = executed_plan(
        monge_elkan_scores(recs_nm, some_pairs, pin=False)
    )
    check(
        "monge-elkan: token grid via equi-joins, no cartesian",
        "CartesianProduct" not in me_plan
        and "BroadcastNestedLoopJoin" not in me_plan,
    )
    ec_plan = executed_plan(
        edge_corroboration(some_pairs.select("doc_id_1", "doc_id_2"))
    )
    check(
        "edge corroboration: wedge join is keyed, no cartesian",
        "CartesianProduct" not in ec_plan
        and "BroadcastNestedLoopJoin" not in ec_plan,
    )
    from record_linkage_ldu_spark.operators.scoring import (
        group_linkage_scores,
        soft_tfidf_scores,
    )

    # production default pin=True: the weight table (whose build holds
    # the single 1-row-N broadcast) and the JW grid are materialized
    # once, so the final plan must be pure keyed equi-joins
    st_plan = executed_plan(soft_tfidf_scores(recs_nm, some_pairs))
    check(
        "soft-tfidf: weighted JW grid via equi-joins, no cartesian",
        "CartesianProduct" not in st_plan
        and "BroadcastNestedLoopJoin" not in st_plan,
        f"nested loops: {st_plan.count('BroadcastNestedLoopJoin')}",
    )
    from record_linkage_ldu_spark.operators.cc import star_clusters

    sc_plan = executed_plan(
        star_clusters(
            some_pairs.withColumn("score", F.lit(1.0)),
            vertices=recs_nm.select("doc_id"),
            pin=False,
        )
    )
    check(
        "star clustering: one pass, keyed joins, no cartesian",
        "CartesianProduct" not in sc_plan
        and "BroadcastNestedLoopJoin" not in sc_plan,
    )
    fake_groups = recs_nm.select(
        "doc_id", F.substring("doc_id", 2, 9).alias("group_id")
    )
    gl_plan = executed_plan(
        group_linkage_scores(
            some_pairs.withColumn("score", F.lit(1.0)),
            fake_groups,
            pin=False,
        )
    )
    check(
        "group linkage: membership joins keyed, no cartesian",
        "CartesianProduct" not in gl_plan
        and "BroadcastNestedLoopJoin" not in gl_plan,
    )

    # r4 late additions: dynamic refinement, prefix-filter join,
    # progressive schedule — all must stay keyed (no cartesian /
    # nested-loop) and JVM-side (no Python eval); the refinement's
    # oversized-key tier joins must broadcast (the set is bounded by
    # n / cap).
    from record_linkage_ldu_spark.operators.blocking import (
        refined_block_keys,
    )

    # pin the input: each refinement level references it from census +
    # anti + semi joins, so an unpinned normalize chain duplicates
    # ~3^levels in the plan (the OOM trap the operator docstring
    # warns about; driver queries pin via the records memo)
    rk_in = records.select(
        "doc_id",
        F.substring("name", 1, 1).alias("c1"),
        F.substring("name", 1, 4).alias("c2"),
        F.col("zip").alias("c3"),
    ).localCheckpoint(eager=True)
    rk, _left = refined_block_keys(
        rk_in,
        [F.col("c1"), F.col("c2"), F.col("c3")],
        max_block_size=16,
    )
    rk_plan = executed_plan(rk)
    check(
        "refined keys: oversized-key tier joins broadcast, no cartesian",
        "BroadcastHashJoin" in rk_plan
        and "CartesianProduct" not in rk_plan
        and "BatchEvalPython" not in rk_plan,
    )

    from record_linkage_ldu_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    docs_small = docs_tbl.limit(300).localCheckpoint(eager=True)
    pf_plan = executed_plan(
        prefix_filter_pairs(docs_small, threshold=0.8, pin=False)
    )
    check(
        "prefix filter: token/pair equi-joins only, no cartesian",
        "CartesianProduct" not in pf_plan
        and "BroadcastNestedLoopJoin" not in pf_plan
        and "BatchEvalPython" not in pf_plan,
    )

    from record_linkage_ldu_spark.operators.evaluate import (
        progressive_recall_curve,
    )

    keys_small = block_keys(records, cfg.blocking).localCheckpoint(
        eager=True
    )
    labels_small = some_pairs.withColumn("is_match", F.lit(True))
    pr_plan = executed_plan(
        progressive_recall_curve(keys_small, labels_small)
    )
    check(
        "progressive schedule: distributed rank, keyed joins, no cartesian",
        "CartesianProduct" not in pr_plan
        and "BroadcastNestedLoopJoin" not in pr_plan
        and "BatchEvalPython" not in pr_plan,
    )

    from record_linkage_ldu_spark.operators.blocking import (
        candidate_pairs,
        suffix_block_keys,
    )

    sx_plan = executed_plan(candidate_pairs(suffix_block_keys(records)))
    check(
        "suffix blocking: native explode + semi join, no cartesian, no Python",
        "CartesianProduct" not in sx_plan
        and "BroadcastNestedLoopJoin" not in sx_plan
        and "BatchEvalPython" not in sx_plan
        and ("LeftSemi" in sx_plan or "left_semi" in sx_plan),
    )

    from record_linkage_ldu_spark.operators.blocking import (
        canopy_assignments,
    )

    # pin=False exposes the raw join structure, so feed a CHECKPOINTED
    # leaf: toks fans out 4 ways and the pair set 3, i.e. ~12 copies
    # of whatever subplan sits upstream — with the live normalize
    # chain underneath, plan CONSTRUCTION alone OOMs the driver (the
    # same trap the refined-keys check documents; the operator's
    # pin=True default exists exactly for this)
    cp_in = records.select("doc_id", "name").localCheckpoint(eager=True)
    cp_plan = executed_plan(canopy_assignments(cp_in, pin=False))
    check(
        "canopy: token-keyed joins + anti-join centers, no cartesian, no Python",
        "CartesianProduct" not in cp_plan
        and "BroadcastNestedLoopJoin" not in cp_plan
        and "BatchEvalPython" not in cp_plan
        and "LeftAnti" in cp_plan,
    )

    from record_linkage_ldu_spark.operators.scoring import (
        value_specific_odds,
    )

    vso_plan = executed_plan(
        value_specific_odds(
            records, some_pairs, ("name", "zip"), pin=False
        )
    )
    # the ONLY nested-loop joins allowed are the 1-row scalar-stats
    # broadcasts (one per field); the value joins must stay equi-joins
    n_bnlj = vso_plan.count("BroadcastNestedLoopJoin")
    check(
        "value-specific odds: equi value joins, scalar-only broadcasts, no Python",
        "CartesianProduct" not in vso_plan
        and n_bnlj <= 2
        and "BatchEvalPython" not in vso_plan,
        f"nested-loop joins = {n_bnlj}",
    )

    # --- round-4 ops ---
    from record_linkage_ldu_spark.config import SELF_SCORE_FIELDS
    from record_linkage_ldu_spark.operators.blocking import blocking_plan
    from record_linkage_ldu_spark.operators.rules import review_queue
    from record_linkage_ldu_spark.operators.scoring import (
        match_explanations,
    )

    fake_scored = spark.createDataFrame(
        [("a", "b", 4.8, *([0.5] * len(SELF_SCORE_FIELDS)))],
        "doc_id_1 string, doc_id_2 string, score double, "
        + ", ".join(f"{f} double" for f in SELF_SCORE_FIELDS),
    ).localCheckpoint(eager=True)
    rq_plan = executed_plan(review_queue(fake_scored))
    check(
        "review queue: global top-k via TakeOrderedAndProject, no full sort, no Python",
        "TakeOrderedAndProject" in rq_plan
        and "BatchEvalPython" not in rq_plan
        and "Exchange rangepartitioning" not in rq_plan,
    )
    mx_plan = executed_plan(match_explanations(fake_scored))
    check(
        "match explanations: one narrow Generate, no shuffle, no Python",
        "Generate explode" in mx_plan
        and "Exchange" not in mx_plan
        and "BatchEvalPython" not in mx_plan,
    )
    fake_keys = spark.createDataFrame(
        [("d1", "aa:x"), ("d2", "aa:x"), ("d3", "bb:y")],
        "doc_id string, block_key string",
    ).localCheckpoint(eager=True)
    fake_lab = spark.createDataFrame(
        [("d1", "d2", True)], "doc_id_1 string, doc_id_2 string, is_match boolean"
    ).localCheckpoint(eager=True)
    bp_plan = executed_plan(
        blocking_plan(fake_keys, fake_lab, families=("aa", "bb"), pin=False)
    )
    # the ONLY nested-loop joins allowed are the two broadcast
    # mask-HISTOGRAM expansions (<= 2^k rows each); the pair-level
    # join must stay a block_key equi-join
    n_bnlj = bp_plan.count("BroadcastNestedLoopJoin")
    check(
        "blocking plan: subsets x histogram broadcasts only, pair join equi",
        "CartesianProduct" not in bp_plan
        and n_bnlj <= 2
        and "BatchEvalPython" not in bp_plan,
        f"nested loops: {n_bnlj}",
    )

    # temporal family: asof must compile to union+window (no join
    # node at all); the bucketed range join must stay an equi-join
    # (no cartesian / nested-loop fallback)
    from record_linkage_ldu_spark.operators.temporal import (
        asof_join,
        bucketed_range_join,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    asof_plan = executed_plan(
        asof_join(
            ev.where(F.col("event_type") == "purchase"),
            ev.where(F.col("event_type") == "click").select(
                "user_id", "ts", "value"
            ),
            on="user_id",
        )
    )
    check(
        "asof join: union + one window, no join node, no Python",
        "Join" not in asof_plan
        and "Window" in asof_plan
        and "BatchEvalPython" not in asof_plan,
    )
    iv = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL '30' MINUTE")).alias("end_ts"),
    )
    pt = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts", "value"
    )
    rj_plan = executed_plan(bucketed_range_join(iv, pt, on="user_id"))
    check(
        "bucketed range join: equi-join only, no cartesian, no Python",
        "CartesianProduct" not in rj_plan
        and "BroadcastNestedLoopJoin" not in rj_plan
        and "BatchEvalPython" not in rj_plan,
    )

    # r4c: mutual top-k sparsification — endpoint-keyed window + pair
    # groupBy only; the pair set is never squared and no Python eval
    from record_linkage_ldu_spark.operators.cc import topk_edge_sparsify

    edges = spark.createDataFrame(
        [("a", "b", 5.0), ("b", "c", 4.0)],
        "doc_id_1 string, doc_id_2 string, score double",
    )
    sp_plan = executed_plan(
        topk_edge_sparsify(edges, k=2, mode="mutual", pin=False)
    )
    check(
        "topk sparsify: window + agg, no cartesian, no Python",
        "Window" in sp_plan
        and "CartesianProduct" not in sp_plan
        and "BroadcastNestedLoopJoin" not in sp_plan
        and "BatchEvalPython" not in sp_plan,
    )

    # r4c: shingle novelty — parquet scan prunes to (doc_id, text);
    # payload columns (lang/source/n_chars) never leave the scan
    from record_linkage_ldu_spark.operators.corpus import shingle_novelty

    nov = shingle_novelty(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    nov_expl = optimized_explain(nov)
    import re as _re

    read_schemas = _re.findall(r"ReadSchema: struct<([^>]*)>", nov_expl)
    check(
        "shingle novelty: scan prunes to doc_id+text",
        bool(read_schemas)
        and all(
            set(
                c.split(":")[0] for c in rs.split(",") if c
            ) <= {"doc_id", "text"}
            for rs in read_schemas
        ),
        f"schemas={read_schemas}",
    )

    # r4c: mixture rebalance — probs side broadcast, corpus never
    # exchanged for the join
    from record_linkage_ldu_spark.operators.corpus import mixture_rebalance

    mr_plan = executed_plan(
        mixture_rebalance(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            targets={"en": 0.5, "fr": 0.5},
        )
    )
    check(
        "mixture rebalance: broadcast probs join, no Python",
        "BroadcastHashJoin" in mr_plan
        and "BatchEvalPython" not in mr_plan,
    )

    print(f"\n{len(FAILURES)} failures: {FAILURES}")
    spark.stop()
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raise SystemExit(main(sf))
