#!/usr/bin/env python
"""Per-phase wall-clock decomposition of the end-to-end linkage job at
one parallelism level (same input construction as bench_scaling.py).

Each phase is materialized eagerly (localCheckpoint) so its wall time
is isolated; the sum is an upper bound on the fused pipeline (which
overlaps phases), but the per-phase ratios between core counts are
what we tune against.

Usage: python tools/profile_phases.py [cpus] [mult]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(cpus: int, mult: int) -> None:
    from bench_scaling import SF_DIR, _docs  # noqa: E402

    from record_linkage_ldu_spark.operators import rules
    from record_linkage_ldu_spark.operators.blocking import generate_candidates
    from record_linkage_ldu_spark.operators.cc import connected_components
    from record_linkage_ldu_spark.operators.scoring import (
        attach_pair_sides,
        score_pairs_self,
        with_combined_score,
    )
    from record_linkage_ldu_spark.config import SELF_COMPARE_FIELDS
    from record_linkage_ldu_spark.plans.linkage import (
        LinkageConfig,
        records_view,
    )
    from record_linkage_ldu_spark.session import build_session

    spark = build_session(app_name=f"rl-prof-{cpus}", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = LinkageConfig()

    docs = _docs(spark, SF_DIR, mult).localCheckpoint(eager=True)
    n_docs = docs.count()
    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        print(json.dumps({name: t[name]}), flush=True)
        return out

    min_width = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < min_width:
        docs = docs.repartition(2 * min_width)
    records = timed(
        "normalize",
        lambda: records_view(docs, cfg).localCheckpoint(eager=True),
    )
    pairs = timed(
        "candidates",
        lambda: generate_candidates(
            records,
            cfg.blocking,
            num_partitions=spark.sparkContext.defaultParallelism
            * cfg.score_partitions_per_core,
            materialize_keys=True,
        )[0].localCheckpoint(eager=True),
    )
    n_pairs = pairs.count()

    def _score():
        # pairs are already hash-partitioned to the scoring width by
        # generate_candidates (mirrors the pipeline)
        wide = attach_pair_sides(pairs, records, SELF_COMPARE_FIELDS)
        scored = score_pairs_self(wide, with_jw=cfg.with_jw)
        scored = with_combined_score(scored, mode="self")
        return rules.match(scored, mode="self").localCheckpoint(eager=True)

    matches = timed("score+rules", _score)
    n_matches = matches.count()
    clusters = timed(
        "cc",
        lambda: connected_components(
            matches.select("doc_id_1", "doc_id_2"),
            vertices=records.select("doc_id"),
            method=cfg.cc_method,
        ).localCheckpoint(eager=True),
    )
    n_clusters = clusters.select("cluster_id").distinct().count()

    print(
        json.dumps(
            {
                "cpus": cpus,
                "docs": n_docs,
                "pairs": n_pairs,
                "matches": n_matches,
                "clusters": n_clusters,
                "phases": t,
                "total": round(sum(t.values()), 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    main(cpus, mult)
