#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule: the same end-to-end
linkage job, on the SAME input, at two parallelism levels (local[N] vs
local[4N] — the sandbox stand-in for N vs 4N executor clusters per the
driver instruction), reporting docs/sec at both and the efficiency
``(throughput@4N / throughput@N) / 4``.

Each level runs in its own subprocess (one fresh JVM per level — a
stopped SparkSession leaves executor state behind otherwise).  The
input is ``synth_documents`` over MULT key-shifted copies of the
sf ``customer`` table: shifting custkeys creates NEW entities (same
duplicate-family density, more blocks), so the workload grows without
changing its shape.

Usage:
    python tools/bench_scaling.py                 # both levels + BENCH.md
    python tools/bench_scaling.py --measure 8     # one level, one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SPARK_GRAFT_SCALE_MULT", "6"))
LEVELS = (8, 32)
# NOT a multiple of the synth field moduli (100000 zip, 97 city,
# 51 state, 9999 address): an aligned shift would give every shifted
# entity copy the same zip/city/state as the original and create
# systematic cross-copy near-matches.
_KEY_SHIFT = 10_000_019


def _docs(spark, sf_dir: str, mult: int):
    from pyspark.sql import functions as F

    from record_linkage_ldu_spark.sources.synth import synth_documents

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    copies = [
        cust.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(i * _KEY_SHIFT)
        )
        for i in range(mult)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return synth_documents(out)


def measure(cpus: int) -> dict:
    from record_linkage_ldu_spark.plans.linkage import (
        LinkageConfig,
        LinkagePipeline,
    )
    from record_linkage_ldu_spark.session import build_session

    spark = build_session(
        app_name=f"rl-scaling-{cpus}", master=f"local[{cpus}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = _docs(spark, SF_DIR, MULT).localCheckpoint(eager=True)
    n_docs = docs.count()

    t0 = time.time()
    res = LinkagePipeline(spark, LinkageConfig()).run(docs)
    n_matches = res.matches.count()
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    wall = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "docs": n_docs,
        "matches": n_matches,
        "clusters": n_clusters,
        "wall_s": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
    }


def main() -> None:
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure", str(cpus)],
            capture_output=True,
            text=True,
            cwd=REPO,
            check=True,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(json.dumps(results[cpus]))

    lo, hi = results[LEVELS[0]], results[LEVELS[1]]
    assert lo["docs"] == hi["docs"] == lo["docs"], "input mismatch"
    assert (lo["matches"], lo["clusters"]) == (hi["matches"], hi["clusters"]), (
        "outputs differ between parallelism levels"
    )
    ratio = hi["docs_per_sec"] / lo["docs_per_sec"]
    eff = ratio / (LEVELS[1] // LEVELS[0])
    summary = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf_dir": SF_DIR,
        "mult": MULT,
        "levels": results,
        "speedup": round(ratio, 2),
    }
    print(json.dumps(summary))
    _write_bench_md(summary)


def _write_bench_md(s: dict) -> None:
    lo = s["levels"][LEVELS[0]]
    hi = s["levels"][LEVELS[1]]
    md = f"""# BENCH — throughput & scaling efficiency

North-rule evidence (N vs 4N executors; sandbox stand-in per driver
instruction: the same job + same input at `local[{LEVELS[0]}]` vs
`local[{LEVELS[1]}]`, one fresh JVM per level).

Job: full end-to-end linkage (span codec -> normalize -> multi-key
blocking + caps -> candidate pairs -> scoring -> rule masks ->
connected components), `LinkagePipeline` defaults.
Input: `synth_documents` over {s['mult']} key-shifted copies of
`{s['sf_dir']}/customer.parquet` — {lo['docs']:,} documents (shifted
custkeys = new entities, so duplicate-family density is unchanged).

| cores | wall (s) | docs/sec | matches | clusters |
|---|---|---|---|---|
| {LEVELS[0]} | {lo['wall_s']} | {lo['docs_per_sec']:,} | {lo['matches']:,} | {lo['clusters']:,} |
| {LEVELS[1]} | {hi['wall_s']} | {hi['docs_per_sec']:,} | {hi['matches']:,} | {hi['clusters']:,} |

* speedup {LEVELS[0]}→{LEVELS[1]} cores: **{s['speedup']}x**
* scaling efficiency `(thr@{LEVELS[1]} / thr@{LEVELS[0]}) / 4` = **{s['value']}** (gate: >= 0.8)
* outputs identical at both levels (matches + clusters asserted equal)

Reproduce: `python tools/bench_scaling.py`
(env: `SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_SCALE_MULT`).
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(f"wrote BENCH.md (efficiency {s['value']})")


if __name__ == "__main__":
    if "--measure" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--measure") + 1])
        print(json.dumps(measure(cpus)))
    else:
        main()
