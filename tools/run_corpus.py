#!/usr/bin/env python
"""spark-submit entry point for the corpus-build pipeline.

Cluster usage (same --py-files packaging as run_linkage.py):

    python tools/package.py                       # -> dist/record_linkage_ldu_spark.zip
    spark-submit \
        --py-files dist/record_linkage_ldu_spark.zip \
        tools/run_corpus.py \
        --input  /data/documents          \
        --benchmark /data/eval_set        \
        --output /data/corpus_out         \
        --checkpoint-dir /data/corpus_ckpt

``--input`` is a ``documents(doc_id, text, lang, ...)`` table
(parquet path, or ``iceberg:<table>`` when a catalog is configured).
The job runs CorpusPipeline (clean flags -> near-dup keep list ->
decontaminate -> stratified sample -> token-budget shards) with every
stage checkpointed through StageStore, so re-submitting after a
mid-stage failure resumes.  Outputs: ``<output>/flags``, ``keep``,
``decon`` (with --benchmark), ``sampled``, ``shards`` parquet — the
shards table partitioned by ``shard_id`` so a data loader reads one
token-budgeted file set per shard.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents table (parquet path or iceberg:<table>)")
    ap.add_argument("--benchmark", default=None, help="eval-set table for decontamination (optional)")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--checkpoint-dir", default=None, help="StageStore dir (enables resume); default <output>/_stages")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=1_000_000)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--near-dup-threshold", type=float, default=0.3)
    ap.add_argument("--decon-min-shared", type=int, default=2)
    ap.add_argument("--sample-rate", type=float, default=1.0, help="default per-stratum keep rate")
    ap.add_argument("--sample-rates", default=None, help='JSON dict of per-stratum rates, e.g. \'{"en":0.5}\'')
    ap.add_argument("--shard-budget", type=int, default=100_000, help="tokens per output shard")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--master", default=None, help="Spark master for direct runs; leave unset under spark-submit")
    args = ap.parse_args(argv)

    from record_linkage_ldu_spark.plans.corpus import (
        CorpusConfig,
        CorpusPipeline,
    )
    from record_linkage_ldu_spark.session import build_session
    from record_linkage_ldu_spark.sources.io import StageStore

    spark = build_session(
        app_name="corpus-build",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )

    def _read(path: str):
        if path.startswith("iceberg:"):
            return spark.read.format("iceberg").load(path[len("iceberg:"):])
        return spark.read.parquet(path)

    documents = _read(args.input)
    benchmark = _read(args.benchmark) if args.benchmark else None

    cfg = CorpusConfig(
        lang=args.lang,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        min_quality=args.min_quality,
        near_dup_threshold=args.near_dup_threshold,
        decon_min_shared=args.decon_min_shared,
        sample_rates=json.loads(args.sample_rates) if args.sample_rates else {},
        sample_default_rate=args.sample_rate,
        shard_budget=args.shard_budget,
    )
    store = StageStore(spark, args.checkpoint_dir or f"{args.output}/_stages")
    res = CorpusPipeline(spark, cfg, store=store).run(documents, benchmark)

    res.flags.write.mode("overwrite").parquet(f"{args.output}/flags")
    res.keep.write.mode("overwrite").parquet(f"{args.output}/keep")
    if res.decon is not None:
        res.decon.write.mode("overwrite").parquet(f"{args.output}/decon")
    res.sampled.write.mode("overwrite").parquet(f"{args.output}/sampled")
    res.split.write.mode("overwrite").partitionBy("split").parquet(
        f"{args.output}/split"
    )
    res.weights.write.mode("overwrite").parquet(f"{args.output}/weights")
    res.shards.write.mode("overwrite").partitionBy("shard_id").parquet(
        f"{args.output}/shards"
    )

    from pyspark.sql import functions as F

    report = {
        "stages": res.stage_info,
        "flags_kept": res.flags.where(F.col("keep") == 1).count(),
        "flags_total": res.flags.count(),
        "near_dup_dropped": res.keep.where(F.col("keep") == 0).count(),
        "contaminated": (
            res.decon.where(F.col("contaminated") == 1).count()
            if res.decon is not None
            else None
        ),
        "sampled": res.sampled.count(),
        "shards": res.shards.agg(
            F.countDistinct("shard_id").alias("n")
        ).collect()[0]["n"],
    }
    print(json.dumps(report, indent=2, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
