"""Resumable corpus-build plan: the training-data flow around the
operators/corpus.py + operators/dedup.py families, under the same
StageStore checkpoint/resume contract as the linkage pipelines.

    clean flags -> near-dup keep list -> decontaminate ->
    stratified sample -> token-budget shards

Every stage writes atomically with per-partition lineage metrics and
resumes against ONE content fingerprint per input side (corpus and
benchmark fingerprinted separately — swapping the benchmark must be a
cache miss for the decontaminate stage and everything after it, while
the upstream cleaning stages, which never see the benchmark, still
resume).  This mirrors the cross-linkage pipeline's per-side
fingerprint rule (plans/linkage.py).

At 100TB each stage boundary is a parquet table a failed run resumes
from — the flags and keep-list scans (the expensive full-corpus
passes) are never recomputed because a later stage died.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus import (
    leakage_safe_split,
    corpus_filter_flags,
    decontaminate,
    stratified_sample,
    token_budget_shards,
)
from ..operators.dedup import dedup_weights, near_duplicate_keep_list
from ..sources.io import StageStore, input_fingerprint


@dataclass
class CorpusConfig:
    # cleaning gates (corpus_filter_flags)
    lang: str = "en"
    min_tokens: int = 5
    max_tokens: int = 1_000_000
    min_quality: float = 0.3
    # near-dup keep list (MinHash family)
    near_dup_threshold: float = 0.3
    # decontamination
    decon_min_shared: int = 2
    # sampling
    sample_rates: dict = field(default_factory=dict)
    sample_default_rate: float = 1.0
    sample_seed: str = "strat"
    strata_col: str = "lang"
    # sharding
    shard_budget: int = 100_000
    # leakage-safe split (cluster-atomic; fractions sum to 1)
    split_fractions: tuple = (("train", 0.90), ("valid", 0.05), ("test", 0.05))
    split_seed: str = "split"
    # soft-dedup sampling weights (1/cluster_size^alpha)
    weight_alpha: float = 1.0


@dataclass
class CorpusResult:
    flags: DataFrame
    keep: DataFrame
    decon: DataFrame | None
    sampled: DataFrame
    shards: DataFrame
    split: DataFrame
    weights: DataFrame
    stage_info: dict


class CorpusPipeline:
    """End-to-end corpus build.  ``benchmark=None`` skips the
    decontaminate stage (and its fingerprint side)."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: CorpusConfig | None = None,
        store: StageStore | None = None,
    ):
        self.spark = spark
        self.cfg = cfg or CorpusConfig()
        self.store = store

    def run(
        self, documents: DataFrame, benchmark: DataFrame | None = None
    ) -> CorpusResult:
        cfg = self.cfg
        info: dict = {}

        # one fingerprint job per input side (full scan+agg — resume
        # keys, not per-stage recomputation)
        fp = (
            input_fingerprint(documents, ["doc_id"])
            if self.store is not None
            else ""
        )
        bfp = (
            input_fingerprint(benchmark, ["doc_id"])
            if self.store is not None and benchmark is not None
            else ""
        )

        flags = self._stage(
            "flags",
            lambda: corpus_filter_flags(
                documents,
                lang=cfg.lang,
                min_tokens=cfg.min_tokens,
                max_tokens=cfg.max_tokens,
                min_quality=cfg.min_quality,
            ),
            info,
            fp,
        )

        # near-dup keep list over the documents that SURVIVE cleaning:
        # shingling the rejected docs would be wasted candidate work,
        # and a near-dup family whose canonical was rejected should
        # re-canonicalize among the survivors
        def _keep() -> DataFrame:
            clean_ids = flags.where(F.col("keep") == 1).select("doc_id")
            clean_docs = documents.join(clean_ids, "doc_id", "left_semi")
            return near_duplicate_keep_list(
                clean_docs, threshold=cfg.near_dup_threshold
            )

        keep = self._stage("keep", _keep, info, fp)

        kept_docs = documents.join(
            keep.where(F.col("keep") == 1).select("doc_id"),
            "doc_id",
            "left_semi",
        )

        decon = None
        if benchmark is not None:
            # benchmark fingerprint joins the resume key: swapping the
            # eval set re-runs this stage and everything downstream
            decon = self._stage(
                "decon",
                lambda: decontaminate(
                    kept_docs, benchmark, min_shared=cfg.decon_min_shared
                ),
                info,
                f"{fp}|{bfp}",
            )
            ok_ids = decon.where(F.col("contaminated") == 0).select("doc_id")
            kept_docs = kept_docs.join(ok_ids, "doc_id", "left_semi")

        final_docs = kept_docs
        sampled = self._stage(
            "sampled",
            lambda: stratified_sample(
                final_docs,
                strata_col=cfg.strata_col,
                rates=cfg.sample_rates,
                default_rate=cfg.sample_default_rate,
                seed=cfg.sample_seed,
            ),
            info,
            f"{fp}|{bfp}",
        )

        # token_budget_shards runs eager plan-build jobs (count + the
        # bounds sample) — the thunk form means a resumed run never
        # pays them (the _stage is_complete check short-circuits)
        shards = self._stage(
            "shards",
            lambda: token_budget_shards(
                documents.join(sampled.select("doc_id"), "doc_id", "left_semi"),
                budget=cfg.shard_budget,
            ),
            info,
            f"{fp}|{bfp}",
        )

        # leakage-safe split over the docs that made the final cut:
        # the draw keys on the near-dup CLUSTER id (the keep stage),
        # so near-duplicates never straddle train/test even when both
        # survived the keep list (threshold misses, soft-dedup runs)
        split = self._stage(
            "split",
            lambda: leakage_safe_split(
                final_docs.join(
                    sampled.select("doc_id"), "doc_id", "left_semi"
                ),
                keep,
                splits=tuple(cfg.split_fractions),
                seed=cfg.split_seed,
            ),
            info,
            f"{fp}|{bfp}",
        )
        # soft-dedup weights: the alternative to (or refinement of)
        # the hard keep filter — downstream samplers multiply by
        # 1/cluster_size^alpha so every near-dup family contributes
        # one doc of training mass
        weights = self._stage(
            "weights",
            lambda: dedup_weights(keep, alpha=cfg.weight_alpha),
            info,
            fp,
        )
        return CorpusResult(
            flags=flags,
            keep=keep,
            decon=decon,
            sampled=sampled,
            shards=shards,
            split=split,
            weights=weights,
            stage_info=info,
        )

    def _stage(self, name: str, thunk, info: dict, fp: str) -> DataFrame:
        """Materialize ``thunk()`` under checkpoint semantics.  The
        thunk is only INVOKED when the stage must compute — builders
        with eager plan-build jobs (token_budget_shards' count/sample,
        the keep list's census pins) cost nothing on a resumed run."""
        if self.store is None:
            return thunk()
        res = self.store.run_stage(name, fp, thunk)
        info[name] = {"resumed": res.resumed, "wall_s": res.wall_s}
        return res.df
