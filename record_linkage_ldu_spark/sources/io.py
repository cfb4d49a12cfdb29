"""Table IO + stage checkpointing + per-partition lineage metrics.

The north rule requires every stage to persist per-partition lineage +
metrics and the pipeline to resume from checkpoint after a mid-stage
failure.  The reference gets a crude version of this from its pickle
artifacts between scripts (SURVEY.md §2.1 S4); here it is a first-class
layer:

  * ``StageStore`` writes each stage as Parquet (Iceberg ``writeTo``
    when a catalog is configured — same schemas either way; no Iceberg
    runtime jar ships in this sandbox) plus a JSON manifest
    ``{stage, fingerprint, rows, partitions, wall_s, status}``.
  * A stage whose manifest is ``complete`` AND whose input fingerprint
    matches is **loaded, not recomputed** — that is the resume path.
    Writes go to a temp location and are committed by atomic rename,
    so a kill mid-write never leaves a "complete" manifest.
  * ``partition_metrics`` records per-partition row counts
    (``spark_partition_id``) into ``<stage>_metrics`` — the lineage
    table used for skew diagnosis.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_stage_manifest.json"


def partition_metrics(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts — one narrow agg, no extra scan when
    chained before a write."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count("*").alias("rows"))
        .select(
            F.lit(stage).alias("stage"),
            F.col("_pid").alias("partition_id"),
            "rows",
        )
    )


@dataclass
class StageResult:
    df: DataFrame
    resumed: bool
    wall_s: float


class StageStore:
    """Directory-backed stage checkpoint store with atomic commit."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # ---------------- manifest helpers ----------------

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def manifest(self, stage: str) -> dict | None:
        path = os.path.join(self._stage_dir(stage), MANIFEST_NAME)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        m = self.manifest(stage)
        return (
            m is not None
            and m.get("status") == "complete"
            and m.get("fingerprint") == fingerprint
        )

    # ---------------- stage materialization ----------------

    def run_stage(
        self,
        stage: str,
        fingerprint: str,
        compute,
        repartition_by: list[str] | None = None,
        num_partitions: int | None = None,
    ) -> StageResult:
        """Materialize ``compute()`` under checkpoint semantics.

        Resume path: manifest complete + fingerprint match -> read the
        parquet back (no recompute).  Otherwise compute, write to
        ``<stage>.tmp``, write metrics, then atomically rename and
        stamp the manifest.
        """
        sdir = self._stage_dir(stage)
        if self.is_complete(stage, fingerprint):
            return StageResult(
                df=self.spark.read.parquet(os.path.join(sdir, "data")),
                resumed=True,
                wall_s=0.0,
            )

        t0 = time.time()
        df = compute()
        if repartition_by:
            df = df.repartition(
                *([num_partitions] if num_partitions else []),
                *[F.col(c) for c in repartition_by],
            )

        tmp = sdir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        out = self.spark.read.parquet(os.path.join(tmp, "data"))
        partition_metrics(out, stage).write.mode("overwrite").parquet(
            os.path.join(tmp, "metrics")
        )
        rows = out.count()
        wall = time.time() - t0
        with open(os.path.join(tmp, MANIFEST_NAME), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "fingerprint": fingerprint,
                    "rows": rows,
                    "partitions": out.rdd.getNumPartitions(),
                    "wall_s": round(wall, 3),
                    "status": "complete",
                },
                f,
                indent=2,
            )
        shutil.rmtree(sdir, ignore_errors=True)
        os.replace(tmp, sdir)
        return StageResult(
            df=self.spark.read.parquet(os.path.join(sdir, "data")),
            resumed=False,
            wall_s=wall,
        )

    def metrics(self, stage: str) -> DataFrame | None:
        p = os.path.join(self._stage_dir(stage), "metrics")
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def clear(self, stage: str | None = None) -> None:
        if stage is None:
            shutil.rmtree(self.base_dir, ignore_errors=True)
            os.makedirs(self.base_dir, exist_ok=True)
        else:
            shutil.rmtree(self._stage_dir(stage), ignore_errors=True)


def read_delimited_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ";",
    header: bool = True,
) -> DataFrame:
    """S1: the reference's record source is ';'-delimited CSV with a
    header row (pre_processing.py:114-115).  Everything is read as
    string — the reference coerces all cells to string-or-NaN anyway
    (SURVEY.md §1.1), and explicit casts downstream beat inference at
    scale (schema inference is an extra full scan)."""
    return (
        spark.read.option("delimiter", delimiter)
        .option("header", header)
        .option("inferSchema", False)
        .csv(path)
    )


def export_presentation_csv(df: DataFrame, path: str) -> None:
    """S5: single-file presentation export for human review — the
    Spark stand-in for the reference's Excel sink
    (main_ldu_hw.py:468-471; 'meant for easy manual examination',
    :99-102).  ``coalesce(1)`` funnels through one task: presentation
    tables are small (clusters, not pairs); big outputs should use the
    partitioned parquet sink via StageStore instead."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def export_grouped_presentation_csv(
    df: DataFrame,
    path: str,
    group_col: str = "cluster_id",
    order_col: str = "doc_id",
) -> None:
    """S5 fidelity variant: the reference's review workbook renders one
    cluster per visual group with a BLANK separator row between groups
    (main_ldu_hw.py:97-146,468-471 — groups_to_df appends an
    all-empty row after each group).  Reproduced here as a single-file
    CSV: real rows ordered by (group, member), one empty row after
    each group.

    Shape: separator rows are synthesized from the distinct group keys
    (one tiny aggregate), unioned, globally sorted on hidden
    (group, is_sep, member) keys, and funneled through one task —
    same small-presentation-table caveat as
    ``export_presentation_csv``; large outputs belong in the
    partitioned parquet sink."""
    cols = df.columns
    data = df.select(
        F.col(group_col).alias("_grp"),
        F.lit(0).alias("_sep"),
        *[F.col(c).cast("string").alias(c) for c in cols],
    )
    seps = (
        df.select(group_col)
        .distinct()
        .select(
            F.col(group_col).alias("_grp"),
            F.lit(1).alias("_sep"),
            *[F.lit("").alias(c) for c in cols],
        )
    )
    out = (
        data.unionByName(seps)
        .orderBy("_grp", "_sep", order_col)
        .drop("_grp", "_sep")
    )
    # emptyValue='' writes separator cells as truly empty (the
    # writer's default would quote them as "")
    out.coalesce(1).write.mode("overwrite").option("header", True).option(
        "emptyValue", ""
    ).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int = 64,
    bucket_col: str = "doc_id",
) -> None:
    """Persist a table hash-bucketed by ``bucket_col`` (Spark bucketed
    parquet; the Iceberg equivalent is a `bucket(N, col)` partition
    transform).

    At 100TB the records table is joined on doc_id over and over (pair
    side-attach reads it twice per run, presentation/evaluate joins
    read it again): bucketing pre-pays that shuffle ONCE at write
    time.  Joins against `spark.table(table)` then leave the bucketed
    side exchange-free — only the narrow pair-id side shuffles to the
    bucket count (see tests/test_io_sources.py's plan assertion).
    Sorting within buckets additionally enables sort-merge without a
    per-task sort for the common doc_id-ordered reads."""
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table)
    )


def input_fingerprint(df: DataFrame, cols: list[str]) -> str:
    """Order-insensitive content fingerprint of selected columns —
    cheap xor/count aggregate, used as the stage-resume key."""
    row = df.select(
        F.coalesce(
            F.bit_xor(F.xxhash64(*[F.col(c) for c in cols])), F.lit(0)
        ).alias("x"),
        F.count("*").alias("n"),
    ).collect()[0]
    return f"{row['n']}:{row['x']:x}"
