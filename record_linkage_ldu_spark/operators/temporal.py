"""Temporal join / rollup operators over event streams.

The reference pipeline is snapshot-shaped (one crawl, one linkage run),
but the corpus a 100 TB linkage engine feeds on is event-shaped:
crawl logs, ingest ledgers, user activity.  Three operators Spark's
DataFrame API lacks as primitives, each re-expressed as a composition
that keeps Catalyst in charge:

  * ``asof_join`` — for every left row, the latest right row at or
    before it (per key).  Implemented as union + one window pass:
    ONE shuffle on the key, NO join operator at all — the classic
    trick that beats any range-join strategy when both sides are
    large, because state per key is a single running value.
  * ``bucketed_range_join`` — points-in-intervals containment join.
    Intervals explode into fixed-width time buckets, points hash to
    their single bucket, and the match becomes an equi-join on
    (key, bucket) + an exact containment filter.  Shuffle width is
    controlled by the bucket width, never by interval length skew.
  * ``hypertable_rollup`` — TimescaleDB-style continuous aggregate:
    a fine-grain (hour) partial-aggregate table, with the coarse
    grain (day) re-aggregated FROM the fine partials rather than
    from raw events — the re-aggregation property (counts sum, sums
    sum, min-of-mins, max-of-maxes) is what lets a stored hourly
    rollup serve daily queries without touching the raw table.

Each operator has an exact DuckDB twin (``sql_*``) — DuckDB 1.0 has a
native ``ASOF JOIN``, which independently cross-checks the union+window
implementation.

Reference parity note: the reference (Tommer-R/Record-linkage-LDU) has
no temporal operators; these belong to the north-star "operations a
large-scale training-data pipeline needs" surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# ----------------------------------------------------------------------
# as-of join
# ----------------------------------------------------------------------


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    direction: str = "backward",
    suffix: str = "_asof",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the ``value_cols`` of the single
    ``right`` row with the greatest ``right_ts`` <= ``left_ts`` (per
    ``on`` key); ``direction="forward"`` flips to smallest >=.

    Ties (right_ts == left_ts) match, mirroring DuckDB/pandas ASOF
    ``>=`` semantics: the right side sorts before the left at equal
    timestamps, so a quote stamped exactly at the event time is
    visible to it.  Left rows with no prior right row keep NULLs
    (left-outer semantics).  ``tolerance_seconds`` (pandas
    ``merge_asof`` parity) nulls out matches farther than the window
    — a stale quote is no quote; applied as a post-window projection,
    so the plan shape is unchanged.

    Scale shape: union the two sides into one tagged stream, then a
    single running ``last(value, ignorenulls=True)`` window per key —
    one shuffle on ``on``, a sort within partitions, and O(1) state
    per key.  No join node exists in the plan, so there is no
    candidate-pair blowup for hot keys (a hot key costs one task's
    sort, not |L|x|R| probes).  At 100 TB both sides stream through
    the same exchange; compare with a range join, whose interval-
    bucketing must be re-tuned per skew profile.

    Output: all ``left`` columns + one ``<col><suffix>`` per value
    column + ``<right_ts><suffix>`` (the matched row's timestamp).
    """
    out_vals = [f"{c}{suffix}" for c in value_cols]
    matched_ts = f"{right_ts}{suffix}"

    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_payload"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(v)
          for c, v in zip(value_cols, out_vals)],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(matched_ts),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(v) for c, v in zip(value_cols, out_vals)],
        F.col(right_ts).alias(matched_ts),
    )
    stream = l_tag.unionByName(r_tag)

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ats").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ats").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:  # pragma: no cover - caller contract
        raise ValueError(f"direction must be backward|forward: {direction}")

    carried = stream.select(
        "_side",
        "_payload",
        *[F.last(v, ignorenulls=True).over(w).alias(v)
          for v in out_vals + [matched_ts]],
    )
    out = carried.where(F.col("_side") == 1).select(
        *[F.col(f"_payload.{c}").alias(c) for c in left.columns],
        F.col("_payload")[left_ts].alias("_lts"),
        *out_vals,
        matched_ts,
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_timestamp(F.col("_lts"))
            - F.unix_timestamp(F.col(matched_ts))
        )
        fresh = gap <= F.lit(int(tolerance_seconds))
        for c in out_vals + [matched_ts]:
            out = out.withColumn(c, F.when(fresh, F.col(c)))
    return out.drop("_lts")


def sql_asof_join(
    left_sql: str,
    right_sql: str,
    on: str,
    left_cols: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    suffix: str = "_asof",
) -> str:
    """DuckDB twin via the native ``ASOF LEFT JOIN`` — an independent
    engine's implementation of the same semantics, so the union+window
    plan is cross-checked rather than self-checked."""
    vals = ", ".join(
        f"r.{c} AS {c}{suffix}" for c in value_cols
    )
    lcols = ", ".join(f"l.{c}" for c in left_cols)
    return f"""
        SELECT {lcols}, {vals}, r.{right_ts} AS {right_ts}{suffix}
        FROM ({left_sql}) l
        ASOF LEFT JOIN ({right_sql}) r
          ON l.{on} = r.{on} AND l.{left_ts} >= r.{right_ts}
    """


# ----------------------------------------------------------------------
# bucketed range join
# ----------------------------------------------------------------------


def bucketed_range_join(
    intervals: DataFrame,
    points: DataFrame,
    on: str,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    ts_col: str = "ts",
    bucket_seconds: int = 1800,
) -> DataFrame:
    """Containment join: every (interval, point) pair with the same
    ``on`` key and ``start <= ts < end`` (half-open, the standard
    window convention).

    Scale shape: a naive theta-join is |I|x|P| per key.  Instead each
    interval explodes into the fixed-width epoch buckets it overlaps
    (``sequence`` — a narrow Generate), each point hashes to its one
    bucket, and the match is an equi-join on (key, bucket) + exact
    containment filter.  Each (interval, point) pair can meet in at
    most one bucket — the point owns exactly one — so no post-join
    dedup is needed.  Shuffle fan-out is interval_span/bucket_seconds
    rows per interval: pick ``bucket_seconds`` near the typical
    interval length so most intervals land in 1-2 buckets.  Intervals
    orders of magnitude longer than the width degrade to wide fan-out
    (never wrong, just wider) — re-bucket those few coarse, or cap
    span upstream.

    Output: all interval columns + all point columns (key column
    once).
    """
    w = int(bucket_seconds)
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / w).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn(
        "_b", (F.unix_timestamp(F.col(ts_col)) / w).cast("long")
    )
    pt_cols = [c for c in points.columns if c != on]
    joined = iv.join(pt, on=[on, "_b"], how="inner").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.select(*intervals.columns, *pt_cols)


def sql_bucketed_range_join(
    intervals_sql: str,
    points_sql: str,
    on: str,
    interval_cols: Sequence[str],
    point_cols: Sequence[str],
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin: the plain inequality join (exact semantics, fine
    at oracle scale — DuckDB plans it as an IEJoin)."""
    icols = ", ".join(f"i.{c}" for c in interval_cols)
    pcols = ", ".join(f"p.{c}" for c in point_cols if c != on)
    return f"""
        SELECT {icols}, {pcols}
        FROM ({intervals_sql}) i
        JOIN ({points_sql}) p
          ON i.{on} = p.{on}
         AND p.{ts_col} >= i.{start_col}
         AND p.{ts_col} <  i.{end_col}
    """


# ----------------------------------------------------------------------
# hypertable rollup (continuous aggregate)
# ----------------------------------------------------------------------


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    dim_col: str = "event_type",
    value_col: str = "value",
    fine: str = "hour",
    coarse: str = "day",
) -> DataFrame:
    """Two-grain time-bucketed rollup with the coarse grain
    re-aggregated FROM the fine partials (the TimescaleDB continuous-
    aggregate contract): raw events are scanned exactly once, at the
    fine grain; the day level reuses the hourly partial aggregates
    (count/sum/min/max all re-aggregate losslessly; avg is derived
    ``total/n`` at read time, never averaged-of-averages).

    At 100 TB this is the difference between one full scan + a tiny
    second agg over |hours|x|dims| rows, versus two full scans — and
    it is exactly how a stored hourly rollup table serves daily
    dashboards without touching raw data.  Both grains shuffle on
    (bucket, dim): low-cardinality dims ride on the high-cardinality
    time bucket, so there is no hot key.

    Output: one row per (grain, bucket_epoch, dim) with
    n / total / vmin / vmax / vavg.
    """
    fine_agg = (
        events.groupBy(
            F.date_trunc(fine, F.col(ts_col)).alias("_bucket"),
            F.col(dim_col).alias("dim"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(value_col).alias("total"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
    )
    coarse_agg = rollup_from_partials(fine_agg, coarse=coarse)
    def present(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.unix_timestamp("_bucket").alias("bucket_epoch"),
            "dim",
            "n",
            F.round("total", 4).alias("total"),
            F.round("vmin", 4).alias("vmin"),
            F.round("vmax", 4).alias("vmax"),
            # avg from the ROUNDED total: partial re-aggregation sums
            # floats in a different order than a single-pass engine,
            # and 1-ulp drift in total would flip avg's 6th decimal
            F.round(F.round("total", 4) / F.col("n"), 6).alias("vavg"),
        )
    return present(fine_agg, fine).unionByName(present(coarse_agg, coarse))


def rollup_from_partials(
    fine_agg: DataFrame,
    coarse: str = "day",
    bucket_col: str = "_bucket",
) -> DataFrame:
    """Re-aggregate a stored fine-grain partial table (columns
    ``bucket_col``/dim/n/total/vmin/vmax) to a coarser grain — the
    losless continuous-aggregate step (counts sum, sums sum,
    min-of-mins, max-of-maxes).  This is the function a day-grain
    query runs against the PERSISTED hourly rollup (batch or the
    streaming sink of :func:`streaming.incremental.
    hypertable_rollup_stream`) — raw events are never rescanned."""
    return (
        fine_agg.groupBy(
            F.date_trunc(coarse, F.col(bucket_col)).alias(bucket_col),
            "dim",
        )
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("total").alias("total"),
            F.min("vmin").alias("vmin"),
            F.max("vmax").alias("vmax"),
        )
    )


def sql_hypertable_rollup(
    table: str,
    ts_col: str = "ts",
    dim_col: str = "event_type",
    value_col: str = "value",
    fine: str = "hour",
    coarse: str = "day",
) -> str:
    """DuckDB twin — same partial-reaggregation structure; the hourly
    CTE is MATERIALIZED because the daily branch re-reads it (DuckDB
    1.0 inlines plain CTEs per reference)."""
    return f"""
        WITH fine_agg AS MATERIALIZED (
            SELECT date_trunc('{fine}', {ts_col}) AS _bucket,
                   {dim_col} AS dim,
                   CAST(count(*) AS BIGINT) AS n,
                   sum({value_col}) AS total,
                   min({value_col}) AS vmin,
                   max({value_col}) AS vmax
            FROM {table}
            GROUP BY 1, 2
        ),
        coarse_agg AS (
            SELECT date_trunc('{coarse}', _bucket) AS _bucket, dim,
                   CAST(sum(n) AS BIGINT) AS n,
                   sum(total) AS total,
                   min(vmin) AS vmin,
                   max(vmax) AS vmax
            FROM fine_agg
            GROUP BY 1, 2
        )
        SELECT '{fine}' AS grain,
               CAST(epoch(_bucket) AS BIGINT) AS bucket_epoch, dim, n,
               round(total, 4) AS total, round(vmin, 4) AS vmin,
               round(vmax, 4) AS vmax,
               round(round(total, 4) / n, 6) AS vavg
        FROM fine_agg
        UNION ALL
        SELECT '{coarse}' AS grain,
               CAST(epoch(_bucket) AS BIGINT) AS bucket_epoch, dim, n,
               round(total, 4) AS total, round(vmin, 4) AS vmin,
               round(vmax, 4) AS vmax,
               round(round(total, 4) / n, 6) AS vavg
        FROM coarse_agg
    """


# ----------------------------------------------------------------------
# temporal tables: SCD2 history + latest snapshot
# ----------------------------------------------------------------------


def scd2_history(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    tracked: Sequence[str] = ("value",),
    collapse_runs: bool = True,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    stream: one validity interval per (key, tracked-attribute version),
    ``valid_from`` inclusive, ``valid_to`` exclusive (NULL = current).
    With ``collapse_runs`` (the SCD2 contract) consecutive updates
    carrying an unchanged tracked tuple merge into one interval — only
    actual attribute changes open a new version.

    This is the inverse of :func:`asof_join`: asof reads "what was the
    value at time t", scd2 materializes the full interval table that
    answers every such question with a plain range predicate — the
    standard shape for a dimension snapshot a 100 TB fact stream joins
    against.

    Scale shape: one shuffle on ``key`` shared by both window passes
    (change-detection lag, then valid_to lead — Catalyst reuses the
    exchange for same-partitioning windows); no joins.  NULL-safe
    change detection: a tracked tuple moving to/from NULL opens a
    version.

    Output: (key, *tracked, valid_from, valid_to, version) with
    version numbering 1..n per key in time order.
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    cur = F.struct(*[F.col(c) for c in tracked])
    rows = df.select(key, ts_col, *tracked)
    if collapse_runs:
        rows = (
            rows.withColumn("_prev", F.lag(cur).over(w))
            .where(
                F.col("_prev").isNull() | ~F.col("_prev").eqNullSafe(cur)
            )
            .drop("_prev")
        )
    return (
        rows.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("version", F.row_number().over(w).cast("long"))
        .drop(ts_col)
        .select(key, *tracked, "valid_from", "valid_to", "version")
    )


def sql_scd2_history(
    source_sql: str,
    key: str,
    ts_col: str = "ts",
    tracked: Sequence[str] = ("value",),
) -> str:
    """DuckDB twin of :func:`scd2_history` (collapse_runs=True) —
    IS DISTINCT FROM on the tracked tuple is the NULL-safe change
    test; ``chg`` feeds two window passes -> MATERIALIZED."""
    tup = ", ".join(tracked)
    cols = ", ".join(tracked)
    return f"""
        WITH src AS MATERIALIZED ({source_sql}),
        chg AS MATERIALIZED (
            SELECT {key}, {ts_col}, {cols}
            FROM (
                SELECT *,
                       (ROW({tup}) IS DISTINCT FROM
                        lag(ROW({tup})) OVER w) AS _chg
                FROM src
                WINDOW w AS (PARTITION BY {key} ORDER BY {ts_col})
            )
            WHERE _chg
        )
        SELECT {key}, {cols},
               {ts_col} AS valid_from,
               lead({ts_col}) OVER w AS valid_to,
               CAST(row_number() OVER w AS BIGINT) AS version
        FROM chg
        WINDOW w AS (PARTITION BY {key} ORDER BY {ts_col})
    """


def latest_snapshot(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Current-state view of a change stream: the single latest row
    per key (the ``rn = 1`` compaction every CDC consumer runs before
    joining a mutable table).  ``tiebreak`` orders within equal
    timestamps (descending, like the timestamp) — pass the change
    sequence number when the stream carries one.

    Scale shape: one shuffle on ``key`` + a running-max filter; at
    extreme key cardinality this is the classic candidate for
    ``max_by``-style aggregation, but the window form keeps ALL
    columns without a struct repack and AQE handles moderate skew.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def sql_latest_snapshot(
    source_sql: str,
    key: str,
    ts_col: str = "ts",
    tiebreak: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`latest_snapshot`."""
    order = ", ".join(
        [f"{ts_col} DESC"] + [f"{c} DESC" for c in tiebreak]
    )
    return f"""
        SELECT * EXCLUDE (_rn) FROM (
            SELECT *, row_number() OVER (
                PARTITION BY {key} ORDER BY {order}
            ) AS _rn
            FROM ({source_sql})
        )
        WHERE _rn = 1
    """


# ----------------------------------------------------------------------
# gap filling (time_bucket_gapfill + locf)
# ----------------------------------------------------------------------


def gapfill(
    agg: DataFrame,
    bucket_col: str = "bucket_epoch",
    dim_col: str = "dim",
    step_seconds: int = 3600,
    count_cols: Sequence[str] = ("n",),
    locf_cols: Sequence[str] = ("total",),
) -> DataFrame:
    """Fill missing time buckets in an aggregate table (TimescaleDB's
    ``time_bucket_gapfill``): for each dim, emit EVERY bucket between
    that dim's first and last observed bucket; ``count_cols`` zero-fill
    (an absent bucket means zero events), ``locf_cols`` carry the last
    observed value forward (the gauge/level reading convention).
    ``is_gap`` marks synthesized rows — dashboards and downstream
    models must be able to tell measured zeros from filled ones.

    Scale shape: per-dim bounds reduce to |dims| rows; the bucket
    spine is a narrow ``sequence`` Generate off that tiny frame
    (span/step rows per dim, NOT per event); one left join on
    (dim, bucket) against the aggregate — at rollup grain, both sides
    are already small relative to raw events — and one locf window
    pass per dim.  Raw events are never touched: gapfill composes
    downstream of :func:`hypertable_rollup`'s partials.

    Output: (dim, bucket, *count_cols zero-filled, *locf_cols
    carried, is_gap).
    """
    step = int(step_seconds)
    bounds = agg.groupBy(dim_col).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    spine = bounds.select(
        dim_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))
        ).alias(bucket_col),
    )
    joined = spine.join(agg, on=[dim_col, bucket_col], how="left")
    w = (
        Window.partitionBy(dim_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    probe = count_cols[0] if count_cols else locf_cols[0]
    out = joined.withColumn("is_gap", F.col(probe).isNull())
    for c in count_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)).cast("long"))
    for c in locf_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.select(dim_col, bucket_col, *count_cols, *locf_cols, "is_gap")


def sql_gapfill(
    agg_sql: str,
    bucket_col: str = "bucket_epoch",
    dim_col: str = "dim",
    step_seconds: int = 3600,
    count_cols: Sequence[str] = ("n",),
    locf_cols: Sequence[str] = ("total",),
) -> str:
    """DuckDB twin of :func:`gapfill` — ``generate_series`` spine,
    same zero-fill/locf split; ``agg`` feeds bounds AND the join ->
    MATERIALIZED."""
    step = int(step_seconds)
    probe = count_cols[0] if count_cols else locf_cols[0]
    zero = ", ".join(
        f"CAST(coalesce(a.{c}, 0) AS BIGINT) AS {c}" for c in count_cols
    )
    locf = ", ".join(
        f"last_value(a.{c} IGNORE NULLS) OVER ("
        f"PARTITION BY s.{dim_col} ORDER BY s.{bucket_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {c}"
        for c in locf_cols
    )
    return f"""
        WITH agg AS MATERIALIZED ({agg_sql}),
        bounds AS (
            SELECT {dim_col}, min({bucket_col}) AS _lo,
                   max({bucket_col}) AS _hi
            FROM agg GROUP BY 1
        ),
        spine AS (
            SELECT {dim_col},
                   unnest(generate_series(_lo, _hi, {step}))
                       AS {bucket_col}
            FROM bounds
        )
        SELECT s.{dim_col}, s.{bucket_col}, {zero}, {locf},
               a.{probe} IS NULL AS is_gap
        FROM spine s
        LEFT JOIN agg a
          ON s.{dim_col} = a.{dim_col}
         AND s.{bucket_col} = a.{bucket_col}
    """
