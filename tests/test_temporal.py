"""Temporal operators: as-of join, bucketed range join, hypertable
rollup — plus the FD profiler and unigram-LM scorer added alongside.

Each operator is checked against a naive same-semantics computation on
a deterministic synthetic frame (the oracle sweep independently
cross-checks against DuckDB's native ASOF JOIN / IEJoin at sf0.01).
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from record_linkage_ldu_spark.operators.temporal import (
    asof_join,
    bucketed_range_join,
    hypertable_rollup,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(0), value=10.0),
            Row(user_id=1, ts=_ts(10), value=20.0),
            Row(user_id=1, ts=_ts(20), value=30.0),
            Row(user_id=2, ts=_ts(5), value=99.0),
        ]
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            Row(event_id=100, user_id=1, ts=_ts(0)),    # tie: matches t=0
            Row(event_id=101, user_id=1, ts=_ts(15)),   # between: t=10
            Row(event_id=102, user_id=1, ts=_ts(25)),   # after all: t=20
            Row(event_id=103, user_id=2, ts=_ts(1)),    # before any: NULL
            Row(event_id=104, user_id=3, ts=_ts(1)),    # keyless: NULL
        ]
    )


def test_asof_backward(spark, quotes, trades):
    out = {
        r["event_id"]: (r["value_asof"], r["ts_asof"])
        for r in asof_join(trades, quotes, on="user_id").collect()
    }
    assert out[100] == (10.0, _ts(0))       # equal ts matches (>= semantics)
    assert out[101] == (20.0, _ts(10))
    assert out[102] == (30.0, _ts(20))
    assert out[103] == (None, None)         # no quote at-or-before
    assert out[104] == (None, None)         # key absent on right
    assert len(out) == 5                    # left-outer: every left row kept


def test_asof_forward(spark, quotes, trades):
    out = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(
            trades, quotes, on="user_id", direction="forward"
        ).collect()
    }
    # earliest quote at-or-after each trade
    assert out[100] == 10.0                 # tie matches forward too
    assert out[101] == 30.0                 # next quote is t=20
    assert out[102] is None                 # nothing after t=20
    assert out[103] == 99.0
    assert out[104] is None


def test_asof_no_join_node(spark, quotes, trades):
    plan = asof_join(trades, quotes, on="user_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan               # union + window only


def test_range_join_matches_naive(spark):
    base = dt.datetime(2024, 1, 1)
    iv = spark.createDataFrame(
        [
            Row(iv_id=i, k=i % 3,
                start_ts=base + dt.timedelta(minutes=7 * i),
                end_ts=base + dt.timedelta(minutes=7 * i + 11 + (i % 5)))
            for i in range(40)
        ]
    )
    pt = spark.createDataFrame(
        [
            Row(pt_id=j, k=j % 3,
                ts=base + dt.timedelta(minutes=3 * j, seconds=17 * j % 60))
            for j in range(80)
        ]
    )
    got = {
        (r["iv_id"], r["pt_id"])
        for r in bucketed_range_join(
            iv, pt, on="k", bucket_seconds=300
        ).collect()
    }
    naive = {
        (r["iv_id"], r["pt_id"])
        for r in iv.join(pt, "k")
        .where((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .collect()
    }
    assert got == naive and len(naive) > 30


def test_rollup_reaggregation_property(spark):
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            Row(ts=base + dt.timedelta(hours=h, minutes=m),
                event_type="ab"[h % 2], value=float(h * 60 + m))
            for h in range(50) for m in (0, 13, 47)
        ]
    )
    out = hypertable_rollup(ev)
    days = {
        (r["bucket_epoch"], r["dim"]): (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in out.where(F.col("grain") == "day").collect()
    }
    direct = {
        (r["b"], r["event_type"]): (r["n"], r["t"], r["mn"], r["mx"])
        for r in ev.groupBy(
            F.unix_timestamp(F.date_trunc("day", "ts")).alias("b"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("t"),
            F.round(F.min("value"), 4).alias("mn"),
            F.round(F.max("value"), 4).alias("mx"),
        )
        .collect()
    }
    # day grain computed FROM hour partials == day grain from raw
    assert days == direct
    n_hours = out.where(F.col("grain") == "hour").count()
    assert n_hours == 50  # one per (hour, single dim present that hour)


def test_profile_dependencies(spark):
    from record_linkage_ldu_spark.operators.spans import profile_dependencies

    rec = spark.createDataFrame(
        [
            Row(zip="1000", city="a", state="x"),
            Row(zip="1000", city="a", state="x"),
            Row(zip="2000", city="b", state="x"),
            Row(zip="2000", city="c", state="x"),   # zip->city violated
            Row(zip="2000", city="c", state="x"),
            Row(zip="", city="d", state="y"),       # empty lhs excluded
            Row(zip="3000", city=None, state="y"),  # null rhs excluded
        ]
    )
    out = {
        r["dep"]: r
        for r in profile_dependencies(
            rec, (("zip", "city"), ("city", "state"))
        ).collect()
    }
    zc = out["zip->city"]
    assert (zc["n_rows"], zc["n_groups"], zc["n_violating_groups"]) == (5, 2, 1)
    # g3: keep max-consensus per group -> 2 (zip=1000) + 2 (city=c) of 5
    assert zc["g3_strength"] == pytest.approx(4 / 5)
    assert not zc["holds"]
    cs = out["city->state"]
    assert cs["holds"] and cs["g3_strength"] == 1.0


def test_unigram_lm(spark):
    import math

    from record_linkage_ldu_spark.operators.corpus import unigram_lm_scores

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a b"),
            Row(doc_id=2, text="a c"),
            Row(doc_id=3, text=""),        # tokenless: excluded
        ]
    )
    out = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    assert set(out) == {1, 2}
    # N=5 tokens, V=3 types, add-1: p(a)=(3+1)/(5+3), p(b)=p(c)=(1+1)/8
    pa, pb = 4 / 8, 2 / 8
    exp1 = (2 * math.log(pa) + math.log(pb)) / 3
    assert out[1]["avg_logprob"] == pytest.approx(exp1, abs=1e-6)
    assert out[1]["n_tokens"] == 3
    # rarer tokens -> higher perplexity
    assert out[2]["perplexity"] > out[1]["perplexity"]


def test_scd2_collapse_and_nulls(spark):
    from record_linkage_ldu_spark.operators.temporal import scd2_history

    ev = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(0), v="a"),
            Row(k=1, ts=_ts(1), v="a"),     # unchanged: collapsed
            Row(k=1, ts=_ts(2), v="b"),
            Row(k=1, ts=_ts(3), v=None),    # -> NULL opens a version
            Row(k=1, ts=_ts(4), v=None),    # unchanged NULL: collapsed
            Row(k=1, ts=_ts(5), v="a"),     # back to a: new version
        ]
    )
    out = sorted(
        (r["version"], r["v"], r["valid_from"], r["valid_to"])
        for r in scd2_history(ev, "k", tracked=("v",)).collect()
    )
    assert out == [
        (1, "a", _ts(0), _ts(2)),
        (2, "b", _ts(2), _ts(3)),
        (3, None, _ts(3), _ts(5)),
        (4, "a", _ts(5), None),             # current version open-ended
    ]


def test_scd2_is_asof_inverse(spark, quotes):
    """Reading the SCD2 interval table at time t must equal the as-of
    join's answer at t (quotes have distinct values, so no collapsing
    ambiguity)."""
    from record_linkage_ldu_spark.operators.temporal import scd2_history

    hist = scd2_history(quotes, "user_id", tracked=("value",))
    probes = [(1, _ts(0)), (1, _ts(15)), (1, _ts(25)), (2, _ts(1)), (2, _ts(6))]
    pf = spark.createDataFrame([Row(user_id=k, at=t) for k, t in probes])
    via_hist = {
        (r["user_id"], r["at"]): r["value"]
        for r in pf.join(
            hist,
            (pf.user_id == hist.user_id)
            & (pf.at >= hist.valid_from)
            & (hist.valid_to.isNull() | (pf.at < hist.valid_to)),
            "left",
        ).select(pf.user_id, "at", "value").collect()
    }
    via_asof = {
        (r["user_id"], r["at"]): r["value_asof"]
        for r in asof_join(
            pf, quotes, on="user_id", left_ts="at"
        ).collect()
    }
    assert via_hist == via_asof and len(via_hist) == len(probes)


def test_latest_snapshot(spark):
    from record_linkage_ldu_spark.operators.temporal import latest_snapshot

    ev = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(0), seq=0, v="old"),
            Row(k=1, ts=_ts(9), seq=1, v="new"),
            Row(k=2, ts=_ts(5), seq=0, v="only"),
            Row(k=3, ts=_ts(7), seq=0, v="lo-seq"),
            Row(k=3, ts=_ts(7), seq=1, v="hi-seq"),  # tie -> tiebreak
        ]
    )
    out = {
        r["k"]: r["v"]
        for r in latest_snapshot(ev, "k", tiebreak=("seq",)).collect()
    }
    assert out == {1: "new", 2: "only", 3: "hi-seq"}


def test_gapfill_zero_locf_and_ranges(spark):
    from record_linkage_ldu_spark.operators.temporal import gapfill

    agg = spark.createDataFrame(
        [
            Row(dim="a", bucket_epoch=0, n=2, total=5.0),
            # gap at 60 and 120
            Row(dim="a", bucket_epoch=180, n=1, total=7.0),
            Row(dim="b", bucket_epoch=60, n=3, total=1.0),   # no gaps
        ]
    )
    out = {
        (r["dim"], r["bucket_epoch"]): (r["n"], r["total"], r["is_gap"])
        for r in gapfill(agg, step_seconds=60).collect()
    }
    assert out == {
        ("a", 0): (2, 5.0, False),
        ("a", 60): (0, 5.0, True),      # zero-filled count, locf total
        ("a", 120): (0, 5.0, True),
        ("a", 180): (1, 7.0, False),
        ("b", 60): (3, 1.0, False),     # b's range is just its one bucket
    }


def test_asof_tolerance(spark, quotes, trades):
    """merge_asof parity: matches staler than the tolerance are nulled
    (a stale quote is no quote); exact-tie matches survive (gap 0)."""
    out = {
        r["event_id"]: (r["value_asof"], r["ts_asof"])
        for r in asof_join(
            trades, quotes, on="user_id", tolerance_seconds=299
        ).collect()
    }
    assert out[100] == (10.0, _ts(0))       # gap 0: kept
    assert out[101] == (None, None)         # gap 300s > 299: stale, nulled
    assert out[102] == (None, None)         # gap 300s: nulled
    assert out[103] == (None, None)         # never matched
    assert len(out) == 5
    # inclusive boundary: gap 300s survives a 300s tolerance
    out300 = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(
            trades, quotes, on="user_id", tolerance_seconds=300
        ).collect()
    }
    assert out300[101] == 20.0 and out300[102] == 30.0


def test_rollup_stream_equals_batch(spark, tmp_path):
    """The streamed hourly partials (file source, two micro-batches,
    availableNow) equal the batch fine grain, and re-aggregating the
    streamed SINK yields the batch day grain — the continuous-
    aggregate refresh loop, both worlds interchangeable."""
    import os

    from record_linkage_ldu_spark.operators.temporal import (
        hypertable_rollup,
        rollup_from_partials,
    )
    from record_linkage_ldu_spark.streaming.incremental import (
        hypertable_rollup_stream,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i % 30, minutes=(i * 7) % 60),
         "ab"[i % 2], float(i))
        for i in range(400)
    ]
    schema = "event_id long, ts timestamp, event_type string, value double"
    events = spark.createDataFrame(rows, schema)

    src = tmp_path / "stream_in"
    os.makedirs(src)
    events.where(F.col("event_id") < 200).coalesce(1).write.parquet(
        str(src / "b0")
    )
    events.where(F.col("event_id") >= 200).coalesce(1).write.parquet(
        str(src / "b1")
    )
    # append mode only emits a window once the watermark passes its
    # end — the last real window needs LATER events to close it, and
    # watermark updates propagate with a one-batch lag, so two
    # far-future sentinel batches (excluded from the comparison)
    for i, days in enumerate((10, 11)):
        spark.createDataFrame(
            [(9000 + i, base + dt.timedelta(days=days), "zz", 0.0)], schema
        ).coalesce(1).write.parquet(str(src / f"b{2 + i}"))
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(str(src))
    q = (
        hypertable_rollup_stream(stream, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = spark.read.parquet(sink).where(F.col("dim") != "zz")
    # normalize the sink through the same re-agg a consumer runs
    merged = rollup_from_partials(streamed, coarse="hour")
    key = lambda r: (r["_bucket"], r["dim"])
    got = {key(r): (r["n"], round(r["total"], 4), r["vmin"], r["vmax"])
           for r in merged.collect()}
    batch_fine = hypertable_rollup(events).where(
        F.col("grain") == "hour"
    )
    want = {
        (dt.datetime.utcfromtimestamp(r["bucket_epoch"]), r["dim"]):
            (r["n"], r["total"], r["vmin"], r["vmax"])
        for r in batch_fine.collect()
    }
    assert got == want and len(want) > 25

    day_from_stream = {
        key(r): (r["n"], round(r["total"], 4))
        for r in rollup_from_partials(streamed, coarse="day").collect()
    }
    day_batch = {
        (dt.datetime.utcfromtimestamp(r["bucket_epoch"]), r["dim"]):
            (r["n"], r["total"])
        for r in hypertable_rollup(events).where(
            F.col("grain") == "day"
        ).collect()
    }
    assert day_from_stream == day_batch
