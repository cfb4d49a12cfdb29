"""Per-row invariant (BASELINE.json input_hint): the span sequence
(kind, text, media_ref, order) of every document survives the pipeline
unchanged — derived fields live in new columns only."""

from pyspark.sql import functions as F

from record_linkage_ldu_spark.operators.spans import (
    extract_fields,
    normalize_fields,
    span_fingerprint,
)
from record_linkage_ldu_spark.plans.linkage import records_view


def test_span_sequence_survives_normalization(spark, tiny_gen):
    docs = tiny_gen.select("doc_id", "spans")
    before = docs.select("doc_id", span_fingerprint().alias("fp"))
    after_df = normalize_fields(extract_fields(docs))
    after = after_df.select("doc_id", span_fingerprint().alias("fp"))
    diff = (
        before.alias("b")
        .join(after.alias("a"), "doc_id")
        .where(F.col("b.fp") != F.col("a.fp"))
        .count()
    )
    assert diff == 0
    assert after_df.count() == docs.count()


def test_records_view_keeps_spans_column(spark, tiny_gen):
    rec = records_view(tiny_gen.select("doc_id", "spans"))
    assert "spans" in rec.columns
    # byte-identical spans via exceptAll on exploded struct fields
    orig = tiny_gen.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    kept = rec.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )
    assert orig.exceptAll(kept).count() == 0
    assert kept.exceptAll(orig).count() == 0


def test_media_spans_inert_but_preserved(spark, tiny_gen):
    docs = tiny_gen.select("doc_id", "spans")
    n_media_before = docs.select(
        F.explode("spans").alias("s")
    ).where("s.kind = 'media'").count()
    rec = records_view(docs)
    n_media_after = rec.select(
        F.explode("spans").alias("s")
    ).where("s.kind = 'media'").count()
    assert n_media_before == n_media_after > 0


def test_profile_fields_hand_computed(spark):
    """Fill rate counts '' and NULL as missing; distinct/length stats
    cover only filled values."""
    from record_linkage_ldu_spark.operators.spans import profile_fields

    records = spark.createDataFrame(
        [("d1", "alice", "a@x.com"), ("d2", "", None),
         ("d3", "bob", "a@x.com")],
        "doc_id string, name string, email string",
    )
    out = {r["field"]: r for r in profile_fields(records, ("name", "email")).collect()}
    nm = out["name"]
    assert (nm["n_rows"], nm["n_filled"], nm["n_distinct"]) == (3, 2, 2)
    assert nm["fill_rate"] == round(2 / 3, 6)
    assert (nm["avg_len"], nm["max_len"]) == (4.0, 5)
    em = out["email"]
    assert (em["n_filled"], em["n_distinct"], em["avg_len"], em["max_len"]) == (2, 1, 7.0, 7)
