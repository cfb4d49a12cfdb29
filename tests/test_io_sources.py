"""S1/S5 source+sink parity (SURVEY.md §2.1): ';'-delimited CSV scan
round-trips the reference's record-table shape; the presentation sink
exports one reviewable CSV file."""

import glob
import os

from record_linkage_ldu_spark.sources.io import (
    export_presentation_csv,
    read_delimited_csv,
)


def test_read_semicolon_csv(spark, tmp_path):
    p = tmp_path / "ldu.csv"
    p.write_text(
        "id;name;phone\n"
        "1;Acme Corp;555-0100\n"
        "2;Beta LLC;555-0101\n"
        "3;;\n"
    )
    df = read_delimited_csv(spark, str(p))
    assert df.columns == ["id", "name", "phone"]
    rows = {r["id"]: (r["name"], r["phone"]) for r in df.collect()}
    assert rows["1"] == ("Acme Corp", "555-0100")
    # empty cells -> NULL (the reference's NaN, SURVEY.md §1.1)
    assert rows["3"] == (None, None)
    # all-string schema: no inference scan, casts are explicit downstream
    assert all(t == "string" for _, t in df.dtypes)


def test_export_presentation_csv_single_file(spark, tmp_path):
    df = spark.createDataFrame(
        [("c1", "a1", "acme"), ("c1", "b1", "acme corp")],
        ["cluster_id", "doc_id", "name"],
    )
    out = str(tmp_path / "presentation")
    export_presentation_csv(df, out)
    parts = glob.glob(os.path.join(out, "part-*.csv"))
    assert len(parts) == 1  # one reviewable file (coalesce(1))
    text = open(parts[0]).read()
    assert text.splitlines()[0] == "cluster_id,doc_id,name"
    assert len(text.splitlines()) == 3
