"""The reference's final artifact is a 3-sheet xlsx review workbook
(main_ldu_hw.py:468-471: sheets 'all' / 'verified' / 'not verified',
each a grouped presentation frame with blank separator rows).  These
tests open the emitted workbook with stdlib zipfile + ElementTree —
no Excel library on either side."""

import xml.etree.ElementTree as ET
import zipfile

from record_linkage_ldu_spark.sources.xlsx import (
    export_presentation_xlsx,
    grouped_sheet_rows,
    write_xlsx,
)

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _sheet_names(zf: zipfile.ZipFile) -> list[str]:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    return [s.get("name") for s in wb.iter(f"{NS}sheet")]


def _rows(zf: zipfile.ZipFile, part: str) -> list[list]:
    """Rows as lists of cell values (inline strings or numbers);
    an empty <row/> comes back as []."""
    ws = ET.fromstring(zf.read(part))
    out = []
    for row in ws.iter(f"{NS}row"):
        vals = []
        for c in row.iter(f"{NS}c"):
            if c.get("t") == "inlineStr":
                vals.append("".join(t.text or "" for t in c.iter(f"{NS}t")))
            else:
                v = c.find(f"{NS}v")
                vals.append(float(v.text) if v is not None else None)
        out.append(vals)
    return out


def test_workbook_structure_and_cells(tmp_path):
    path = str(tmp_path / "wb.xlsx")
    write_xlsx(
        path,
        [
            ("one", ["id", "score"], [["a & b", 1.5], [None, None], ["c<d>", 2]]),
            ("two", ["x"], [["y"]]),
        ],
    )
    with zipfile.ZipFile(path) as zf:
        assert zf.testzip() is None
        names = set(zf.namelist())
        assert {
            "[Content_Types].xml",
            "_rels/.rels",
            "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels",
            "xl/styles.xml",
            "xl/worksheets/sheet1.xml",
            "xl/worksheets/sheet2.xml",
        } <= names
        assert _sheet_names(zf) == ["one", "two"]
        rows = _rows(zf, "xl/worksheets/sheet1.xml")
        assert rows[0] == ["id", "score"]
        # xml-escaped strings round-trip; numbers are numeric cells
        assert rows[1] == ["a & b", 1.5]
        assert rows[2] == []  # all-blank separator row
        assert rows[3] == ["c<d>", 2.0]
        assert _rows(zf, "xl/worksheets/sheet2.xml") == [["x"], ["y"]]


def test_grouped_sheet_rows_blank_separators(spark):
    df = spark.createDataFrame(
        [
            ("c1", "a1", "acme"),
            ("c1", "b1", "acme corp"),
            ("c2", "a2", "beta"),
        ],
        ["cluster_id", "doc_id", "name"],
    )
    header, rows = grouped_sheet_rows(df)
    assert header == ["cluster_id", "doc_id", "name"]
    assert rows == [
        ["c1", "a1", "acme"],
        ["c1", "b1", "acme corp"],
        [None, None, None],
        ["c2", "a2", "beta"],
        [None, None, None],
    ]


def test_grouped_sheet_rows_refuses_bulk(spark):
    df = spark.range(10).selectExpr("'c' as cluster_id", "id as doc_id")
    import pytest

    with pytest.raises(ValueError, match="max_rows"):
        grouped_sheet_rows(df, max_rows=5)


def test_reference_three_sheet_workbook(spark, tmp_path):
    """End-to-end parity with main_ldu_hw.py:468-471: clusters split
    into verified / not-verified by label, rendered through
    presentation_view, one workbook with the reference's 3 sheets."""
    from record_linkage_ldu_spark.operators.evaluate import (
        presentation_view,
        separate_clusters,
    )

    clusters = spark.createDataFrame(
        [("a1", "c1"), ("b1", "c1"), ("a2", "c2"), ("b2", "c2")],
        ["doc_id", "cluster_id"],
    )
    docs = spark.createDataFrame(
        [("a1", "ldu"), ("b1", "hw"), ("a2", "ldu"), ("b2", "hw")],
        ["doc_id", "source"],
    )
    edges = spark.createDataFrame(
        [("a1", "b1"), ("a2", "b2")], ["doc_id_1", "doc_id_2"]
    )
    labeled = spark.createDataFrame(
        [("a1", "b1", True), ("a2", "b2", False)],
        ["doc_id_1", "doc_id_2", "is_match"],
    )
    verified, not_verified = separate_clusters(clusters, labeled)
    path = str(tmp_path / "matches.xlsx")
    export_presentation_xlsx(
        {
            "all": presentation_view(clusters, docs, edges),
            "verified": presentation_view(verified, docs, edges),
            "not verified": presentation_view(not_verified, docs, edges),
        },
        path,
    )
    with zipfile.ZipFile(path) as zf:
        assert _sheet_names(zf) == ["all", "verified", "not verified"]
        all_rows = _rows(zf, "xl/worksheets/sheet1.xml")
        # 4 members + 2 separators + header
        assert len(all_rows) == 7
        ver = _rows(zf, "xl/worksheets/sheet2.xml")
        nver = _rows(zf, "xl/worksheets/sheet3.xml")
        ver_ids = {r[0] for r in ver[1:] if r}
        nver_ids = {r[0] for r in nver[1:] if r}
        assert ver_ids == {"a1", "b1"}
        assert nver_ids == {"a2", "b2"}


def test_cell_references_keep_columns_aligned(tmp_path):
    """A None mid-row must NOT shift later cells left: every emitted
    cell carries its A1-style reference (r4 review fix)."""
    path = str(tmp_path / "align.xlsx")
    write_xlsx(
        path,
        [("s", ["id", "email", "score"], [["d1", None, 7.5]])],
    )
    with zipfile.ZipFile(path) as zf:
        ws = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
        rows = list(ws.iter(f"{NS}row"))
        data = {c.get("r"): c for c in rows[1].iter(f"{NS}c")}
        assert set(data) == {"A2", "C2"}  # B2 (email) absent, C intact
        assert data["C2"].find(f"{NS}v").text == "7.5"
        # header refs present too
        assert {c.get("r") for c in rows[0].iter(f"{NS}c")} == {
            "A1", "B1", "C1",
        }


def test_nonfinite_floats_written_as_text(tmp_path):
    path = str(tmp_path / "nan.xlsx")
    write_xlsx(path, [("s", ["v"], [[float("nan")], [float("inf")]])])
    with zipfile.ZipFile(path) as zf:
        rows = _rows(zf, "xl/worksheets/sheet1.xml")
    assert rows[1] == ["nan"] and rows[2] == ["inf"]


def test_sheet_name_validation_and_quote_escape(tmp_path):
    import pytest

    path = str(tmp_path / "names.xlsx")
    for bad in ("", "x" * 32, "a/b", "a[b]", "a*b"):
        with pytest.raises(ValueError):
            write_xlsx(path, [(bad, ["x"], [])])
    write_xlsx(path, [('say "hi"', ["x"], [["y"]])])
    with zipfile.ZipFile(path) as zf:
        assert _sheet_names(zf) == ['say "hi"']
