"""Minimal OOXML sink tests: valid zip packaging, parseable XML parts, text
roundtrip, section/column structure, distributed per-conversation write."""

from __future__ import annotations

import io
import os
import xml.etree.ElementTree as ET
import zipfile

from paddleocr_spark.sinks.ooxml import (
    docx_bytes,
    table_span_to_xlsx,
    write_conversation_docx,
    xlsx_bytes,
)

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
S_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _doc_root(data: bytes):
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "word/document.xml"} <= names
        for n in names:  # every part must be well-formed XML
            ET.fromstring(z.read(n))
        return ET.fromstring(z.read("word/document.xml"))


def test_docx_paragraphs_and_title_bold():
    root = _doc_root(
        docx_bytes(
            [
                ("single", "title", "Heading <1>"),
                ("single", "para", "body & text"),
            ]
        )
    )
    texts = [t.text for t in root.iter(f"{W_NS}t")]
    assert "Heading <1>" in texts and "body & text" in texts  # escaped roundtrip
    first_p = root.find(f"{W_NS}body/{W_NS}p")
    assert first_p.find(f"{W_NS}r/{W_NS}rPr/{W_NS}b") is not None  # title bold


def test_docx_two_column_sections():
    root = _doc_root(
        docx_bytes(
            [
                ("double", "para", "left col"),
                ("double", "para", "right col"),
                ("single", "para", "full width"),
            ]
        )
    )
    cols = [c.get(f"{W_NS}num") for c in root.iter(f"{W_NS}cols")]
    # first section (the double run) has 2 columns, final section 1
    assert cols == ["2", "1"]


def test_docx_table_rendering():
    root = _doc_root(docx_bytes([("single", "table", "a | b\nc | d")]))
    tbl = root.find(f"{W_NS}body/{W_NS}tbl")
    assert tbl is not None
    rows = tbl.findall(f"{W_NS}tr")
    assert len(rows) == 2
    cells = [t.text for t in rows[0].iter(f"{W_NS}t")]
    assert cells == ["a", "b"]


def test_xlsx_roundtrip():
    data = xlsx_bytes([["x", "y"], ["1", "2 & 3"]])
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        for n in z.namelist():
            ET.fromstring(z.read(n))
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    vals = [t.text for t in sheet.iter(f"{S_NS}t")]
    assert vals == ["x", "y", "1", "2 & 3"]
    # pipe-format table span → same path
    data2 = table_span_to_xlsx("h1 | h2\nv1 | v2")
    with zipfile.ZipFile(io.BytesIO(data2)) as z:
        sheet2 = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    assert [t.text for t in sheet2.iter(f"{S_NS}t")] == ["h1", "h2", "v1", "v2"]


def test_write_conversation_docx_distributed(spark, tmp_path):
    """One .docx per conversation, written from executors; span text
    roundtrips in (turn_idx, span_idx) order."""
    from paddleocr_spark.corpus import generate_rows
    from paddleocr_spark.operators.extract import extract

    rows = list(generate_rows([(i, "alpha beta gamma delta") for i in range(4)]))
    out = str(tmp_path / "docx_out")
    ex = extract(spark.createDataFrame(rows))
    write_conversation_docx(ex, out)
    files = sorted(os.listdir(out))
    convs = sorted({r["conv_id"] for r in rows})
    assert files == [f"{c}.docx" for c in convs]
    # spot-check one: span texts appear in order
    conv = convs[0]
    got_rows = (
        ex.filter(f"conv_id = '{conv}'")
        .selectExpr("turn_idx", "posexplode(spans) AS (pos, s)")
        .selectExpr("turn_idx", "pos", "s.kind AS kind", "s.text AS text")
        .orderBy("turn_idx", "pos")
        .collect()
    )
    root = _doc_root(open(os.path.join(out, f"{conv}.docx"), "rb").read())
    texts = [t.text for t in root.iter(f"{W_NS}t") if t.text]
    # table spans render via w:tbl (cells, not one run) — check para spans
    # only (by kind: a one-row table span carries no newline, so a
    # newline heuristic would misclassify it); XML-invalid chars
    # (identity-decoded CID bytes from truncated real-PDFs) are sanitized
    # to U+FFFD by the sink, so compare post-sub
    from paddleocr_spark.sinks.ooxml import _XML_INVALID_RE

    for r in got_rows:
        if r.kind != "table":
            assert _XML_INVALID_RE.sub("�", r.text) in texts


def test_xml_invalid_chars_sanitized():
    """XML 1.0 forbids most control chars and lone surrogates; the sink
    replaces them with U+FFFD so every emitted part stays well-formed even
    when extracted text carries identity-decoded CID bytes."""
    import xml.etree.ElementTree as ET
    import zipfile as zf
    import io

    from paddleocr_spark.sinks.ooxml import docx_bytes, escape, xlsx_bytes

    hostile = "cid\x01\x00bytes \x0b\x1f ok\ttab\nnl \ud800 café"
    assert escape(hostile) == "cid��bytes �� ok\ttab\nnl � café"
    for blob, part in (
        (docx_bytes([("single", "para", hostile)]), "word/document.xml"),
        (xlsx_bytes([[hostile, "x"]]), "xl/worksheets/sheet1.xml"),
    ):
        with zf.ZipFile(io.BytesIO(blob)) as z:
            ET.fromstring(z.read(part))  # must parse
