"""Minimal OOXML (ECMA-376) docx/xlsx writers — pure stdlib, no python-docx.

Reference parity (SURVEY.md §2.8 rows previously out of scope):
- ``docx_bytes``  ← ``convert_info_docx`` (/root/reference/ppstructure/
  recovery/recovery_to_doc.py:32-84): spans become Word paragraphs; runs of
  double-column regions get their own SECTION with ``<w:cols w:num="2"/>``
  (the reference flips section columns per region layout); titles render
  bold. Tables (pipe-format span text) become real ``<w:tbl>`` tables —
  the ``HtmlToDocx.handle_table`` analog (/root/reference/ppstructure/
  recovery/table_process.py).
- ``xlsx_bytes``  ← ``to_excel`` (/root/reference/ppstructure/table/
  predict_table.py:150-153, tablepyxl): a pipe-format table string becomes
  one worksheet with inline-string cells.

A .docx/.xlsx is a zip of XML parts; the minimal part sets below follow the
public ECMA-376 packaging conventions ([Content_Types].xml + _rels +
document/workbook). Writers are plain ``bytes`` functions usable from
``foreachPartition`` (each executor writes its conversations' files — no
driver collect); ``write_conversation_docx`` wires that up.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterable, List, Tuple
from xml.sax.saxutils import escape as _sax_escape

# XML 1.0 Char production: #x9 | #xA | #xD | [#x20-#xD7FF] | [#xE000-#xFFFD]
# | [#x10000-#x10FFFF]. Extracted text can legitimately carry other code
# points (e.g. identity-decoded CID bytes from a truncated real-PDF whose
# /ToUnicode CMap was cut off) — an OOXML part containing them is not
# well-formed, so the sink replaces each with U+FFFD at serialization.
_XML_INVALID_RE = re.compile(
    "[^\\x09\\x0A\\x0D\\x20-\\uD7FF\\uE000-\\uFFFD\\U00010000-\\U0010FFFF]"
)


def escape(text: str) -> str:
    return _sax_escape(_XML_INVALID_RE.sub("�", text))


_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>{overrides}</Types>'
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="{target}"/>'
    "</Relationships>"
)


def _zip_parts(parts: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, content in parts.items():
            z.writestr(name, content)
    return buf.getvalue()


def _w_par(text: str, bold: bool = False, sect: str = "") -> str:
    rpr = "<w:rPr><w:b/></w:rPr>" if bold else ""
    ppr = f"<w:pPr>{sect}</w:pPr>" if sect else ""
    return (
        f"<w:p>{ppr}<w:r>{rpr}"
        f'<w:t xml:space="preserve">{escape(text)}</w:t></w:r></w:p>'
    )


def _w_sect(cols: int) -> str:
    return f'<w:sectPr><w:cols w:num="{cols}"/></w:sectPr>'


def _w_table(pipe_text: str) -> str:
    rows = []
    for line in pipe_text.split("\n"):
        cells = "".join(
            f"<w:tc><w:p><w:r><w:t xml:space=\"preserve\">{escape(c.strip())}</w:t></w:r></w:p></w:tc>"
            for c in line.split(" | ")
        )
        rows.append(f"<w:tr>{cells}</w:tr>")
    return "<w:tbl>" + "".join(rows) + "</w:tbl>"


def docx_bytes(blocks: Iterable[Tuple[str, str, str]]) -> bytes:
    """blocks: (layout, kind, text) with layout ∈ {'single','double'} →
    one .docx. Consecutive same-layout runs share a section; a layout flip
    closes the section with the PREVIOUS run's column count (sectPr inside a
    paragraph, per OOXML sectioning), mirroring convert_info_docx's
    per-region single/double handling."""
    body: List[str] = []
    runs: List[Tuple[str, List[Tuple[str, str]]]] = []
    for layout, kind, text in blocks:
        layout = "double" if layout == "double" else "single"
        if runs and runs[-1][0] == layout:
            runs[-1][1].append((kind, text))
        else:
            runs.append((layout, [(kind, text)]))
    for i, (layout, items) in enumerate(runs):
        for kind, text in items:
            if kind == "table":
                body.append(_w_table(text))
            else:
                body.append(_w_par(text, bold=(kind == "title")))
        if i < len(runs) - 1:  # section break carrying THIS run's layout
            body.append(_w_par("", sect=_w_sect(2 if layout == "double" else 1)))
    final_cols = 2 if (runs and runs[-1][0] == "double") else 1
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>'
        + "".join(body)
        + _w_sect(final_cols)
        + "</w:body></w:document>"
    )
    return _zip_parts(
        {
            "[Content_Types].xml": _CT.format(
                overrides='<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            ),
            "_rels/.rels": _RELS.format(target="word/document.xml"),
            "word/document.xml": doc,
        }
    )


def xlsx_bytes(rows: Iterable[Iterable[str]]) -> bytes:
    """rows of cell strings → one .xlsx worksheet (inline strings)."""
    xml_rows = []
    for r, cells in enumerate(rows, start=1):
        cs = "".join(
            f'<c t="inlineStr"><is><t xml:space="preserve">{escape(str(c))}</t></is></c>'
            for c in cells
        )
        xml_rows.append(f'<row r="{r}">{cs}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(xml_rows) + "</sheetData></worksheet>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    return _zip_parts(
        {
            "[Content_Types].xml": _CT.format(
                overrides=(
                    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
                    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
                )
            ),
            "_rels/.rels": _RELS.format(target="xl/workbook.xml"),
            "xl/workbook.xml": wb,
            "xl/_rels/workbook.xml.rels": wb_rels,
            "xl/worksheets/sheet1.xml": sheet,
        }
    )


def table_span_to_xlsx(pipe_text: str) -> bytes:
    """table-kind span text (pipe format) → .xlsx bytes (to_excel analog)."""
    return xlsx_bytes([line.split(" | ") for line in pipe_text.split("\n")])


def write_conversation_docx(df, out_dir: str) -> None:
    """Extraction output → one .docx per conversation, written from the
    EXECUTORS (foreachPartition; out_dir must be a shared filesystem — the
    same contract as any distributed file sink). Spans order within a turn
    and turns within a conversation follow (turn_idx, span_idx)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    per_conv = (
        df.select("conv_id", "turn_idx", F.posexplode("spans").alias("pos", "s"))
        .select(
            "conv_id",
            "turn_idx",
            "pos",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
        )
        .repartition("conv_id")
        .sortWithinPartitions("conv_id", "turn_idx", "pos")
    )

    def write_part(rows):
        cur = None
        blocks: List[Tuple[str, str, str]] = []

        def emit():
            if cur is not None:
                path = os.path.join(out_dir, f"{cur}.docx")
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(docx_bytes(blocks))
                os.replace(tmp, path)

        for r in rows:
            if r.conv_id != cur:
                emit()
                cur = r.conv_id
                blocks = []
            blocks.append(("single", r.kind, r.text))
        emit()

    per_conv.foreachPartition(write_part)
