"""Payload-kind classifier (the textline-orientation classifier analog).

The reference routes crops through a cheap classifier before recognition
(/root/reference/tools/infer/predict_cls.py:39-137) and dispatches structure
regions on ``region["label"]`` (/root/reference/ppstructure/predict_system.py:161-179).
The engine's analog is a prefix+structure sniff on the payload:

    'pdf'      — starts with 'PDFLIKE v1' (the synthetic mini-format)
    'pdf_real' — starts with '%PDF-' (real byte-stream PDFs, SPEC §3b)
    'html'     — an HTML-looking tag within the first 4096 chars
    'plain'    — everything else

Exists in two equivalent forms: pure Python (kernel/oracle) and a Spark Column
expression using only built-ins, so routing stays in whole-stage codegen.
"""

from __future__ import annotations

import re

_HTML_SNIFF = (
    r"<\s*(?:!doctype|html|head|body|div|p|br|nav|article|main|section|header"
    r"|footer|aside|table|ul|ol|li|h[1-6]|span|a|b|i|em|strong|pre|code|title)\b"
)
_HTML_SNIFF_RE = re.compile(_HTML_SNIFF, re.IGNORECASE)

PDF_MAGIC = "PDFLIKE v1"
PDF_REAL_MAGIC = "%PDF-"


def sniff_kind(text) -> str:
    if text is None:
        return "plain"
    s = text.lstrip()
    if s.startswith(PDF_MAGIC):
        return "pdf"
    if s.startswith(PDF_REAL_MAGIC):
        return "pdf_real"
    if _HTML_SNIFF_RE.search(text[:4096]):
        return "html"
    return "plain"


def sniff_kind_col(col):
    """Spark Column form — identical decision procedure, built-ins only."""
    from pyspark.sql import functions as F

    head = F.substring(col, 1, 4096)
    return (
        F.when(col.isNull(), F.lit("plain"))
        .when(F.ltrim(col).startswith(PDF_MAGIC), F.lit("pdf"))
        .when(F.ltrim(col).startswith(PDF_REAL_MAGIC), F.lit("pdf_real"))
        .when(head.rlike("(?i)" + _HTML_SNIFF), F.lit("html"))
        .otherwise(F.lit("plain"))
    )
