from .sniff import sniff_kind, sniff_kind_col, PDF_MAGIC, PDF_REAL_MAGIC
from .textnorm import (
    decode_entities,
    strip_invisible,
    collapse_ws,
    scrub_style_tags,
    squeeze_newlines,
    strq2b,
    collapse_ws_col,
    scrub_style_tags_col,
    squeeze_newlines_col,
)
from .htmltok import html_blocks, BLOCK_TAGS, VOID_TAGS
from .pdflike import parse_pdflike, xy_cut, pdflike_spans

__all__ = [
    "sniff_kind",
    "sniff_kind_col",
    "PDF_MAGIC",
    "PDF_REAL_MAGIC",
    "decode_entities",
    "strip_invisible",
    "collapse_ws",
    "scrub_style_tags",
    "squeeze_newlines",
    "strq2b",
    "collapse_ws_col",
    "scrub_style_tags_col",
    "squeeze_newlines_col",
    "html_blocks",
    "BLOCK_TAGS",
    "VOID_TAGS",
    "parse_pdflike",
    "xy_cut",
    "pdflike_spans",
]
