"""Text normalization scalar functions.

Reference parity (SURVEY.md §2.7):
- entity decode + whitespace collapse ← recognition text normalization shape
  (/root/reference/ppocr/postprocess/rec_postprocess.py:172-226)
- ``strq2b`` full-width→half-width ← /root/reference/tools/end2end/eval_end2end.py:26-35
- style-token scrub ← /root/reference/ppstructure/predict_system.py:210-231

Each function exists twice: a pure-Python form (used inside Arrow batches and by
the golden oracle) and, where expressible, a Spark Column form built ONLY from
built-in ``pyspark.sql.functions`` so the hot path stays inside whole-stage
codegen.
"""

from __future__ import annotations

import html as _html
import re

_WS_RE = re.compile(r"\s+")
_STYLE_TAG_RE = re.compile(r"</?(?:b|i|em|strong|sub|sup|u)\s*/?>", re.IGNORECASE)
_SQUEEZE_RE = re.compile(r"\n{3,}")


def decode_entities(s: str) -> str:
    """HTML entity decode (named + numeric), NBSP → plain space."""
    return _html.unescape(s).replace("\xa0", " ")


# v30: invisible format characters stripped from rendered HTML text
# (SPEC §2.3). STRIP: soft hyphen U+00AD, zero-width space U+200B, LRM/RLM
# direction marks U+200E/U+200F, word joiner U+2060, ZWNBSP/BOM U+FEFF —
# all default-ignorable hyphenation/SEO/bidi artifacts that inflate
# extracted text and break exact dedup. DELIBERATELY KEPT: ZWNJ U+200C and
# ZWJ U+200D — linguistically load-bearing (Persian/Indic joining control,
# emoji ZWJ sequences). The oracle carries an independent set literal;
# content equality is gated by test.
_INVIS_RE = re.compile("[\u00ad\u200b\u200e\u200f\u2060\ufeff]")


def strip_invisible(s: str) -> str:
    """Remove invisible format characters (identity fast path on miss).

    ``str.isascii()`` is O(1) in CPython (a flag on the unicode object),
    and every stripped codepoint is non-ASCII — so the overwhelmingly
    common ASCII piece pays a single flag check, not a regex scan.
    """
    if s.isascii() or _INVIS_RE.search(s) is None:
        return s
    return _INVIS_RE.sub("", s)


def collapse_ws(s: str) -> str:
    """Collapse any whitespace run to a single space and strip.

    ``" ".join(s.split())`` is exactly equivalent to
    ``re.sub(r"\\s+", " ", s).strip()`` (Python's ``\\s`` and
    ``str.isspace`` agree on every codepoint — verified exhaustively) and
    ~3x faster, which matters: this runs once per text token in the
    extraction hot loop.
    """
    return " ".join(s.split())


def scrub_style_tags(s: str) -> str:
    """Strip inline style tokens ``<b> <i> <em> <strong> <sub> <sup> <u>``."""
    return _STYLE_TAG_RE.sub("", s)


def squeeze_newlines(s: str) -> str:
    """Squeeze runs of >=3 newlines to exactly two.

    Mirrors /root/reference/ppstructure/recovery/recovery_to_markdown.py:183-184.
    """
    return _SQUEEZE_RE.sub("\n\n", s)


_Q2B_TABLE = {0x3000: 0x20}
_Q2B_TABLE.update({c: c - 0xFEE0 for c in range(0xFF01, 0xFF5F)})


def strq2b(s: str) -> str:
    """Full-width → half-width normalization (eval_end2end.py:26-35)."""
    return s.translate(_Q2B_TABLE)


# ---------------------------------------------------------------------------
# Spark Column forms (built-in functions only; no UDF)
# ---------------------------------------------------------------------------

def scrub_style_tags_col(col):
    from pyspark.sql import functions as F

    return F.regexp_replace(col, r"</?(?:b|i|em|strong|sub|sup|u)\s*/?>", "")


def squeeze_newlines_col(col):
    from pyspark.sql import functions as F

    return F.regexp_replace(col, r"\n{3,}", "\n\n")


def collapse_ws_col(col):
    from pyspark.sql import functions as F

    return F.trim(F.regexp_replace(col, r"\s+", " "))


_Q2B_FROM = "　" + "".join(chr(c) for c in range(0xFF01, 0xFF5F))
_Q2B_TO = " " + "".join(chr(c - 0xFEE0) for c in range(0xFF01, 0xFF5F))


def strq2b_col(col):
    """Full-width → half-width as a single built-in ``translate`` call
    (eval_end2end.py:26-35 semantics, JVM-side)."""
    from pyspark.sql import functions as F

    return F.translate(col, _Q2B_FROM, _Q2B_TO)
