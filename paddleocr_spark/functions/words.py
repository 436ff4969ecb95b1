"""Word-level scalar functions: segmentation, RTL reorder.

Reference parity (SURVEY.md §2.7):

- ``word_segments``  ← the ``get_word_info`` grouping state machine
  (/root/reference/ppocr/postprocess/rec_postprocess.py:101-170): classify
  each char as cjk / en-num / splitter, group maximal runs, where a splitter
  char (space & punctuation) closes the current word. Apostrophes, hyphens
  and decimal points BETWEEN en-num chars keep the word together (the French
  contraction / "l'été" cases covered by
  /root/reference/tests/test_french_accents.py:28-60).
- ``pred_reverse`` ← RTL re-ordering (rec_postprocess.py:82-96): latin/digit
  runs stay intact as units, everything else splits; unit order reverses.
  Exists as pure Python and as a built-ins-only Column form.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import pandas as pd  # module-level so pandas-UDF type hints resolve

_EN_NUM = re.compile(r"[a-zA-Z0-9À-ɏ]")  # latin incl. accented
_CJK = re.compile(r"[一-鿿㐀-䶿]")
_JOINERS = set("'’-.")

RTL_UNIT = r"[a-zA-Z0-9]+|\S"


def word_segments(text: str) -> List[Tuple[str, int, int]]:
    """→ [(word, start, end)] with character offsets, get_word_info-style.

    A joiner (' ’ - .) glues two en-num chars into one word; CJK chars are
    one word each; any other char is a splitter."""
    words: List[Tuple[str, int, int]] = []
    start = None
    n = len(text)
    for i, ch in enumerate(text):
        if _EN_NUM.match(ch):
            if start is None:
                start = i
            continue
        if ch in _JOINERS and start is not None and i + 1 < n and _EN_NUM.match(text[i + 1]):
            continue  # internal joiner: l'été, state-of-the-art, 3.14
        if start is not None:
            words.append((text[start:i], start, i))
            start = None
        if _CJK.match(ch):
            words.append((ch, i, i + 1))
    if start is not None:
        words.append((text[start:], start, n))
    return words


def pred_reverse(pred: str) -> str:
    """RTL re-order: reverse the unit sequence, units joined by single space
    (rec_postprocess.py:82-96 semantics)."""
    return " ".join(reversed(re.findall(RTL_UNIT, pred)))


def pred_reverse_col(col):
    """Column form — built-ins only (regexp_extract_all + reverse)."""
    from pyspark.sql import functions as F

    return F.array_join(
        F.reverse(F.regexp_extract_all(col, F.lit(f"({RTL_UNIT})"))), " "
    )


def word_boxes(
    text: str, bbox: Tuple[int, int, int, int]
) -> List[Tuple[str, int, int, int, int]]:
    """Distribute word boxes across a line box proportionally to character
    offsets — the ``cal_ocr_word_box`` analog (/root/reference/ppstructure/
    utility.py:243-293: word x-extents from CTC column indices scaled into
    the line box; here the "columns" are character offsets).

    → [(word, x0, y0, x1, y1)], y from the line box, x linear in offsets."""
    x0, y0, x1, y1 = bbox
    n = len(text)
    if n == 0:
        return []
    w = x1 - x0
    out = []
    for word, s, e in word_segments(text):
        wx0 = x0 + (s * w) // n
        wx1 = x0 + (e * w + n - 1) // n  # ceil: boxes cover the full extent
        out.append((word, wx0, y0, wx1, y1))
    return out


def unclip_box(
    box: Tuple[int, int, int, int], ratio: float = 1.5
) -> Tuple[int, int, int, int]:
    """Pad a box outward by ``area·ratio/perimeter`` — the DB ``unclip``
    polygon dilation (/root/reference/ppocr/postprocess/db_postprocess.py:
    160-166: pyclipper offset by A·r/L) specialized to axis-aligned boxes."""
    x0, y0, x1, y1 = box
    w, h = x1 - x0, y1 - y0
    if w <= 0 or h <= 0:
        return box
    d = int(round(w * h * ratio / (2 * (w + h))))
    return (x0 - d, y0 - d, x1 + d, y1 + d)


def word_boxes_udf(line_box: Tuple[int, int, int, int] = (0, 0, 777, 20)):
    """Arrow-batched pandas UDF: line-text column → array of
    (word, wx0, wx1) structs from ``word_boxes`` (cal_ocr_word_box analog);
    y-extents are the line box's and therefore omitted."""
    from pyspark.sql import functions as F, types as T

    rt = T.ArrayType(
        T.StructType(
            [
                T.StructField("word", T.StringType()),
                T.StructField("wx0", T.LongType()),
                T.StructField("wx1", T.LongType()),
            ]
        )
    )

    def _boxes(line: pd.Series) -> pd.Series:
        return line.map(
            lambda t: [
                {"word": w, "wx0": x0, "wx1": x1}
                for (w, x0, _y0, x1, _y1) in word_boxes(t or "", line_box)
            ]
        )

    return F.pandas_udf(_boxes, rt)


def word_segments_udf():
    """Arrow-batched pandas UDF: text column → array<string> of words from
    the get_word_info state machine (module-level so pandas-UDF type hints
    resolve — same pattern as tablesim.table_similarity_udf)."""
    from pyspark.sql import functions as F, types as T

    def _seg(s: pd.Series) -> pd.Series:
        return s.map(lambda t: [w for w, _, _ in word_segments(t or "")])

    return F.pandas_udf(_seg, T.ArrayType(T.StringType()))
