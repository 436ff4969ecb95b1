"""TEDS-like table structure similarity.

The reference scores predicted table HTML against ground truth with TEDS —
tree-edit-distance similarity over the <tr>/<td> tree via APTED, fanned out
on a process pool (/root/reference/ppstructure/table/table_metric/
table_metric.py:109-186, parallel.py:5-55). The engine's tables are flat
pipe-format strings (rows by newline, cells by ' | ' — SPEC §2), so the tree
is exactly two levels and tree-edit distance reduces to SEQUENCE edit
distance over the cell stream with explicit row-boundary tokens — node
inserts/deletes/relabels map 1:1. Similarity = 1 − dist/max(len), the same
normalization TEDS uses.

``table_similarity_micro`` is the scalar; ``table_similarity_udf`` wraps it
as an Arrow-batched pandas UDF (the process-pool analog: Spark partitions
replace the pool).
"""

from __future__ import annotations

from typing import List

import pandas as pd  # module-level so pandas_udf type hints resolve

_ROW_SEP = "\x00ROW\x00"  # structural token, cannot collide with cell text


def _cells(table_text: str) -> List[str]:
    out: List[str] = []
    for i, row in enumerate(table_text.split("\n")):
        if i:
            out.append(_ROW_SEP)
        out.extend(c.strip() for c in row.split(" | "))
    return out


def _seq_edit(a: List[str], b: List[str]) -> int:
    """Levenshtein over token sequences (insert/delete/substitute = 1)."""
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        ai = a[i - 1]
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ai != b[j - 1]),
            )
        prev = cur
    return prev[m]


def table_similarity_micro(a: str, b: str) -> int:
    """floor(1e6 · (1 − edit/max)) over cell streams; 1e6 for identical."""
    ca, cb = _cells(a), _cells(b)
    mx = max(len(ca), len(cb))
    if mx == 0:
        return 1000000
    d = _seq_edit(ca, cb)
    return int(1000000 * (mx - d) // mx)


def table_similarity_udf():
    """(pred, gt) string columns → similarity micro (Arrow-batched)."""
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.LongType())
    def sim(pred: pd.Series, gt: pd.Series) -> pd.Series:
        return pd.Series(
            [
                table_similarity_micro(p or "", g or "")
                for p, g in zip(pred, gt)
            ],
            dtype="int64",
        )

    return sim
