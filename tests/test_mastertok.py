"""TableMaster token-assembly goldens (table_master_match.py:439-602).

Hand-derived expected outputs in the reference's own unit-test style
(tests/test_french_accents.py shape): span merge, eb-vocabulary expansion,
bold-run dedup, split-space squash, and the full fill walk — plus an
end-to-end: match cascade output → per-cell text join → token fill.
"""

from __future__ import annotations

from paddleocr_spark.functions.mastertok import (
    dedup_bold_runs,
    expand_eb_token,
    fill_cell_texts,
    join_matched_texts,
    merge_span_tokens,
    squash_split_spaces,
)


def test_merge_span_tokens_single_attr():
    toks = ["<thead>", "<tr>", "<td", ' colspan="3"', ">", "</td>", "<td></td>",
            "</tr>", "</thead>", "</tbody>"]
    got = merge_span_tokens(toks)
    assert got[2] == '<td colspan="3"></td>'
    assert ' colspan="3"' not in got  # attr token consumed into the cell
    assert ">" not in got  # bare closer consumed too


def test_merge_span_tokens_double_attr():
    toks = ["<td", ' rowspan="2"', ' colspan="3"', ">", "</td>", "</tbody>"]
    got = merge_span_tokens(toks)
    assert got[0] == '<td rowspan="2" colspan="3">' + "</td>"


def test_merge_span_tokens_appends_tbody():
    assert merge_span_tokens(["<td></td>"])[-1] == "</tbody>"


def test_expand_eb_tokens():
    assert expand_eb_token("<eb></eb>") == "<td></td>"
    assert expand_eb_token("<eb1></eb1>") == "<td> </td>"
    assert expand_eb_token("<eb2></eb2>") == "<td><b> </b></td>"
    assert expand_eb_token("<eb3></eb3>") == "<td>  </td>"
    assert expand_eb_token("<eb7></eb7>") == "<td><b><i></i></b></td>"
    assert expand_eb_token("<eb10></eb10>") == "<td><b>     </b></td>"
    # <eb1> must not be clobbered by the <eb> rule (ordering)
    assert expand_eb_token("<eb1></eb1><eb></eb>") == "<td> </td><td></td>"


def test_dedup_bold_runs():
    assert dedup_bold_runs(["<b>Local</b>", "<b>government</b>", "<b>unit</b>"]) == [
        "<b>Local government unit</b>"
    ]
    mixed = ["<b>Local</b>", "government"]
    assert dedup_bold_runs(mixed) == mixed
    assert join_matched_texts(["<b>a</b>", "<b>b</b>"]) == "<b>a b</b>"
    assert join_matched_texts(["a", "b"]) == "a b"


def test_squash_split_spaces():
    # '   ' (split + real + split) → ' '; bare split spaces vanish
    assert squash_split_spaces("a b") == "ab"
    assert squash_split_spaces("a   b") == "a b"
    assert squash_split_spaces("a    b") == "a b"  # 3-run + split


def test_fill_cell_texts_walk():
    toks = [
        "<thead>", "<tr>",
        "<td></td>",                      # cell 0 → text
        "<td", ' colspan="2"', ">", "</td>",  # cell 1 (span-merged) → text
        "<eb></eb>",                      # cell 2 (empty vocab) — no '<td' prefix
        "</tr>", "</thead>", "</tbody>",
    ]
    html = fill_cell_texts(toks, {0: "alpha", 1: "<b>beta</b>"})
    assert '<td>alpha</td>' in html
    assert '<td colspan="2"><b>beta</b></td>' in html
    assert "<td></td>" in html  # the eb cell expanded, unfilled
    assert html.endswith("</tbody>")


def test_fill_drops_unmatched_tail_cells():
    # reference: td tokens beyond the match dict are skipped entirely
    toks = ["<td></td>", "<td></td>", "<td></td>", "</tbody>"]
    html = fill_cell_texts(toks, {0: "x"})
    assert html == "<td>x</td></tbody>"


def test_match_to_fill_end_to_end(spark):
    """Cascade pairs → per-cell text join → token fill, on a tiny page."""
    import pandas as pd

    from paddleocr_spark.operators.spatial import table_master_match_pairs

    ocr = spark.createDataFrame(
        pd.DataFrame(
            {
                "page_id": [0, 0],
                "box_id": [1, 2],
                "x0": [10, 60],
                "y0": [10, 10],
                "x1": [20, 70],
                "y1": [20, 20],
            }
        )
    )
    cells = spark.createDataFrame(
        pd.DataFrame(
            {
                "page_id": [0, 0],
                "box_id": [0, 1],
                "x0": [0, 50],
                "y0": [0, 0],
                "x1": [40, 90],
                "y1": [40, 40],
            }
        )
    )
    pairs = table_master_match_pairs(ocr, cells).collect()
    texts = {1: "hello", 2: "<b>world</b>"}
    by_cell: dict[int, list[str]] = {}
    for r in sorted(pairs, key=lambda r: r.ocr_id):
        by_cell.setdefault(r.cell_id, []).append(texts[r.ocr_id])
    fills = {c: join_matched_texts(ts) for c, ts in by_cell.items()}
    html = fill_cell_texts(["<td></td>", "<td></td>", "</tbody>"], fills)
    assert html == "<td>hello</td><td><b>world</b></td></tbody>"
