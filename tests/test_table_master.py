"""TableMasterMatcher cascade (table_master_match.py) correctness units.

The load-bearing novelty is the hull-IoU closed form: TableMaster divides the
intersection by the CONVEX HULL area of both boxes' corner points
(/root/reference/ppstructure/table/table_master_match.py:117-133). The
operator computes 2·hull as bounding-box minus corner triangles; here it's
fuzz-verified against an independent monotone-chain convex hull.
"""

from __future__ import annotations


def _hull_area2_closed(a, b):
    """2× hull area via the corner-triangle closed form (mirrors
    operators/spatial.py _tm_features and the DuckDB oracle)."""
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    bb2 = 2 * (max(ax1, bx1) - min(ax0, bx0)) * (max(ay1, by1) - min(ay0, by0))

    def cut(dx, dy, negative):
        p = dx * dy
        return abs(dx) * abs(dy) if ((p < 0) if negative else (p > 0)) else 0

    cuts = (
        cut(ax0 - bx0, ay0 - by0, True)
        + cut(ax1 - bx1, ay0 - by0, False)
        + cut(ax0 - bx0, ay1 - by1, False)
        + cut(ax1 - bx1, ay1 - by1, True)
    )
    return bb2 - cuts


def _hull_area2_chain(points):
    """2× convex hull area: Andrew monotone chain + shoelace (independent)."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return 0

    def half(ps):
        out = []
        for p in ps:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(list(reversed(pts)))
    hull = lower[:-1] + upper[:-1]
    s = 0
    for i in range(len(hull)):
        x0, y0 = hull[i]
        x1, y1 = hull[(i + 1) % len(hull)]
        s += x0 * y1 - x1 * y0
    return abs(s)


def _corners(box):
    x0, y0, x1, y1 = box
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def test_hull_closed_form_examples():
    # identical boxes → hull = box
    assert _hull_area2_closed((0, 0, 10, 10), (0, 0, 10, 10)) == 200
    # nested → hull = outer box
    assert _hull_area2_closed((0, 0, 10, 10), (2, 2, 5, 5)) == 200
    # diagonal offset → bounding box minus two opposite corner triangles
    a, b = (0, 0, 10, 10), (5, 5, 15, 15)
    assert _hull_area2_closed(a, b) == _hull_area2_chain(_corners(a) + _corners(b))


def test_hull_closed_form_fuzz():
    from hypothesis import given, settings, strategies as st

    box = st.tuples(
        st.integers(0, 50), st.integers(0, 50), st.integers(1, 50), st.integers(1, 50)
    ).map(lambda t: (min(t[0], t[0] + t[2]), min(t[1], t[1] + t[3]),
                     t[0] + t[2], t[1] + t[3]))

    @settings(max_examples=500, deadline=None)
    @given(box, box)
    def fuzz(a, b):
        assert _hull_area2_closed(a, b) == _hull_area2_chain(
            _corners(a) + _corners(b)
        ), (a, b)

    fuzz()


def test_cascade_hand_case():
    """One page, hand-checkable: cell A contains ocr-1's center (rule 1);
    ocr-2 overlaps cell B without center containment (rule 2); cell C is
    untouched and grabs the nearest unmatched ocr (rule 3)."""
    import pandas as pd

    from paddleocr_spark.operators.spatial import table_master_match_pairs
    from paddleocr_spark.session import get_spark

    spark = get_spark("tm-test", cores=2)
    ocr = spark.createDataFrame(
        pd.DataFrame(
            {
                "page_id": [0, 0, 0],
                "box_id": [1, 2, 3],
                "x0": [10, 95, 300],
                "y0": [10, 0, 300],
                "x1": [20, 130, 310],
                "y1": [20, 8, 310],
            }
        )
    )
    cells = spark.createDataFrame(
        pd.DataFrame(
            {
                "page_id": [0, 0, 0],
                "box_id": [7, 8, 9],
                "x0": [0, 100, 200],
                "y0": [0, 0, 200],
                "x1": [50, 150, 250],
                "y1": [50, 5, 250],
            }
        )
    )
    got = {
        (r.ocr_id, r.cell_id): r.rule
        for r in table_master_match_pairs(ocr, cells).collect()
    }
    # ocr-1 center (15,15) inside cell 7 → center rule
    assert got[(1, 7)] == "center"
    # ocr-2 center (112.5, 4) is inside cell 8 too ([100,150]x[0,5])? y=4 ≤ 5 → center
    assert got[(2, 8)] == "center"
    # ocr-3 overlaps nothing; cell 9 unmatched → distance rule grabs ocr-3
    assert got[(3, 9)] == "distance"
