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


def _py_cascade(ocr_boxes, cell_boxes):
    """Third, fully independent sequential implementation of the cascade,
    faithful to the reference's loop structure (center_rule_match
    :321-345, iou_rule_match :346-377, distance_rule_match :378-405,
    orchestration :775-850) — used to cross-check the Spark relational
    form on random pages. Boxes: (box_id, x0, y0, x1, y1)."""
    import math

    def hull_iou(a, b):
        _, ax0, ay0, ax1, ay1 = a
        _, bx0, by0, bx1, by1 = b
        iw = min(ax1, bx1) - max(ax0, bx0)
        ih = min(ay1, by1) - max(ay0, by0)
        inter = iw * ih if iw > 0 and ih > 0 else 0
        hull2 = _hull_area2_chain(
            _corners((ax0, ay0, ax1, ay1)) + _corners((bx0, by0, bx1, by1))
        )
        return 0.0 if hull2 <= 0 else 2.0 * inter / hull2

    pairs = []
    # rule 1: all center-in-cell pairs
    for o in ocr_boxes:
        cx2, cy2 = o[1] + o[3], o[2] + o[4]
        for c in cell_boxes:
            if 2 * c[1] <= cx2 <= 2 * c[3] and 2 * c[2] <= cy2 <= 2 * c[4]:
                pairs.append((o[0], c[0], "center"))
    matched_o = {p[0] for p in pairs}
    # rule 2: per unmatched ocr, strict argmax hull-IoU > 0 (first max)
    for o in ocr_boxes:
        if o[0] in matched_o:
            continue
        best, best_c = 0.0, None
        for c in sorted(cell_boxes):
            iou = hull_iou(o, c)
            if iou > best:
                best, best_c = iou, c[0]
        if best_c is not None:
            pairs.append((o[0], best_c, "iou"))
    matched_o = {p[0] for p in pairs}
    matched_c = {p[1] for p in pairs}
    # rule 3: per unmatched cell, strict argmin center distance (first min)
    for c in cell_boxes:
        if c[0] in matched_c:
            continue
        best, best_o = math.inf, None
        for o in sorted(ocr_boxes):
            if o[0] in matched_o:
                continue
            d = ((o[1] + o[3]) - (c[1] + c[3])) ** 2 + (
                (o[2] + o[4]) - (c[2] + c[4])
            ) ** 2
            if d < best:
                best, best_o = d, o[0]
        if best_o is not None:
            pairs.append((best_o, c[0], "distance"))
    return sorted(pairs)


def test_cascade_matches_sequential_on_random_pages(spark):
    """Spark relational cascade ≡ the sequential reference-shaped walk on
    seeded random pages (including overlapping cells, center ties on box
    edges, empty sides)."""
    import random

    import pandas as pd

    from paddleocr_spark.operators.spatial import table_master_match_pairs

    rng = random.Random(42)
    pages = []
    for page in range(25):
        n_o, n_c = rng.randint(0, 6), rng.randint(0, 5)
        ocr = [
            (100 + i, rng.randrange(0, 90), rng.randrange(0, 90),
             0, 0) for i in range(n_o)
        ]
        ocr = [(b[0], b[1], b[2], b[1] + rng.randrange(1, 30), b[2] + rng.randrange(1, 30)) for b in ocr]
        cells = [
            (200 + i, rng.randrange(0, 80), rng.randrange(0, 80), 0, 0)
            for i in range(n_c)
        ]
        cells = [(b[0], b[1], b[2], b[1] + rng.randrange(1, 50), b[2] + rng.randrange(1, 50)) for b in cells]
        pages.append((page, ocr, cells))

    o_rows = [(p, *b) for p, ocr, _ in pages for b in ocr]
    c_rows = [(p, *b) for p, _, cells in pages for b in cells]
    cols = ["page_id", "box_id", "x0", "y0", "x1", "y1"]
    odf = spark.createDataFrame(pd.DataFrame(o_rows, columns=cols))
    cdf = spark.createDataFrame(pd.DataFrame(c_rows, columns=cols))
    got = {}
    for r in table_master_match_pairs(odf, cdf).collect():
        got.setdefault(r.page_id, []).append((r.ocr_id, r.cell_id, r.rule))
    for page, ocr, cells in pages:
        expect = _py_cascade(ocr, cells)
        assert sorted(got.get(page, [])) == expect, page
