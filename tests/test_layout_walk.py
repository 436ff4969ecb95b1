"""sorted_layout_boxes full stateful walk (recovery_to_doc.py:87-155).

Three layers of evidence:
1. hand-derived fixtures on interleaved single/double-column pages (the case
   the per-box predicates alone cannot order correctly);
2. hypothesis fuzz: the stateful walk ≡ the independently derived relational
   closed form (the form the layout_order DuckDB oracle and the pure-Python
   golden oracle use) — including degenerate boxes and the final-box rules;
3. kernel ≡ golden oracle with layout_mode="walk" over generated payloads.
"""

from __future__ import annotations

from paddleocr_spark.config import ExtractConfig
from paddleocr_spark.functions.pdflike import layout_walk
from paddleocr_spark.oracle import _oracle_layout_walk

W = 800


def _mk(idx, x0, y0, x1, y1):
    return (x0, y0, x1, y1, idx, f"t{idx}")


def _order(boxes):
    return [b[4] for b, _lay in layout_walk(boxes, W)]


def _layouts(boxes):
    return [lay for _b, lay in layout_walk(boxes, W)]


def test_interleaved_two_column_page():
    # two left/right pairs separated by a full-width box, single final box
    boxes = [
        _mk(0, 50, 100, 380, 130),   # left
        _mk(1, 420, 105, 750, 135),  # right
        _mk(2, 50, 160, 380, 190),   # left
        _mk(3, 100, 220, 700, 250),  # full-width single (flushes L,L,R)
        _mk(4, 420, 280, 750, 310),  # right
        _mk(5, 50, 285, 380, 315),   # left
        _mk(6, 300, 400, 500, 430),  # final: below prev + spans centerline
    ]
    assert _order(boxes) == [0, 2, 1, 3, 5, 4, 6]
    assert _layouts(boxes) == [
        "double", "double", "double", "single", "double", "double", "single"
    ]


def test_final_box_joins_right_column():
    boxes = [
        _mk(0, 50, 100, 380, 130),
        _mk(1, 420, 105, 750, 135),
        _mk(2, 50, 160, 380, 190),
        _mk(3, 100, 220, 700, 250),
        _mk(4, 420, 280, 750, 310),
        _mk(5, 50, 285, 380, 315),
        _mk(6, 420, 340, 750, 370),  # final: x0 ≥ w/2 → joins right column
    ]
    assert _order(boxes) == [0, 2, 1, 3, 5, 4, 6]
    assert _layouts(boxes)[-1] == "double"


def test_final_box_joins_left_column():
    boxes = [
        _mk(0, 50, 100, 380, 130),
        _mk(1, 420, 105, 750, 135),
        _mk(2, 100, 220, 700, 250),
        _mk(3, 420, 280, 750, 310),
        _mk(4, 50, 285, 380, 315),
        _mk(5, 50, 340, 200, 370),   # final: x1 ≤ w/2 → joins left column
    ]
    # segment 1 order: lefts (4, 5) then right (3)
    assert _order(boxes) == [0, 1, 2, 4, 5, 3]


def test_single_box_page_and_empty():
    assert _order([_mk(0, 50, 100, 380, 130)]) == [0]
    assert _layouts([_mk(0, 50, 100, 380, 130)]) == ["single"]
    assert layout_walk([], W) == []


def test_trailing_columns_without_final_single():
    # page that ends mid-double-column: columns flush after the loop
    boxes = [
        _mk(0, 100, 100, 700, 130),  # single
        _mk(1, 50, 160, 380, 190),   # left
        _mk(2, 420, 165, 750, 195),  # right (also the final box: x1 > w/2)
    ]
    assert _order(boxes) == [0, 1, 2]
    assert _layouts(boxes) == ["single", "double", "double"]


def test_walk_equals_closed_form_fuzz():
    """The stateful walk must equal the relational closed form on arbitrary
    box soups (degenerate zero-width boxes included)."""
    from hypothesis import given, settings, strategies as st

    box = st.tuples(
        st.integers(0, W),        # x0
        st.integers(0, 900),      # y0
        st.integers(0, W + 80),   # x1 (may be < x0 → degenerate)
        st.integers(0, 960),      # y1
    )

    @settings(max_examples=400, deadline=None)
    @given(st.lists(box, max_size=12))
    def fuzz(raw):
        boxes = [
            (x0, y0, max(x0, x1), max(y0, y1), i, f"t{i}")
            for i, (x0, y0, x1, y1) in enumerate(raw)
        ]
        walk_ids = [b[4] for b, _lay in layout_walk(boxes, W)]
        closed_ids = [b[4] for b in _oracle_layout_walk(boxes, W)]
        assert walk_ids == closed_ids

    fuzz()


def test_kernel_equals_oracle_in_walk_mode():
    """Full pdf path with layout_mode='walk': kernel ≡ pure-Python oracle on
    generated payloads (the golden-equality invariant under the new mode)."""
    from paddleocr_spark import corpus
    from paddleocr_spark.kernel import assemble_text, extract_payload
    from paddleocr_spark.oracle import oracle_extract

    cfg = ExtractConfig(layout_mode="walk")
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    n_pdf = 0
    for doc_id in range(80):
        for t in range(4):
            payload = corpus.payload_for(doc_id, 0, t, words)
            kind, spans, dropped = extract_payload(payload, cfg)
            exp = oracle_extract(payload, cfg)
            assert kind == exp["kind"]
            assert spans == exp["spans"], (doc_id, t)
            assert dropped == exp["n_dropped"]
            assert assemble_text(spans, cfg) == exp["extracted_text"]
            n_pdf += kind == "pdf"
    assert n_pdf > 20  # the mix actually exercised the pdf path
