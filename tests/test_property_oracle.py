"""Property-based tests (hypothesis): for ARBITRARY payloads the kernel must
(a) never raise and (b) agree byte-for-byte with the independent pure-Python
oracle. This is the fuzzing layer the reference lacks (SURVEY.md §5 notes no
property-based testing exists there) — it guards the golden contract far
beyond the deterministic corpus."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from paddleocr_spark.kernel import assemble_text, extract_payload
from paddleocr_spark.oracle import oracle_extract

TAGS = [
    "p", "div", "b", "i", "a", "nav", "li", "ul", "table", "tr", "td",
    "h1", "pre", "script", "style", "footer", "article", "br", "span",
]


def _tag(name: str, closing: bool) -> str:
    if closing:
        return f"</{name}>"
    attr = ' class="sidebar"' if name == "div" else (' href="/x"' if name == "a" else "")
    return f"<{name}{attr}>"


tag_soup = st.lists(
    st.one_of(
        st.text(alphabet="ab &#;<xé\n\t 0.", max_size=12),
        st.sampled_from(TAGS).flatmap(
            lambda n: st.booleans().map(lambda c: _tag(n, c))
        ),
        st.just("<!-- c -->"),
        st.just("&amp;"),
        st.just("&#233;"),
    ),
    max_size=40,
).map("".join)

pdf_line = st.one_of(
    st.builds(
        lambda p, x0, y0, w, h, t: f"{p}|{x0},{y0},{x0 + w},{y0 + h}|{t}",
        st.integers(0, 2),
        st.integers(0, 800),
        st.integers(0, 1000),
        st.integers(1, 700),
        st.integers(1, 60),
        st.text(alphabet="abc xyz", max_size=20),
    ),
    st.text(alphabet="ab|,0. ", max_size=20),  # malformed lines
)
pdf_soup = st.lists(pdf_line, max_size=12).map(
    lambda ls: "PDFLIKE v1\n" + "\n".join(ls)
)

any_payload = st.one_of(
    tag_soup,
    pdf_soup,
    st.text(max_size=200),  # arbitrary unicode plain text
    st.none(),
)


@settings(max_examples=300, deadline=None)
@given(any_payload)
def test_kernel_equals_oracle_on_arbitrary_payloads(payload):
    kind, spans, dropped = extract_payload(payload)
    o = oracle_extract(payload)
    assert kind == o["kind"]
    assert spans == o["spans"]
    assert dropped == o["n_dropped"]
    assert assemble_text(spans) == o["extracted_text"]


@settings(max_examples=150, deadline=None)
@given(tag_soup)
def test_html_spans_invariants(payload):
    html = "<html><body>" + payload + "</body></html>"
    _kind, spans, _d = extract_payload(html)
    for i, (idx, kind, text, score, bbox) in enumerate(spans):
        assert idx == i                      # dense span ranks
        if kind == "code":
            # v32: code blocks are whitespace-verbatim (outer strip, CR-free)
            assert text == text.strip() and "\r" not in text
        elif kind == "table":
            # rows joined by \n, each line internally normalized
            assert text == "\n".join(
                " ".join(ln.split()) for ln in text.split("\n")
            )
        else:
            assert text == " ".join(text.split())  # normalized whitespace
        assert 0.0 <= score <= 1.0
        assert kind in ("para", "title", "code", "list", "table")


@settings(max_examples=200, deadline=None)
@given(any_payload)
def test_kernel_equals_oracle_under_mode_configs(payload):
    """The golden contract must hold under EVERY config-gated mode: formula
    routing (different post-pass implementations: prefix walk vs regex
    closed form), the layout walk (stateful walk vs relational closed form)
    and both at once — on arbitrary payloads including $$-soups."""
    from paddleocr_spark.config import ExtractConfig

    for cfg in (
        ExtractConfig(detect_formula=True),
        ExtractConfig(layout_mode="walk"),
        ExtractConfig(detect_formula=True, layout_mode="walk",
                      merge_paragraphs=True),
    ):
        kind, spans, dropped = extract_payload(payload, cfg)
        o = oracle_extract(payload, cfg)
        assert kind == o["kind"]
        assert spans == o["spans"]
        assert dropped == o["n_dropped"]
        assert assemble_text(spans, cfg) == o["extracted_text"]


formula_soup = st.lists(
    st.one_of(
        st.text(alphabet="ab c$\n", max_size=16),
        st.just("$$ x = y $$"),
        st.just("$$$$"),
        st.just("$$ $$"),
        st.just("$$a$$"),
        st.just("\n\n"),
    ),
    max_size=12,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(formula_soup)
def test_formula_mode_on_dollar_soups(payload):
    """Adversarial $$-heavy plain payloads: kernel ≡ oracle with formula
    routing on, and formula spans are never empty."""
    from paddleocr_spark.config import ExtractConfig

    cfg = ExtractConfig(detect_formula=True)
    kind, spans, dropped = extract_payload(payload, cfg)
    o = oracle_extract(payload, cfg)
    assert spans == o["spans"]
    for _i, k, t, _s, _b in spans:
        if k == "formula":
            assert t.strip() != ""
