"""Golden per-turn equality: engine kernel vs independent oracle over the full
deterministic corpus (FIXTURES.md §3; mirrors TIPC golden regression,
/root/reference/test_tipc/compare_results.py)."""

from paddleocr_spark import corpus
from paddleocr_spark.kernel import extract_payload, assemble_text
from paddleocr_spark.oracle import oracle_extract


def test_kernel_matches_oracle_on_corpus(doc_items):
    n = 0
    for row in corpus.generate_rows(doc_items):
        t = row["text"]
        kind, spans, nd = extract_payload(t)
        o = oracle_extract(t)
        assert kind == o["kind"], (row["conv_id"], row["turn_idx"])
        assert spans == o["spans"], (row["conv_id"], row["turn_idx"])
        assert nd == o["n_dropped"], (row["conv_id"], row["turn_idx"])
        assert assemble_text(spans) == o["extracted_text"]
        n += 1
    assert n > 4000


def test_corpus_is_deterministic(doc_items):
    a = [r["text"] for r in corpus.generate_rows(doc_items[:20])]
    b = [r["text"] for r in corpus.generate_rows(doc_items[:20])]
    assert a == b


def test_corpus_has_skew(doc_items):
    rows = list(corpus.generate_rows(doc_items[:100]))
    per_conv = {}
    for r in rows:
        per_conv[r["conv_id"]] = per_conv.get(r["conv_id"], 0) + 1
    counts = sorted(per_conv.values())
    assert counts[-1] == 100 * counts[0]  # 100× skew exists
