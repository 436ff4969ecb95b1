"""Batch extraction kernel: payload string → ordered spans.

This is the single Python-boundary crossing of the pipeline (SURVEY.md §3.5):
the Spark operator feeds Arrow batches of payload strings here; the kernel
dispatches per payload kind and returns span lists. All hot loops are a single
O(tokens) pass per payload — no DOM library, no per-row Python outside the
batch (the reference's analog: one C++ predictor crossing per stage,
/root/reference/tools/infer/predict_system.py:49-61).

Stage composition per payload (detect → recognize → structure analogs):
  sniff kind → tokenize/segment → density keep-filter → reading order →
  span structs → paragraph assembly (recovery_to_markdown semantics).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from .config import ExtractConfig, DEFAULT_CONFIG
from .functions.sniff import sniff_kind
from .functions.htmltok import html_blocks
from .functions.pdflike import pdflike_spans
from .functions.realpdf import realpdf_spans
from .functions.textnorm import collapse_ws, squeeze_newlines

_PARA_SPLIT_RE = re.compile(r"\n\s*\n")

# span tuple: (span_idx, kind, text, score, bbox-or-None)
Span = Tuple[int, str, str, float, Optional[List[int]]]


def plain_spans(text: str, cfg: ExtractConfig = DEFAULT_CONFIG):
    """Plain-text path: paragraphs split on blank lines, whitespace-normalized
    (paragraph-merge semantics of
    /root/reference/ppstructure/recovery/recovery_to_markdown.py:23-126)."""
    spans = []
    n_dropped = 0
    for para in _PARA_SPLIT_RE.split(text):
        clean = collapse_ws(para)
        if not clean:
            continue
        if len(clean) < cfg.min_chars:
            n_dropped += 1
            continue
        spans.append(("para", clean, 1.0, None))
    return spans, n_dropped


def reclassify_formula(raw, cfg: ExtractConfig = DEFAULT_CONFIG):
    """Formula routing post-pass (cfg.detect_formula; the ppstructure
    formula-branch analog, ppstructure/predict_system.py:171-174): a ``para``
    span whose whole text is a display-math block ``$$ … $$`` with non-empty
    inner content becomes kind ``formula`` with the inner content (stripped)
    as text — preserved verbatim downstream (markdown re-fences it, no
    escaping)."""
    out = []
    for k, t, s, bbox in raw:
        if (
            k == "para"
            and len(t) > 4
            and t.startswith("$$")
            and t.endswith("$$")
        ):
            inner = t[2:-2].strip()
            if inner:
                out.append(("formula", inner, s, bbox))
                continue
        out.append((k, t, s, bbox))
    return out


def extract_payload(text, cfg: ExtractConfig = DEFAULT_CONFIG):
    """One payload → (kind, spans, n_dropped); spans carry span_idx rank."""
    kind = sniff_kind(text)
    if text is None:
        return kind, [], 0
    if len(text) > cfg.max_payload_chars:  # row-level skew guard
        text = text[: cfg.max_payload_chars]
    if kind == "pdf":
        raw, n_dropped = pdflike_spans(text, cfg)
    elif kind == "pdf_real":
        raw, n_dropped = realpdf_spans(text, cfg)
    elif kind == "html":
        raw2, n_dropped = html_blocks(text, cfg)
        raw = [(k, t, s, None) for (k, t, s) in raw2]
    else:
        raw, n_dropped = plain_spans(text, cfg)
    if cfg.detect_formula:
        raw = reclassify_formula(raw, cfg)
    spans: List[Span] = [
        (i, k, t, s, bbox) for i, (k, t, s, bbox) in enumerate(raw)
    ]
    return kind, spans, n_dropped


def assemble_text(spans: List[Span], cfg: ExtractConfig = DEFAULT_CONFIG) -> str:
    """Ordered spans → extracted_text: para_sep-joined, >=3 newlines squeezed."""
    return squeeze_newlines(cfg.para_sep.join(s[2] for s in spans))


def extract_batch(texts, cfg: ExtractConfig = DEFAULT_CONFIG):
    """Vectorized entry for Arrow batches: iterable of payloads →
    (kinds, span_lists, extracted_texts, n_spans, n_dropped, truncated)
    parallel lists.

    ``truncated`` flags rows the payload-cap skew guard clipped — computed
    HERE (Python ``len`` is O(1) on a str already in hand) rather than as a
    JVM ``length(text)`` observation: a CollectMetrics aggregate referencing
    the text column measured +10% on the full checkpoint job at local[8]
    (116 vs 105 s, A/B in BENCH.md round-3), while a trivial-aggregate
    CollectMetrics node is free — so the flag rides the UDF output and the
    observation sums a boolean column instead."""
    kinds, span_lists, extracted, n_spans, n_dropped = [], [], [], [], []
    truncated = []
    cap = cfg.max_payload_chars
    for t in texts:
        kind, spans, dropped = extract_payload(t, cfg)
        kinds.append(kind)
        span_lists.append(spans)
        extracted.append(assemble_text(spans, cfg))
        n_spans.append(len(spans))
        n_dropped.append(dropped)
        truncated.append(t is not None and len(t) > cap)
    return kinds, span_lists, extracted, n_spans, n_dropped, truncated
