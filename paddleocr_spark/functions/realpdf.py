"""Real-PDF (`%PDF-`) text-object extraction — the deterministic subset.

The engine-side implementation of SPEC §3b: uncompressed content streams are
interpreted with a hand-rolled character scanner (the oracle re-derives the
same spec with a regex-driven tokenizer — different control flow, same
contract). This is the analog of the reference's real-PDF ingestion:
``check_and_read`` renders pages via PyMuPDF (`/root/reference/ppocr/utils/
utility.py:119-152`) and the system loops per page
(`/root/reference/tools/infer/predict_system.py:212-224`); here the text
objects ARE the detection output, so the page render is replaced by direct
``BT``/``ET`` interpretation and the boxes feed the SAME XY-cut /
layout-walk / paragraph-merge path as the PDFLIKE format (functions/
pdflike.py).

No PDF library, no binary decode: payloads live in a parquet string column,
so only the textual skeleton (uncompressed streams) is extractable —
``/Filter`` streams are skipped and counted, never raised (the
DecodeImage-None contract).
"""

from __future__ import annotations

import math
import re
from typing import List, Tuple

from ..config import ExtractConfig, DEFAULT_CONFIG
from .pdflike import (
    Box,
    layout_walk,
    merge_fragments,
    merge_paragraph_lines,
    xy_cut,
)
from .textnorm import collapse_ws

PDF_REAL_MAGIC = "%PDF-"

_WS = "\x00\t\n\x0c\r "
_DELIM = "()<>[]{}/%"
_NUM_RE = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)$")
# format-spec literal (shared with the oracle by definition, like TOKEN_RE)
MEDIABOX_RE = re.compile(
    r"/MediaBox\s*\[\s*([0-9.+-]+)\s+([0-9.+-]+)\s+([0-9.+-]+)\s+([0-9.+-]+)\s*\]"
)

_ESC_MAP = {"n": "\n", "r": "\r", "t": "\t", "b": "\x08", "f": "\x0c"}


def media_box(text: str) -> Tuple[float, float]:
    """(width, height) from the first /MediaBox; 612x792 on absence/garbage."""
    m = MEDIABOX_RE.search(text)
    if m:
        try:
            a, b, c, d = (float(g) for g in m.groups())
            w, h = c - a, d - b
            if w > 0 and h > 0:
                return w, h
        except ValueError:
            pass
    return 612.0, 792.0


def _read_literal(s: str, i: int) -> Tuple[str, int, bool]:
    """Read a literal string starting at the '(' at ``i``.
    Returns (decoded, index-after-')', terminated?)."""
    out = []
    depth = 1
    i += 1
    n = len(s)
    while i < n:
        ch = s[i]
        if ch == "\\":
            if i + 1 >= n:
                i += 1
                break
            nxt = s[i + 1]
            if nxt in _ESC_MAP:
                out.append(_ESC_MAP[nxt])
                i += 2
            elif nxt in "()\\":
                out.append(nxt)
                i += 2
            elif nxt == "\n":
                i += 2  # line continuation
            elif "0" <= nxt <= "7":
                j = i + 1
                while j < min(i + 4, n) and "0" <= s[j] <= "7":
                    j += 1
                out.append(chr(int(s[i + 1 : j], 8) % 256))
                i = j
            else:
                out.append(nxt)
                i += 2
            continue
        if ch == "(":
            depth += 1
            out.append(ch)
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return "".join(out), i + 1, True
            out.append(ch)
        else:
            out.append(ch)
        i += 1
    return "".join(out), len(s), False


def _read_hex(s: str, i: int) -> Tuple[str, int]:
    """Read a hex string starting at the '<' at ``i``; returns (decoded,
    index-after-'>')."""
    digits = []
    i += 1
    n = len(s)
    while i < n and s[i] != ">":
        if s[i] in "0123456789abcdefABCDEF":
            digits.append(s[i])
        i += 1
    if len(digits) % 2:
        digits.append("0")
    out = "".join(
        chr(int(digits[k] + digits[k + 1], 16)) for k in range(0, len(digits), 2)
    )
    return out, min(i + 1, n)


def _interpret(content: str, mb_w: float, mb_h: float,
               cfg: ExtractConfig) -> List[Box]:
    """One content stream → line boxes in canonical top-left coordinates."""
    sx = cfg.page_w / mb_w
    sy = cfg.page_h / mb_h
    boxes: List[Box] = []
    in_text = False
    x = y = 0.0
    leading = 0.0
    fontsize = 12.0
    buf: List[str] = []
    stack: list = []
    arr: list | None = None  # open [ ... ] capture

    def flush() -> None:
        nonlocal buf
        txt = "".join(buf)
        if txt.strip():
            adv = 0.5 * fontsize * len(txt)
            boxes.append(
                (
                    int(math.floor(x * sx + 0.5)),
                    int(math.floor((mb_h - y - fontsize) * sy + 0.5)),
                    int(math.floor((x + adv) * sx + 0.5)),
                    int(math.floor((mb_h - y) * sy + 0.5)),
                    len(boxes),
                    txt,
                )
            )
        buf = []

    def nums(k: int):
        """Last k operands iff all numeric, else None."""
        if len(stack) < k:
            return None
        tail = stack[-k:]
        if all(isinstance(v, float) for v in tail):
            return tail
        return None

    i, n = 0, len(content)
    while i < n:
        ch = content[i]
        if ch in _WS or ch in "{}":
            i += 1
            continue
        if ch == "%":
            j = content.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if ch == "(":
            val, i, ok = _read_literal(content, i)
            (arr if arr is not None else stack).append(("s", val))
            if not ok:
                break  # unterminated → end of content scan
            continue
        if ch == "<":
            if i + 1 < n and content[i + 1] == "<":
                i += 2
                continue
            val, i = _read_hex(content, i)
            (arr if arr is not None else stack).append(("s", val))
            continue
        if ch == ">":
            i += 2 if content[i : i + 2] == ">>" else 1
            continue
        if ch == "[":
            if arr is None:
                arr = []
            i += 1
            continue
        if ch == "]":
            if arr is not None:
                stack.append(("a", arr))
                arr = None
            i += 1
            continue
        if ch == "/":
            j = i + 1
            while j < n and content[j] not in _WS and content[j] not in _DELIM:
                j += 1
            (arr if arr is not None else stack).append(("n", content[i + 1 : j]))
            i = j
            continue
        # regular-character run: number or operator
        j = i
        while j < n and content[j] not in _WS and content[j] not in _DELIM:
            j += 1
        if j == i:  # stray delimiter (e.g. an unmatched ')') — skip it
            i += 1
            continue
        tok = content[i:j]
        i = j
        if _NUM_RE.match(tok):
            (arr if arr is not None else stack).append(float(tok))
            continue
        if arr is not None:
            continue  # operators inside an open array: ignored
        # --- operator dispatch ---
        if tok == "BT":
            if in_text:
                flush()
            in_text = True
            x = y = leading = 0.0
        elif in_text:
            if tok == "Tf":
                if stack and isinstance(stack[-1], float):
                    flush()
                    fontsize = stack[-1]
            elif tok == "Td":
                v = nums(2)
                if v:
                    flush()
                    x += v[0]
                    y += v[1]
            elif tok == "TD":
                v = nums(2)
                if v:
                    flush()
                    leading = -v[1]
                    x += v[0]
                    y += v[1]
            elif tok == "TL":
                if stack and isinstance(stack[-1], float):
                    leading = stack[-1]
            elif tok == "Tm":
                v = nums(6)
                if v:
                    flush()
                    x, y = v[4], v[5]
            elif tok == "T*":
                flush()
                y -= leading
            elif tok == "Tj":
                if stack and isinstance(stack[-1], tuple) and stack[-1][0] == "s":
                    buf.append(stack[-1][1])
            elif tok in ("'", '"'):
                if stack and isinstance(stack[-1], tuple) and stack[-1][0] == "s":
                    flush()
                    y -= leading
                    buf.append(stack[-1][1])
            elif tok == "TJ":
                if stack and isinstance(stack[-1], tuple) and stack[-1][0] == "a":
                    piece = []
                    for el in stack[-1][1]:
                        if isinstance(el, tuple) and el[0] == "s":
                            piece.append(el[1])
                        elif isinstance(el, float) and el <= -180:
                            piece.append(" ")
                    buf.append("".join(piece))
            elif tok == "ET":
                flush()
                in_text = False
        stack = []
    if in_text:
        flush()
    return boxes


def parse_realpdf(text: str, cfg: ExtractConfig = DEFAULT_CONFIG):
    """Payload → (list of (page_idx, Box), n_skipped_streams)."""
    mb_w, mb_h = media_box(text)
    out = []
    skipped = 0
    page = 0
    pos = 0
    n = len(text)
    while pos < n:
        k = text.find("stream", pos)
        if k < 0:
            break
        after = k + 6
        if text[after : after + 2] == "\r\n":
            body_start = after + 2
        elif text[after : after + 1] == "\n":
            body_start = after + 1
        else:
            pos = after
            continue
        j = k - 1
        while j >= 0 and text[j] in _WS:
            j -= 1
        if j < 1 or text[j - 1 : j + 1] != ">>":
            pos = after
            continue
        end = text.find("endstream", body_start)
        if end < 0:
            skipped += 1
            break
        d0 = text.rfind("<<", 0, k)
        params = text[d0:k] if d0 >= 0 else ""
        pos = end + 9
        if "/Filter" in params:
            skipped += 1
            continue
        content = text[body_start:end]
        if "BT" not in content:
            continue
        for box in _interpret(content, mb_w, mb_h, cfg):
            out.append((page, box))
        page += 1
    return out, skipped


def realpdf_spans(text: str, cfg: ExtractConfig = DEFAULT_CONFIG):
    """Full real-PDF path → (spans, n_dropped) — downstream identical to
    ``pdflike_spans`` from the header/footer band drop onward (SPEC §3b)."""
    parsed, n_dropped = parse_realpdf(text, cfg)
    by_page: dict = {}
    for page, box in parsed:
        if box[3] <= cfg.header_y or box[1] >= cfg.footer_y:
            n_dropped += 1
            continue
        by_page.setdefault(page, []).append(box)

    spans = []
    for page in sorted(by_page):
        page_boxes = by_page[page]
        if cfg.merge_fragments:
            page_boxes = merge_fragments(page_boxes, y_tol=cfg.y_band, x_gap=cfg.y_band)
        if cfg.layout_mode == "walk":
            ordered = [b for b, _lay in layout_walk(page_boxes, cfg.page_w)]
        else:
            ordered = xy_cut(page_boxes, cfg)
        if cfg.merge_paragraphs:
            ordered = merge_paragraph_lines(ordered, cfg)
        for x0, y0, x1, y1, _i, t in ordered:
            clean = collapse_ws(t)
            if len(clean) < cfg.min_chars:
                if clean:
                    n_dropped += 1
                continue
            spans.append(("para", clean, 1.0, [x0, y0, x1, y1]))
    return spans, n_dropped
