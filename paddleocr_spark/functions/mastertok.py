"""TableMaster structure-token assembly: span merge, eb expansion, text fill.

The second half of the TableMaster scheme (the first half — the three-rule
box-match cascade — is ``operators/spatial.py table_master_match_pairs``):
the structure model emits an HTML *token stream* where cells are split
across tokens and empty cells are compressed into ``<eb>`` vocabulary
tokens; assembly glues span tokens, expands the eb vocabulary, and fills
matched OCR text into the N-th cell token.

Reference parity (/root/reference/ppstructure/table/table_master_match.py):
- ``merge_span_tokens``   ← ``merge_span_token`` (:488-538): a ``<td``
  opener followed by 1-2 `` rowspan=``/`` colspan=`` attribute tokens and a
  ``>`` closer becomes ONE cell token; the stream is cut at ``</tbody>``
  (appended if missing).
- ``expand_eb_token``     ← ``deal_eb_token`` (:539-573): the fixed
  empty-cell vocabulary (``<eb>``…``<eb10>``) expands to its literal
  ``<td>…</td>`` forms.
- ``dedup_bold_runs``     ← ``reduce_repeat_bb`` (:454-475): when EVERY
  matched text fragment is ``<b>``-wrapped, unwrap them and re-wrap the
  joined whole once.
- ``squash_split_spaces`` ← ``deal_successive_space`` (:439-453): triple
  spaces are real spaces, single spaces are tokenizer artifacts.
- ``fill_cell_texts``     ← ``insert_text_to_token`` (:574-602): walk the
  merged token stream; the k-th ``<td`` token receives ``cell_texts[k]``
  spliced between ``><``; unmatched cells stay empty; eb tokens expand
  after the splice.

All pure string functions (usable inside any Arrow batch); the per-turn
table path in the kernel parses real ``<table>`` HTML directly
(functions/htmltok.py), so these are exercised by the structure-token tests
and available to users feeding TableMaster-style token streams.
"""

from __future__ import annotations

from typing import Dict, List

_EB_EXPANSIONS = [
    ("<eb10></eb10>", "<td><b>     </b></td>"),
    ("<eb1></eb1>", "<td> </td>"),
    ("<eb2></eb2>", "<td><b> </b></td>"),
    ("<eb3></eb3>", "<td>  </td>"),
    ("<eb4></eb4>", "<td><sup> </sup></td>"),
    ("<eb5></eb5>", "<td><b></b></td>"),
    ("<eb6></eb6>", "<td><i> </i></td>"),
    ("<eb7></eb7>", "<td><b><i></i></b></td>"),
    ("<eb8></eb8>", "<td><b><i> </i></b></td>"),
    ("<eb9></eb9>", "<td><i></i></td>"),
    ("<eb></eb>", "<td></td>"),
]


def squash_split_spaces(text: str) -> str:
    """Single spaces are split-token artifacts, runs of three are one real
    space (deal_successive_space semantics)."""
    sentinel = "\x00"
    return text.replace(" " * 3, sentinel).replace(" ", "").replace(sentinel, " ")


def dedup_bold_runs(texts: List[str], break_token: str = " ") -> List[str]:
    """['<b>a</b>', '<b>b</b>'] → ['<b>a b</b>'] iff every fragment is
    bold-prefixed; otherwise unchanged (reduce_repeat_bb semantics)."""
    if texts and all(t.startswith("<b>") for t in texts):
        inner = [t.replace("<b>", "").replace("</b>", "") for t in texts]
        return ["<b>" + break_token.join(inner) + "</b>"]
    return list(texts)


def join_matched_texts(texts: List[str], break_token: str = " ") -> str:
    """Texts of all OCR boxes matched to one cell → the cell's fill string
    (get_match_text_dict semantics: bold-dedup then join)."""
    return break_token.join(dedup_bold_runs(texts, break_token))


def merge_span_tokens(tokens: List[str]) -> List[str]:
    """Glue '<td' + up to two ' rowspan='/' colspan=' attr tokens + '>' into
    one cell token; ensure and stop at '</tbody>'."""
    toks = list(tokens)
    if not toks or toks[-1] != "</tbody>":
        toks.append("</tbody>")
    out: List[str] = []
    i = 0

    def is_span(t: str) -> bool:
        return t.startswith(" colspan=") or t.startswith(" rowspan=")

    # NOTE on the reference: merge_span_token's two-attribute elif
    # (table_master_match.py:563-574) is unreachable — a '<td'+attr+attr
    # sequence always satisfies the one-attribute branch first, which joins
    # only 4 tokens and strands the cell's '</td>' (and with it the text
    # fill, since '><' never appears inside the opener token). The final
    # ''.join re-assembles the same HTML, so only double-span cell FILLS are
    # lost there. Here the double-attribute case is checked first — the
    # evidently intended semantics.
    # Truncated streams (e.g. tokens ending '<td', ' rowspan=…' right before
    # the appended '</tbody>') must degrade gracefully like the reference's
    # try/except (table_master_match.py:604-612), not index past the list:
    # every merge jump is bounded by the sentinel — the full slice must exist
    # and not swallow '</tbody>' — else the token is emitted verbatim
    # (round-2 ADVICE item #4).
    def _mergeable(n: int) -> bool:
        return i + n <= len(toks) and "</tbody>" not in toks[i : i + n]

    while i < len(toks) and toks[i] != "</tbody>":
        t = toks[i]
        if (
            t == "<td"
            and i + 2 < len(toks)
            and is_span(toks[i + 1])
            and is_span(toks[i + 2])
            and _mergeable(5)
        ):
            out.append("".join(toks[i : i + 5]))  # <td attr attr > + '</td>'
            i += 5
        elif (
            t == "<td"
            and i + 1 < len(toks)
            and is_span(toks[i + 1])
            and not (i + 2 < len(toks) and is_span(toks[i + 2]))
            and _mergeable(4)
        ):
            out.append("".join(toks[i : i + 4]))  # <td attr >  + '</td>'
            i += 4
        else:
            out.append(t)
            i += 1
    out.append("</tbody>")
    return out


def expand_eb_token(token: str) -> str:
    """Expand the TableMaster empty-cell vocabulary to literal cells."""
    for eb, td in _EB_EXPANSIONS:
        token = token.replace(eb, td)
    return token


def fill_cell_texts(tokens: List[str], cell_texts: Dict[int, str]) -> str:
    """Merged-token stream + {cell_index: text} → final HTML string
    (insert_text_to_token semantics: k-th '<td' token gets cell_texts[k]
    spliced between '><'; cells beyond the match dict are DROPPED from the
    output exactly as the reference's continue does; eb expansion last)."""
    merged = merge_span_tokens(tokens)
    out: List[str] = []
    k = 0
    n_cells = len(cell_texts)
    for tok in merged:
        if tok.startswith("<td"):
            if k > n_cells - 1 or k not in cell_texts:
                k += 1
                continue
            tok = tok.replace("><", ">{}<".format(cell_texts[k]))
            k += 1
        out.append(expand_eb_token(tok))
    return "".join(out)
