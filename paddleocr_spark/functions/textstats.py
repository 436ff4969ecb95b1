"""Text-analysis scalar functions over document/transcript text.

These are the engine's corpus-analytics layer (token counting, quality
scoring, language-ID, fingerprinting) — the per-document analogs of the
reference's recognition post-metrics (/root/reference/ppocr/metrics/
rec_metric.py:39-78 computes exact-match + normalized edit distance; here the
"recognized text" is the document body and the metrics are corpus-quality
signals used by a training-data pipeline).

Every function is a pure Spark Column builder using ONLY built-in
``pyspark.sql.functions`` (JVM-side, whole-stage codegen — zero Python).
Each has an exactly-matching DuckDB SQL form in ``__spark_entry__.oracle_sql``;
to keep the value-hash comparison exact we emit integers and strings only
(ratios are scaled to micro-units and floored, so both engines do identical
IEEE-double arithmetic and identical flooring).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Per-language marker-word sets for the n-gram/stopword language heuristic.
# Deterministic and tiny by design: the analog of the reference's charset-based
# lang routing (dict files under ppocr/utils/dict/, selected per lang in
# paddleocr/_pipelines/ocr.py:308-511).
LANG_MARKERS = {
    "en": ("the", "a", "of", "to", "is", "and"),
    "de": ("der", "die", "und", "das", "ist", "mit"),
    "es": ("el", "la", "de", "y", "en", "es"),
}
STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))


def norm_text(col: Column) -> Column:
    """lower + collapse whitespace + trim — canonical form for hashing/dedup."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(col), " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (exact-dup key)."""
    return F.md5(norm_text(col))


ROLL_BASE = 257
ROLL_MOD = 2147483647  # 2^31 - 1: acc*257 + 65535 < 2^40, no 64-bit overflow


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling hash over the token stream (Rabin-Karp style):
    h = Σ tokhash(tᵢ)·B^(n−i) mod M, folded left-to-right; tokhash = first 4
    hex digits of md5 (engine-portable). Exact integer arithmetic → identical
    in any engine; unlike the whole-doc md5 it composes incrementally, the
    shape used for content-defined chunking at corpus scale."""
    tok_h = lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long")
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLL_BASE + tok_h(t)) % ROLL_MOD,
    )


def stop_hits(col: Column) -> Column:
    """Number of tokens that are corpus stopwords."""
    arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def stop_ratio_micro(col: Column) -> Column:
    """floor(1e6 * stop_hits / n_tokens) — integer quality signal."""
    return F.floor(
        F.lit(1000000.0) * stop_hits(col) / token_count(col)
    ).cast("long")


def punct_count(col: Column) -> Column:
    """Characters that are not [a-z0-9 ] after normalization."""
    n = norm_text(col)
    return (F.length(n) - F.length(F.regexp_replace(n, r"[^a-z0-9 ]", ""))).cast(
        "long"
    )


def lang_hits(col: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def lang_guess(col: Column) -> Column:
    """Argmax over marker hits with deterministic tiebreak en > de > es;
    'unknown' when no marker hits at all."""
    en, de, es = (lang_hits(col, L) for L in ("en", "de", "es"))
    return (
        F.when((en == 0) & (de == 0) & (es == 0), F.lit("unknown"))
        .when((en >= de) & (en >= es), F.lit("en"))
        .when(de >= es, F.lit("de"))
        .otherwise(F.lit("es"))
    )
