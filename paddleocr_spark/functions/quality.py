"""Gopher-style quality signals + FineWeb-style tier routing as columns.

Single home for the expressions behind the driver query ``gopher_quality``
(__spark_entry__.py) and the composed curation pipeline (plans/curate.py):
public Gopher/MassiveText rules (word-count band, mean-word-length band,
alphabetic-token fraction), repetition signals (duplicate-trigram fraction,
type-token ratio), the keep verdict, and the 3-level tier on top. All
floored micro-units (integer-exact in any engine), all JVM built-ins over
the normalized token array — one scan, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .textstats import norm_text


def quality_columns(text: Column) -> dict[str, Column]:
    """Signal name → column, over one tokenization of ``text``.

    Keys: n_tokens, mean_word_len_micro, alpha_frac_micro, keep (boolean),
    n_trigrams, n_trigrams_distinct, rep_micro, ttr_micro, tier (int 0..2).
    """
    toks = F.split(norm_text(text), " ")
    n = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$")))
    mean_len_micro = F.floor(F.lit(1000000.0) * sum_len / F.greatest(n, F.lit(1)))
    alpha_micro = F.floor(F.lit(1000000.0) * n_alpha / F.greatest(n, F.lit(1)))
    keep = (
        (n >= 50)
        & (n <= 100000)
        & (mean_len_micro >= 3000000)
        & (mean_len_micro <= 10000000)
        & (alpha_micro >= 800000)
    )
    tri = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 2, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 2, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        F.slice(toks, 3, F.greatest(n - 2, F.lit(0))),
        lambda ab, c: F.concat(ab, F.lit(" "), c),
    )
    n_tri = F.size(tri)
    n_tri_d = F.size(F.array_distinct(tri))
    rep_micro = F.floor(
        F.lit(1000000.0) * (n_tri - n_tri_d) / F.greatest(n_tri, F.lit(1))
    )
    ttr_micro = F.floor(
        F.lit(1000000.0) * F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    )
    tier = (
        F.when(keep & (rep_micro <= 100000) & (ttr_micro >= 300000), F.lit(2))
        .when(keep, F.lit(1))
        .otherwise(F.lit(0))
    )
    return {
        "n_tokens": n,
        "mean_word_len_micro": mean_len_micro,
        "alpha_frac_micro": alpha_micro,
        "keep": keep,
        "n_trigrams": n_tri,
        "n_trigrams_distinct": n_tri_d,
        "rep_micro": rep_micro,
        "ttr_micro": ttr_micro,
        "tier": tier,
    }
