"""Curriculum mixing — deterministic stratified sampling over quality tiers.

The training-data analog of the reference's seeded ratio sampling
(`/root/reference/ppocr/data/simple_dataset.py:58-70` SimpleDataSet
ratio_list: per-source keep fractions applied at load time): after quality
scoring routes every document into a tier (see ``q_gopher_quality``'s
``tier`` column — FineWeb-style 0 = drop / 1 = keep / 2 = high-quality), a
mixing stage downsamples each tier to a target rate and unions sources at
per-source rates to hit a curriculum mixture.

Why hash-mod and not ``rand(seed)``: Spark seeds ``rand`` PER PARTITION, so
the sampled set changes whenever partitioning changes — a rerun on a
different cluster size (the north rule's N vs 4N) or after AQE coalescing
selects DIFFERENT rows. ``md5(doc_id)`` is a pure row function: the same
document gets the same verdict on any cluster, any partitioning, any engine
(DuckDB mirrors it exactly — the driver-visible ``mix_keep`` column in
``gopher_quality`` is this operator's decision at rates (0, 0.5, 1.0)).

Scale shape at 100 TB: both operators are filter-only — zero shuffles, zero
Python; the filter fuses into whatever scan/codegen stage precedes it, and
downstream stages see fewer rows. Changing the mixture re-runs only a
predicate, not a shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

# 2 hex chars of md5 → uniform bucket in [0, 256). Rates are quantized to
# 1/256 — document the quantum rather than pretending float precision.
_BUCKETS = 256


def _bucket(id_col: str) -> F.Column:
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10
    ).cast("long")


def tier_rate_predicate(
    rates: Sequence[float], tier_col: str = "tier", id_col: str = "doc_id"
) -> F.Column:
    """Boolean column: does this row survive stratified sampling where tier
    ``i`` keeps ``rates[i]`` of its rows (deterministically, by id hash)?"""
    thresholds = F.array(
        *[F.lit(int(round(r * _BUCKETS))) for r in rates]
    )
    # F.get (0-based) yields NULL for out-of-range tiers → predicate false;
    # element_at would raise under Spark 4's default ANSI mode.
    return _bucket(id_col) < F.get(thresholds, F.col(tier_col).cast("int"))


def curriculum_sample(
    df: DataFrame,
    rates: Sequence[float],
    tier_col: str = "tier",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ``rates[tier]`` of each tier's rows, deterministically.

    ``rates[i]`` ∈ [0, 1] is the keep fraction for tier ``i`` (quantized to
    1/256). Tiers outside ``range(len(rates))`` are dropped (``F.get`` on a
    missing index yields NULL → filter false), so ``rates=(0.0, 0.5, 1.0)``
    over the 3-tier ``gopher_quality`` routing means: drop tier 0, keep half
    of tier 1, keep all of tier 2.
    """
    return df.where(tier_rate_predicate(rates, tier_col, id_col))


def mix_sources(
    sources: Sequence[tuple[DataFrame, float]], id_col: str = "doc_id"
) -> DataFrame:
    """Union sources at per-source keep rates (the multi-source ratio_list
    analog): each (df, rate) contributes a deterministic ``rate`` fraction
    of its rows by id hash; schemas align by name (missing columns null).

    The per-source filter happens BEFORE the union, so at scale each source
    scan emits only its sampled fraction — no post-union shuffle or
    re-sample pass.
    """
    if not sources:
        raise ValueError("mix_sources needs at least one (df, rate) source")
    parts = []
    for df, rate in sources:
        pred = _bucket(id_col) < F.lit(int(round(rate * _BUCKETS)))
        parts.append(df.where(pred))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
