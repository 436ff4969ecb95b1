"""Flagship query: full extraction over the synthesized transcript corpus.

This is the engine's ``predict_system.py``-equivalent end-to-end run
(/root/reference/tools/infer/predict_system.py:184-307): scan → extract →
stable order, returning one row per turn with ordered spans + extracted text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import ExtractConfig, DEFAULT_CONFIG
from ..corpus import transcripts_df
from ..operators.extract import extract, ordered_output


def flagship(
    spark: SparkSession,
    sf_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    reps: int = 1,
    base_turns: int = 4,
    ordered: bool = True,
) -> DataFrame:
    df = transcripts_df(spark, sf_dir, reps=reps, base_turns=base_turns)
    out = extract(df, cfg=cfg)
    return ordered_output(out) if ordered else out
