"""Flagship query: full extraction over the synthesized transcript corpus.

This is the engine's ``predict_system.py``-equivalent end-to-end run
(/root/reference/tools/infer/predict_system.py:184-307): scan → extract →
stable order, returning one row per turn with ordered spans + extracted text.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..config import ExtractConfig, DEFAULT_CONFIG
from ..corpus import transcripts_df
from ..operators.extract import extract, ordered_output

_CACHE_ROOT = "/tmp/paddleocr_spark_corpus_cache"


def corpus_df(
    spark: SparkSession, sf_dir: str, reps: int = 1, base_turns: int = 4
) -> DataFrame:
    """Deterministic transcript corpus, cached as parquet under /tmp.

    The corpus is a pure function of (sf_dir documents, reps, base_turns), so
    it is synthesized once and reused — repeated queries (the driver runs
    each `queries()` entry separately) skip the generation pass. Written to a
    temp dir then atomically renamed; falls back to direct generation if the
    cache dir is unusable."""
    tag = hashlib.md5(f"{os.path.abspath(sf_dir)}:{reps}:{base_turns}".encode()).hexdigest()[:16]
    path = os.path.join(_CACHE_ROOT, f"corpus_{tag}.parquet")
    try:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            os.makedirs(_CACHE_ROOT, exist_ok=True)
            tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
            transcripts_df(spark, sf_dir, reps=reps, base_turns=base_turns).write.mode(
                "overwrite"
            ).parquet(tmp)
            try:
                os.rename(tmp, path)
            except OSError:  # lost a (non-driver) race: another run landed it
                shutil.rmtree(tmp, ignore_errors=True)
        return spark.read.parquet(path)
    except Exception:
        return transcripts_df(spark, sf_dir, reps=reps, base_turns=base_turns)


def flagship(
    spark: SparkSession,
    sf_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    reps: int = 1,
    base_turns: int = 4,
    ordered: bool = True,
) -> DataFrame:
    df = corpus_df(spark, sf_dir, reps=reps, base_turns=base_turns)
    out = extract(df, cfg=cfg)
    return ordered_output(out) if ordered else out
