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
    return _cached(
        spark,
        f"corpus_{_tag(sf_dir, reps, base_turns)}",
        lambda: transcripts_df(spark, sf_dir, reps=reps, base_turns=base_turns),
    )


def _tag(sf_dir: str, reps: int, base_turns: int, extra: str = "") -> str:
    """Cache key: path + params + a content fingerprint (size/mtime of
    documents.parquet) so a swapped source file invalidates the cache."""
    doc = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(doc)
        stamp = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        stamp = "missing"
    from ..corpus import CORPUS_VERSION

    key = f"v{CORPUS_VERSION}:{os.path.abspath(sf_dir)}:{reps}:{base_turns}:{stamp}:{extra}"
    return hashlib.md5(key.encode()).hexdigest()[:16]


def _cached(spark: SparkSession, name: str, build) -> DataFrame:
    # Driver-local /tmp only exists as a shared path in local[*] mode. On a
    # real cluster executors can't read the driver's /tmp, so the cache would
    # silently degrade to rebuild-per-query (or worse, fail mid-scan) —
    # bypass it entirely there; production runs persist through the
    # checkpoint sink (sinks/checkpoint.py) instead.
    if not spark.sparkContext.master.startswith("local"):
        return build()
    path = os.path.join(_CACHE_ROOT, f"{name}.parquet")
    try:
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            os.makedirs(_CACHE_ROOT, exist_ok=True)
            tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
            build().write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, path)
            except OSError:  # lost a (non-driver) race: another run landed it
                shutil.rmtree(tmp, ignore_errors=True)
        return spark.read.parquet(path)
    except Exception:
        return build()


def _cfg_digest(cfg: ExtractConfig) -> str:
    import dataclasses
    import json

    d = dataclasses.asdict(cfg)
    d["boiler_tags"] = sorted(d["boiler_tags"])
    return hashlib.md5(json.dumps(d, sort_keys=True).encode()).hexdigest()[:12]


def flagship(
    spark: SparkSession,
    sf_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    reps: int = 1,
    base_turns: int = 4,
    ordered: bool = True,
    cache_extraction: bool = True,
) -> DataFrame:
    """Full pipeline; with ``cache_extraction`` the extraction OUTPUT is also
    cached (keyed by corpus tag + cfg digest, deterministic), so the several
    flagship-derived driver queries pay the pandas-UDF pass once."""
    if cache_extraction:
        tag = _tag(sf_dir, reps, base_turns, extra=_cfg_digest(cfg))
        out = _cached(
            spark,
            f"extract_{tag}",
            lambda: extract(
                corpus_df(spark, sf_dir, reps=reps, base_turns=base_turns), cfg=cfg
            ),
        )
    else:
        out = extract(
            corpus_df(spark, sf_dir, reps=reps, base_turns=base_turns), cfg=cfg
        )
    return ordered_output(out) if ordered else out
