"""Public API: the ``PaddleOCR`` wheel-class analog.

The reference's 3.x surface is a thin class that merges constructor kwargs
into a config tree and delegates to the pipeline
(/root/reference/paddleocr/_pipelines/ocr.py:119-161 stores params;
/root/reference/paddleocr/_pipelines/base.py:90-109 merges + builds).
``TranscriptExtractor`` is the same shape over Spark: kwargs →
``ExtractConfig`` replace, ``predict`` → the extraction DataFrame operator.

``register_sql_functions`` additionally exposes the kernel to ``spark.sql``
— the analog of the reference's CLI/serving entry points
(``paddleocr ocr -i img.png``): any SQL user can call the extraction without
touching the Python API.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator

import pandas as pd  # module-level so pandas-UDF type hints resolve

from pyspark.sql import DataFrame, SparkSession

from .config import DEFAULT_CONFIG, ExtractConfig
from .operators.extract import extract, extract_ordered


class TranscriptExtractor:
    """detect→recognize→structure over transcript payloads, as one object.

    >>> ex = TranscriptExtractor(min_chars=5, merge_paragraphs=True)
    >>> out = ex.predict(transcripts_df)          # + spans, extracted_text
    >>> out = ex.predict(transcripts_df, ordered=True)

    Unknown kwargs raise immediately (the reference validates params the
    same way — unexpected keys fail at construction, not mid-run).
    """

    def __init__(self, **overrides):
        valid = {f.name for f in dataclasses.fields(ExtractConfig)}
        unknown = set(overrides) - valid
        if unknown:
            raise TypeError(
                f"unknown ExtractConfig parameter(s): {sorted(unknown)}; "
                f"valid: {sorted(valid)}"
            )
        self.cfg = dataclasses.replace(DEFAULT_CONFIG, **overrides)

    def predict(self, df: DataFrame, ordered: bool = False) -> DataFrame:
        """transcripts → + (payload_kind, spans, n_dropped, extracted_text,
        n_spans); with ``ordered`` the output is globally (conv_id,
        turn_idx)-ordered in a single extraction pass."""
        if ordered:
            return extract_ordered(df, cfg=self.cfg)
        return extract(df, cfg=self.cfg)


def register_sql_functions(
    spark: SparkSession, cfg: ExtractConfig = DEFAULT_CONFIG, prefix: str = "ps_"
) -> list:
    """Register the kernel for ``spark.sql`` use. Returns the names.

    - ``ps_extract_text(text)``  → extracted_text string
    - ``ps_payload_kind(text)``  → 'html' | 'pdf' | 'pdf_real' | 'plain'
    - ``ps_n_spans(text)``       → number of kept spans
    """
    from pyspark.sql import functions as F, types as T

    from .kernel import extract_batch

    def _make(col_builder, rtype):
        def fn(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for texts in batches:
                kinds, span_lists, extracted, n_spans, _, _tr = extract_batch(texts, cfg)
                yield col_builder(kinds, span_lists, extracted, n_spans)

        return F.pandas_udf(fn, rtype)

    names = []
    for name, builder, rtype in (
        (prefix + "extract_text", lambda k, s, e, n: pd.Series(e), T.StringType()),
        (prefix + "payload_kind", lambda k, s, e, n: pd.Series(k), T.StringType()),
        (
            prefix + "n_spans",
            lambda k, s, e, n: pd.Series(n, dtype="int32"),
            T.IntegerType(),
        ),
    ):
        spark.udf.register(name, _make(builder, rtype))
        names.append(name)
    return names
