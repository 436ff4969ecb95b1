"""Structure-results sink: one JSON line per REGION (span), typed.

The ``save_structure_res`` parity (/root/reference/ppstructure/
predict_system.py:274-301): the reference writes per-image ``res_{idx}.txt``
files where each line is one region dict ``{"type": label, "bbox": [...],
"res": …, "img_idx": int}`` (image crops/xlsx side-files excluded — binary
writers stay out of scope). Here the same relation is one distributed JSONL
dataset keyed by (conv_id, turn_idx, span_idx): a posexplode of the span
arrays, rendered ENTIRELY JVM-side with ``to_json`` and written as text —
no per-file driver loop, no Python in the path.

Line schema (sorted by key within range partitions, diffable like the
reference's files):

    {"conv_id": …, "turn_idx": n, "span_idx": n, "type": kind,
     "bbox": [x0,y0,x1,y1]|null, "res": {"text": …, "confidence": s}}
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def structure_lines(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """extraction output → one ``value`` JSON line per span, ordered."""
    exploded = df.select(
        "conv_id", "turn_idx", F.explode(F.col(spans_col)).alias("s")
    )
    line = F.to_json(
        F.struct(
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("s.span_idx").alias("span_idx"),
            F.col("s.kind").alias("type"),
            F.col("s.bbox").alias("bbox"),
            F.struct(
                F.col("s.text").alias("text"),
                F.col("s.score").alias("confidence"),
            ).alias("res"),
        )
    )
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        exploded.select(
            "conv_id", "turn_idx", F.col("s.span_idx").alias("span_idx"),
            line.alias("value"),
        )
        .repartitionByRange(n, "conv_id", "turn_idx", "span_idx")
        .sortWithinPartitions("conv_id", "turn_idx", "span_idx")
        .select("value")
    )


def write_structure_results(df: DataFrame, path: str) -> None:
    """Write the region-JSONL file tree (one part file per range)."""
    structure_lines(df).write.mode("overwrite").text(path)
