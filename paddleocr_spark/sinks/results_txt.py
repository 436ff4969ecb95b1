"""Golden-format text sink: one line per turn, ``key \\t JSON``.

The ``system_results.txt`` sink parity (/root/reference/tools/infer/
predict_system.py:244-267,304-307 writes ``image_name \\t
JSON[{transcription, points}]`` and test_tipc/compare_results.py:10-16
diffs those files as the regression gate). Here the key is
``conv_id:turn_idx`` and the JSON is the ordered span array — so two runs of
the engine (or the engine vs an external reimplementation) can be diffed
line-by-line with standard tools.

The line is assembled ENTIRELY JVM-side (``concat`` + ``to_json``); the write
is a plain text sink, globally ordered by range partition + in-partition sort
(no single-point sort)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def results_lines(df: DataFrame) -> DataFrame:
    """extraction output → single-column ``value`` lines (ordered)."""
    line = F.concat(
        F.col("conv_id"),
        F.lit(":"),
        F.col("turn_idx").cast("string"),
        F.lit("\t"),
        F.to_json(
            F.struct(
                F.col("payload_kind"),
                F.col("spans"),
                F.col("extracted_text"),
            )
        ),
    )
    n = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col("conv_id"), F.col("turn_idx"), line.alias("value"))
        .repartitionByRange(n, "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .select("value")
    )


def write_system_results(df: DataFrame, path: str) -> None:
    """Write the golden-format file tree (one part file per range)."""
    results_lines(df).write.mode("overwrite").text(path)
