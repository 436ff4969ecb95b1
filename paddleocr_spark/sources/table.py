"""Transcript table source: Iceberg catalog table or parquet path.

The reference's source is a directory walk (`get_image_file_list`,
/root/reference/ppocr/utils/utility.py used at
/root/reference/tools/infer/predict_system.py:186); here the source is a
table scan (SURVEY.md §2.1 row 1). Production reads an Iceberg table
(partition pruning on conv_id buckets / ts days comes for free through the
catalog); the sandbox has no catalog, so a parquet path is the fallback with
the identical downstream contract.

Schema contract (BASELINE.json ``input_hint``): the scan must carry
``conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp``. ``read_transcripts`` validates the required columns exist and
prunes to exactly this set, so extraction plans never drag extra columns
through the Arrow crossing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


_DATA_FILE_EXTS = {"parquet", "json", "jsonl", "csv", "orc", "avro", "txt"}


def is_table_ref(source: str) -> bool:
    """True only for dotted ``catalog.db.table``-style references.

    A bare name with no separator at all (``job.py --out results``) is a
    relative output directory, not a table — treating it as a table made the
    parquet sink unreachable for relative paths (round-2 ADVICE item #1).
    Dotted names ending in a data-file extension (``results.parquet``) are
    also paths."""
    if "/" in source or "\\" in source or "." not in source:
        return False
    return source.rsplit(".", 1)[-1].lower() not in _DATA_FILE_EXTS


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Load the transcript table from an Iceberg table name or parquet path.

    - ``catalog.db.table`` (no slash) → ``spark.read.table`` (Iceberg/Hive —
      whatever the session catalog resolves; snapshot-isolated scans, hidden
      partitioning, metadata-only partition pruning).
    - otherwise → ``spark.read.parquet(path)``.
    """
    if is_table_ref(source):
        df = spark.read.table(source)
    else:
        df = spark.read.parquet(source)
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"transcript source {source!r} is missing required columns "
            f"{missing}; expected {TRANSCRIPT_COLUMNS} (BASELINE.json input_hint)"
        )
    # explicit projection: column pruning reaches the scan even if callers
    # compose further ops that would otherwise keep extra columns alive
    return df.select(*TRANSCRIPT_COLUMNS)
