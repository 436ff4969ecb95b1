"""Bucketed-table sink: pay the partitioning shuffle ONCE at write time,
then join/aggregate on the bucket key forever without an Exchange.

The reference has no notion of co-located storage — every run of
``predict_system.py`` re-lists and re-shards its input files ad hoc
(/root/reference/tools/infer/predict_system.py:186-187). At 100 TB the
equivalent waste is a full shuffle of the corpus every time extraction
output is joined back to turn-level side data (KIE annotations, quality
scores, dedup verdicts — all keyed by conv_id/turn_idx). Spark's bucketed
tables fix the cost at write time: ``bucketBy(N, conv_id)`` hash-partitions
files on disk and records the layout in the catalog, so a later equi-join
of two tables bucketed the same way reads both sides already co-located —
the physical plan contains NO Exchange on either side (gated in
tests/test_plans.py::test_bucketed_join_has_no_exchange).

This is the persistent-storage complement of the checkpoint sink's
``bucket`` column (sinks/checkpoint.py): the checkpoint's pmod-xxhash64
bucket drives RESUME granularity; Spark's bucketBy drives JOIN locality.
On Iceberg the same declaration is the ``bucket(N, conv_id)`` partition
transform (docs/SCALE_100TB.md).

Sandbox note: bucketed tables require a session catalog (the embedded
derby metastore suffices — no Iceberg jars needed), so tables land under
``spark.sql.warehouse.dir``. ``mode="overwrite"`` drops and rewrites the
table atomically from the reader's perspective (catalog swap).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    keys: Sequence[str] = ("conv_id",),
    sort_keys: Sequence[str] | None = ("conv_id", "turn_idx"),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet bucketed table.

    ``keys`` are the co-location keys (join/groupBy on exactly these columns
    later needs no shuffle); ``sort_keys`` additionally sorts within each
    bucket file, which lets a sort-merge join skip its Sort too and makes
    range predicates on the sort key skip row groups. ``n_buckets`` must
    match between tables that will be joined (Spark only elides the
    Exchange when both sides agree).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_keys:
        w = w.sortBy(*sort_keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its layout metadata (a plain
    ``spark.read.parquet`` of the same files would LOSE the bucket spec and
    reintroduce the shuffle — always read through the catalog)."""
    return spark.table(table)
