"""Incremental corpus accounting over a stream: sketch state per micro-batch.

The 100 TB ingestion story: a continuously-arriving transcript corpus needs
running answers to "how many distinct documents so far?" and "have we seen
this document in ANY earlier batch?" without ever re-scanning history.
The sketch relations (operators/sketch.py) are mergeable by construction —
HLL registers max-merge, Bloom words bit_or-merge — so per-batch state folds
into a tiny accumulated parquet state dir via foreachBatch: each commit
rewrites ≤ (64 + 2048) rows regardless of history size.

(The same shape the reference uses for eval-state accumulation across
batches, /root/reference/ppocr/metrics/det_metric.py:58-94 — fixed-size
state, merge per batch.)

foreachBatch (not a stateful operator) because the state is a RELATION
(register/bitmap rows), and batch-granular exactly-once is what the
checkpointed sink already provides; applyInPandasWithState would put the
same few KiB in the state store with none of the inspectability.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sketch import bloom_build, hll_registers


def merge_hll_state(spark: SparkSession, batch_regs: DataFrame, state_dir: str) -> None:
    """Fold a batch's HLL registers into the accumulated register state
    (max-merge). Rewrites ≤64 rows."""
    path = os.path.join(state_dir, "hll_registers")
    merged = batch_regs
    if os.path.exists(path):
        prev = spark.read.parquet(path)
        merged = (
            prev.unionByName(batch_regs)
            .groupBy("bucket")
            .agg(F.max("register").alias("register"))
        )
    rows = merged.collect()  # ≤64 rows — driver-sized by construction
    spark.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def merge_bloom_state(spark: SparkSession, batch_bloom: DataFrame, state_dir: str) -> None:
    """Fold a batch's Bloom words into the accumulated bitmap (bit_or-merge).
    Rewrites ≤2048 rows."""
    path = os.path.join(state_dir, "bloom_words")
    merged = batch_bloom
    if os.path.exists(path):
        prev = spark.read.parquet(path)
        merged = (
            prev.unionByName(batch_bloom)
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
        )
    rows = merged.collect()  # ≤2048 rows
    spark.createDataFrame(rows, merged.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def accounting_foreach_batch(state_dir: str, fp_col: str = "fp"):
    """foreachBatch sink: per micro-batch, build the batch's HLL registers +
    Bloom words over ``fp_col`` and merge both into ``state_dir``. The batch
    pays one pass; the merge touches only sketch-sized relations."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        col = F.col(fp_col)
        merge_hll_state(spark, hll_registers(batch_df, col), state_dir)
        merge_bloom_state(spark, bloom_build(batch_df, col), state_dir)

    return _sink


def read_hll_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir, "hll_registers"))


def read_bloom_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(state_dir, "bloom_words"))
