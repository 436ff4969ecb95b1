"""Incremental corpus accounting over a stream: sketch state per micro-batch.

The 100 TB ingestion story: a continuously-arriving transcript corpus needs
running answers to "how many distinct documents so far?" and "have we seen
this document in ANY earlier batch?" without ever re-scanning history.
The sketch relations (operators/sketch.py) are mergeable by construction —
HLL registers max-merge, Bloom words bit_or-merge — so per-batch state folds
into a tiny accumulated parquet state dir via foreachBatch: each commit
writes ≤ (64 + 2048) rows regardless of history size.

(The same shape the reference uses for eval-state accumulation across
batches, /root/reference/ppocr/metrics/det_metric.py:58-94 — fixed-size
state, merge per batch.)

Durability contract (the round-3 advice item): state lives in VERSIONED
subdirectories ``<state>/v=N`` — a merge reads the latest committed version
and writes version N+1 to a fresh path, never mutating what it read, so a
crash at any point leaves the previous version intact. Commit validity is
the parquet ``_SUCCESS`` marker (readers skip versions without it), and all
filesystem probing goes through the Hadoop FileSystem API, so the same code
runs against HDFS/S3/local alike — no ``os.path`` driver-local assumptions.
Replayed micro-batches (foreachBatch at-least-once) are harmless without any
version bookkeeping because both merges are idempotent semilattice joins
(max / bit_or): re-folding a batch already in the state is a no-op.

foreachBatch (not a stateful operator) because the state is a RELATION
(register/bitmap rows), and batch-granular exactly-once is what the
checkpointed sink already provides; applyInPandasWithState would put the
same few KiB in the state store with none of the inspectability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sketch import bloom_build, hll_registers

_KEEP_VERSIONS = 2  # latest + previous (reader-in-flight safety margin)


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _committed_versions(spark: SparkSession, base: str) -> list:
    """Sorted version numbers under ``base`` whose _SUCCESS marker exists."""
    fs, hpath, jvm = _fs(spark, base)
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if not name.startswith("v="):
            continue
        try:
            v = int(name[2:])
        except ValueError:
            continue
        if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{base}/v={v}/_SUCCESS")):
            out.append(v)
    return sorted(out)


def _merge_versioned(
    spark: SparkSession, batch_df: DataFrame, base: str, key: str, agg
) -> None:
    """Read latest committed version (if any), merge, write version+1 to a
    fresh dir, then best-effort GC versions older than the last two."""
    versions = _committed_versions(spark, base)
    merged = batch_df
    if versions:
        prev = spark.read.parquet(f"{base}/v={versions[-1]}")
        merged = prev.unionByName(batch_df).groupBy(key).agg(agg)
    nxt = versions[-1] + 1 if versions else 0
    merged.coalesce(1).write.mode("overwrite").parquet(f"{base}/v={nxt}")
    fs, _, jvm = _fs(spark, base)
    for old in versions[: -(_KEEP_VERSIONS - 1)] if _KEEP_VERSIONS > 1 else versions:
        try:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{base}/v={old}"), True)
        except Exception:
            pass  # GC is best-effort; a leftover version is still correct


def merge_hll_state(spark: SparkSession, batch_regs: DataFrame, state_dir: str) -> None:
    """Fold a batch's HLL registers into the accumulated register state
    (max-merge). Writes ≤64 rows to a new version dir."""
    _merge_versioned(
        spark,
        batch_regs,
        f"{state_dir}/hll_registers",
        "bucket",
        F.max("register").alias("register"),
    )


def merge_bloom_state(spark: SparkSession, batch_bloom: DataFrame, state_dir: str) -> None:
    """Fold a batch's Bloom words into the accumulated bitmap (bit_or-merge).
    Writes ≤2048 rows to a new version dir."""
    _merge_versioned(
        spark,
        batch_bloom,
        f"{state_dir}/bloom_words",
        "word",
        F.bit_or("bits").alias("bits"),
    )


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


def _read_latest(spark: SparkSession, base: str) -> DataFrame:
    versions = _committed_versions(spark, base)
    if not versions:
        raise FileNotFoundError(f"no committed sketch state under {base}")
    return spark.read.parquet(f"{base}/v={versions[-1]}")


def read_hll_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return _read_latest(spark, f"{state_dir}/hll_registers")


def read_bloom_state(spark: SparkSession, state_dir: str) -> DataFrame:
    return _read_latest(spark, f"{state_dir}/bloom_words")
