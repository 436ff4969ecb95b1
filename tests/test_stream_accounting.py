"""Streaming sketch accounting — the accumulated HLL/Bloom state after a
multi-batch stream must equal the one-shot sketch over the union of all
batches (merge correctness), and membership probes against the accumulated
Bloom must see every streamed fingerprint."""

import pyspark.sql.functions as F

from paddleocr_spark.operators.sketch import (
    bloom_build,
    bloom_probe,
    hll_registers,
)
from paddleocr_spark.streaming.accounting import (
    accounting_foreach_batch,
    read_bloom_state,
    read_hll_state,
)


def _fps(spark, lo, hi):
    return spark.range(lo, hi).select(F.md5(F.col("id").cast("string")).alias("fp"))


def test_stream_accounting_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    # three "arrivals" of 300 fingerprints each, overlapping ranges
    for lo, hi in ((0, 300), (200, 500), (450, 750)):
        _fps(spark, lo, hi).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("fp string")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(accounting_foreach_batch(state))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    everything = _fps(spark, 0, 750)
    want_regs = {
        r["bucket"]: r["register"]
        for r in hll_registers(everything, F.col("fp")).collect()
    }
    got_regs = {
        r["bucket"]: r["register"]
        for r in read_hll_state(spark, state).collect()
    }
    assert got_regs == want_regs

    want_bloom = {
        r["word"]: r["bits"]
        for r in bloom_build(everything, F.col("fp")).collect()
    }
    got_bloom = {
        r["word"]: r["bits"] for r in read_bloom_state(spark, state).collect()
    }
    assert got_bloom == want_bloom

    # every streamed fp is a member of the accumulated bloom
    probed = bloom_probe(
        everything, F.col("fp"), read_bloom_state(spark, state)
    )
    assert all(r["bloom_hit"] == 1 for r in probed.collect())


def test_stream_accounting_versioned_crash_safe(spark, tmp_path):
    """Durability contract (r03 advice): merges write NEW version dirs and
    never mutate what they read; readers pick the latest _SUCCESS-committed
    version, so a partial/failed write (no _SUCCESS) is invisible; GC keeps
    the last two versions; replaying the same batch is a no-op (idempotent
    max/bit_or merges)."""
    import os

    from paddleocr_spark.streaming.accounting import (
        _committed_versions,
        merge_hll_state,
    )

    state = str(tmp_path / "state")
    base = f"{state}/hll_registers"
    b1 = hll_registers(_fps(spark, 0, 100), F.col("fp"))
    b2 = hll_registers(_fps(spark, 100, 200), F.col("fp"))
    merge_hll_state(spark, b1, state)
    merge_hll_state(spark, b2, state)
    want = {
        r["bucket"]: r["register"]
        for r in hll_registers(_fps(spark, 0, 200), F.col("fp")).collect()
    }
    got = {r["bucket"]: r["register"] for r in read_hll_state(spark, state).collect()}
    assert got == want
    vs = _committed_versions(spark, base)
    assert len(vs) <= 2 and vs[-1] == 1  # GC keeps ≤2, latest is v=1

    # replay of an already-folded batch: state unchanged (idempotent merge)
    merge_hll_state(spark, b2, state)
    got2 = {r["bucket"]: r["register"] for r in read_hll_state(spark, state).collect()}
    assert got2 == want

    # a crashed (uncommitted) newer version is invisible to readers
    latest = _committed_versions(spark, base)[-1]
    fake = f"{base}/v={latest + 1}"
    os.makedirs(fake)
    with open(f"{fake}/part-00000.parquet", "w") as f:
        f.write("partial garbage, no _SUCCESS")
    got3 = {r["bucket"]: r["register"] for r in read_hll_state(spark, state).collect()}
    assert got3 == want
