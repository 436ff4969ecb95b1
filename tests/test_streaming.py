"""Structured Streaming mode tests: streaming output ≡ batch output."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from paddleocr_spark.corpus import generate_rows
from paddleocr_spark.operators.extract import extract
from paddleocr_spark.streaming.stream import (
    extract_foreach_batch,
    extract_stream,
    read_transcript_stream,
)

WORDS = "stream alpha beta gamma delta nav footer main content link".split()


@pytest.fixture(scope="module")
def staged_input(spark, tmp_path_factory):
    """Transcripts written as multiple parquet files (a file-stream source)."""
    root = str(tmp_path_factory.mktemp("stream_in"))
    from paddleocr_spark.streaming.stream import TRANSCRIPT_DDL

    rows = list(generate_rows([(i, " ".join(WORDS)) for i in range(1, 9)]))
    df = spark.createDataFrame(
        [tuple(r.values()) for r in rows], TRANSCRIPT_DDL
    )
    df.repartition(4).write.mode("overwrite").parquet(root)
    return root, df


def _collect_sorted(df):
    return [
        tuple(r)
        for r in df.select("conv_id", "turn_idx", "payload_kind", "extracted_text")
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]


def test_stream_matches_batch(spark, staged_input, tmp_path):
    root, df = staged_input
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = extract_stream(
        read_transcript_stream(spark, root, max_files_per_trigger=2), out, ck
    )
    q.awaitTermination(120)
    got = _collect_sorted(spark.read.parquet(out))
    want = _collect_sorted(extract(df))
    assert got == want


def test_foreach_batch_sink(spark, staged_input, tmp_path):
    root, df = staged_input
    out = str(tmp_path / "out_fb")
    ck = str(tmp_path / "ck_fb")
    q = extract_foreach_batch(
        read_transcript_stream(spark, root, max_files_per_trigger=2),
        out,
        ck,
        n_buckets=4,
    )
    q.awaitTermination(180)
    batches = [d for d in os.listdir(out) if d.startswith("batch=")]
    assert batches  # at least one micro-batch committed
    from functools import reduce

    data = reduce(
        lambda a, b: a.unionByName(b),
        [spark.read.parquet(os.path.join(out, b, "data")) for b in batches],
    )
    assert data.count() == df.count()
    assert data.select("conv_id", "turn_idx").distinct().count() == df.count()


def test_conversation_progress_stateful(spark, staged_input, tmp_path):
    """State carries across micro-batches: final update per conversation
    equals its total turn count."""
    from paddleocr_spark.streaming.stream import conversation_progress

    root, df = staged_input
    out = str(tmp_path / "prog")
    ck = str(tmp_path / "ck_prog")
    prog = conversation_progress(
        read_transcript_stream(spark, root, max_files_per_trigger=1)
    )

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    q = (
        prog.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    updates = spark.read.parquet(out)
    assert updates.select("batch_id").distinct().count() > 1  # state crossed batches
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy(F.col("batch_id").desc())
    final = (
        updates.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select("conv_id", "turns_seen", "max_turn_idx")
    )
    want = df.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns_seen"),
        F.max("turn_idx").alias("max_turn_idx"),
    )
    assert final.exceptAll(want).count() == 0 and want.exceptAll(final).count() == 0


def test_windowed_turn_counts_with_watermark(spark, staged_input, tmp_path):
    """Watermark + tumbling window over event time: closed windows match the
    batch groupBy, late state is bounded."""
    from paddleocr_spark.streaming.stream import windowed_turn_counts

    root, df = staged_input
    out = str(tmp_path / "win")
    ck = str(tmp_path / "ck_win")
    q = (
        windowed_turn_counts(
            read_transcript_stream(spark, root, max_files_per_trigger=2),
            window="10 minutes",
            watermark="5 minutes",
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    want = (
        df.groupBy(F.window("ts", "10 minutes").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "role",
            "n_turns",
        )
    )
    # append mode emits only windows closed past the watermark; all emitted
    # rows must match the batch result exactly, and most windows close
    assert got.exceptAll(want).count() == 0
    assert got.count() >= want.count() - 4  # tail windows may stay open


def test_stream_dedup_drops_replays(spark, tmp_path):
    """A replayed/duplicated turn inside the watermark yields ONE output row
    (at-least-once source → exactly-once extraction input)."""
    import pandas as pd

    from paddleocr_spark.corpus import generate_rows
    from paddleocr_spark.streaming.stream import dedup_stream

    rows = list(generate_rows([(i, "alpha beta gamma") for i in range(6)]))
    src = str(tmp_path / "dup_src")
    pdf = pd.DataFrame(rows + rows[:10])  # 10 replayed turns
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    )
    out = dedup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT conv_id, turn_idx FROM dedup_out").collect()
    assert len(got) == len(rows)  # replays dropped
    assert len({(r.conv_id, r.turn_idx) for r in got}) == len(rows)
