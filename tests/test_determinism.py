"""Determinism under parallelism + skew defusal (SURVEY.md §5, §7 hard-parts).

North rule: per-turn text equality under stable turn ordering — the output
must be byte-identical at ANY partition layout, because every ordering in the
pipeline is window/quantization-defined, never arrival-defined.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paddleocr_spark.corpus import generate_rows
from paddleocr_spark.operators.extract import extract, ordered_output

WORDS = (
    "the quick brown fox jumps over a lazy dog with table rows and nav links "
    "copyright footer sidebar main article content paragraph"
).split()


@pytest.fixture(scope="module")
def turns(spark):
    # doc_id 0 hits the corpus skew rule (doc_id % 97 == 0 → 100× turns):
    # one 400-turn conversation among 4-turn ones
    rows = list(generate_rows([(i, " ".join(WORDS)) for i in range(12)]))
    return spark.createDataFrame(rows)


def _canon(df):
    out = ordered_output(extract(df)).select(
        "conv_id", "turn_idx", "payload_kind", "extracted_text",
        F.to_json("spans").alias("spans_json"),
    )
    return [tuple(r) for r in out.collect()]


def test_identical_output_across_partitionings(spark, turns):
    a = _canon(turns.repartition(2))
    b = _canon(turns.repartition(17, "role"))  # adversarial layout
    c = _canon(turns.coalesce(1))
    assert a == b == c
    assert len(a) == turns.count()


def test_skewed_conv_spreads_across_partitions(spark, turns):
    """The 400-turn conversation must not serialize onto one partition:
    salting by (conv_id, hash(turn_idx) % S) spreads it."""
    ex = extract(turns, num_partitions=8)
    pid = ex.withColumn("pid", F.spark_partition_id())
    counts = (
        pid.filter(F.col("conv_id") == "conv-000000-000")
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(counts) >= 4  # spread over at least half the partitions
    assert max(c["count"] for c in counts) < 400  # nobody holds the whole conv


def test_null_and_malformed_payloads_never_raise(spark):
    rows = [
        ("c0", 0, "user", None, None, None),
        ("c0", 1, "user", "<html><p>truncated but fine", None, None),
        ("c0", 2, "user", "PDFLIKE v1\ngarbage|||", None, None),
        ("c0", 3, "user", "", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = {r.turn_idx: r for r in extract(df).collect()}
    assert out[0].payload_kind == "plain" and out[0].n_spans == 0
    assert out[1].payload_kind == "html"
    assert out[1].extracted_text == "truncated but fine"
    assert out[2].payload_kind == "pdf" and out[2].n_spans == 0
    assert out[3].n_spans == 0


def test_conversation_document_reassembly(spark, turns):
    """Per-conversation concat equals the turn-ordered join at any layout."""
    from paddleocr_spark.operators.extract import conversation_document

    ex = extract(turns)
    doc = {r.conv_id: r for r in conversation_document(ex).collect()}
    rows = sorted(
        ex.select("conv_id", "turn_idx", "extracted_text").collect(),
        key=lambda r: (r.conv_id, r.turn_idx),
    )
    want = {}
    for r in rows:
        want.setdefault(r.conv_id, []).append(r.extracted_text)
    assert set(doc) == set(want)
    for cid, texts in want.items():
        assert doc[cid].document == "\n\n".join(texts)
        assert doc[cid].n_turns == len(texts)
    # skewed conversation reassembles completely
    assert doc["conv-000000-000"].n_turns == 400
    # identical at an adversarial partition layout
    doc2 = {
        r.conv_id: r.document
        for r in conversation_document(extract(turns.repartition(13, "role"))).collect()
    }
    assert {k: v.document for k, v in doc.items()} == doc2


def test_single_mega_conversation_completes_and_spreads(spark):
    """Extreme conv-level skew: one 10,000-turn conversation; the salted
    repartition must spread it wide and the output must be complete with
    stable per-turn ordering."""
    payload = "<html><article><p>alpha beta gamma delta epsilon zeta</p></article>"
    rows = [("mega", t, "user", payload, None, None) for t in range(10_000)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    ex = extract(df, num_partitions=16).withColumn("pid", F.spark_partition_id())
    agg = ex.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("pid").alias("n_parts"),
        F.countDistinct("turn_idx").alias("n_turns"),
        F.max((F.col("extracted_text") != "alpha beta gamma delta epsilon zeta").cast("int")).alias("any_bad"),
    ).collect()[0]
    assert agg.n == 10_000 and agg.n_turns == 10_000
    assert agg.n_parts >= 8   # spread over at least half the partitions
    assert agg.any_bad == 0
