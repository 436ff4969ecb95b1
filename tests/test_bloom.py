"""Bloom filter — no false negatives, or-mergeability across shards,
bounded false-positive rate, and broadcast plan shape."""

import pyspark.sql.functions as F

from paddleocr_spark.operators.sketch import (
    BLOOM_BITS,
    BLOOM_K,
    BLOOM_WORDS,
    bloom_build,
    bloom_probe,
)


def _vals(spark, items):
    return spark.createDataFrame([(v,) for v in items], "v string")


def test_bloom_no_false_negatives(spark):
    members = [f"member-{i}" for i in range(400)]
    bloom = bloom_build(_vals(spark, members), F.col("v"))
    probed = bloom_probe(_vals(spark, members), F.col("v"), bloom)
    assert all(r["bloom_hit"] == 1 for r in probed.collect())


def test_bloom_false_positive_rate_bounded(spark):
    members = [f"member-{i}" for i in range(400)]
    others = [f"other-{i}" for i in range(2000)]
    bloom = bloom_build(_vals(spark, members), F.col("v"))
    hits = (
        bloom_probe(_vals(spark, others), F.col("v"), bloom)
        .agg(F.sum("bloom_hit"))
        .collect()[0][0]
    )
    # theoretical fp ~ (K*n/m)^K = (4*400/65536)^4 ~ 3.5e-7; allow slack
    assert hits <= 2, f"false-positive rate implausibly high: {hits}/2000"


def test_bloom_bitmaps_or_merge(spark):
    """Shard bitmaps bit_or-merged == whole-set bitmap — the cross-run /
    cross-executor merge property."""
    a = [f"x-{i}" for i in range(200)]
    b = [f"y-{i}" for i in range(200)]
    merged = {
        r["word"]: r["bits"]
        for r in (
            bloom_build(_vals(spark, a), F.col("v"))
            .unionByName(bloom_build(_vals(spark, b), F.col("v")))
            .groupBy("word")
            .agg(F.bit_or("bits").alias("bits"))
            .collect()
        )
    }
    whole = {
        r["word"]: r["bits"]
        for r in bloom_build(_vals(spark, a + b), F.col("v")).collect()
    }
    assert merged == whole


def test_bloom_size_and_plan(spark):
    members = [f"member-{i}" for i in range(500)]
    bloom = bloom_build(_vals(spark, members), F.col("v"))
    assert bloom.count() <= BLOOM_WORDS
    probe = bloom_probe(_vals(spark, members[:50]), F.col("v"), bloom)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "bloom side must broadcast"
    assert "CartesianProduct" not in plan
    assert BLOOM_K * BLOOM_BITS > 0  # constants sane / imported
