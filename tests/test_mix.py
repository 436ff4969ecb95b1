"""Curriculum-mix operator: deterministic stratified sampling.

Mirrors the reference's seeded ratio sampling contract
(/root/reference/ppocr/data/simple_dataset.py:58-70 ratio_list) but with the
cluster-size-invariant hash-mod form: the kept set must be a pure function
of doc_id, identical under any partitioning (the reason rand(seed) is
banned — Spark seeds it per partition).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from paddleocr_spark.operators.mix import curriculum_sample, mix_sources


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16)


@pytest.fixture(scope="module")
def tiered(spark):
    # 300 docs, tier = doc_id % 3 (all three tiers equally populated)
    return spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("tier")
    )


def test_curriculum_sample_exact_set(spark, tiered):
    got = {
        r.doc_id
        for r in curriculum_sample(tiered, (0.0, 0.5, 1.0)).collect()
    }
    want = {
        i
        for i in range(300)
        if _bucket(i) < (0, 128, 256)[i % 3]
    }
    assert got == want
    assert any(i % 3 == 1 for i in got)      # tier-1 half is non-vacuous
    assert all(i % 3 != 0 for i in got)      # tier 0 fully dropped
    assert {i for i in range(300) if i % 3 == 2} <= got  # tier 2 fully kept


def test_curriculum_sample_partitioning_invariant(spark, tiered):
    a = {r.doc_id for r in curriculum_sample(tiered, (0.0, 0.5, 1.0)).collect()}
    b = {
        r.doc_id
        for r in curriculum_sample(
            tiered.repartition(13), (0.0, 0.5, 1.0)
        ).collect()
    }
    assert a == b  # same verdicts under any partitioning / cluster size


def test_curriculum_sample_out_of_range_tier_dropped(spark):
    df = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit(7).alias("tier")
    )
    assert curriculum_sample(df, (1.0, 1.0)).count() == 0


def test_mix_sources_rates_and_union(spark):
    a = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("src")
    )
    b = spark.range(200, 400).select(
        F.col("id").alias("doc_id"), F.lit("b").alias("src")
    )
    out = mix_sources([(a, 1.0), (b, 0.25)]).collect()
    got_a = {r.doc_id for r in out if r.src == "a"}
    got_b = {r.doc_id for r in out if r.src == "b"}
    assert got_a == set(range(200))
    assert got_b == {i for i in range(200, 400) if _bucket(i) < 64}
    assert 0 < len(got_b) < 200


def test_mix_plan_is_filter_only(spark, tiered):
    plan = curriculum_sample(tiered, (0.0, 0.5, 1.0))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # sampling must not shuffle
    assert "Python" not in plan    # and must stay JVM-side
