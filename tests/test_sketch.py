"""Deterministic sketches — HLL register/estimate properties, count-min
upper-bound invariant, and the property that makes them 100 TB-shaped:
MERGEABILITY (registers max-merge, counters add-merge across shards)."""

import pyspark.sql.functions as F
import pytest

from paddleocr_spark.operators.sketch import (
    CM_DEPTH,
    CM_WIDTH,
    HLL_M,
    cm_estimate,
    cm_sketch,
    hll_registers,
    hll_summary,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hll_estimate_within_tolerance(spark, docs):
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    est = hll_summary(docs, norm).collect()[0]
    true = docs.select(norm.alias("n")).distinct().count()
    # raw HLL std error is 1.04/sqrt(64) ~ 13%; allow 3 sigma
    assert abs(est["hll_est"] - true) < 0.4 * true + 5
    assert 1 <= est["hll_buckets_used"] <= HLL_M


def test_hll_registers_merge_with_max(spark, docs):
    """Sharded registers max-merged == whole-corpus registers — the property
    that lets 1000 executors each keep 64 longs and combine."""
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = {
        r["bucket"]: r["register"]
        for r in (
            hll_registers(half_a, norm)
            .unionByName(hll_registers(half_b, norm))
            .groupBy("bucket")
            .agg(F.max("register").alias("register"))
            .collect()
        )
    }
    whole = {
        r["bucket"]: r["register"]
        for r in hll_registers(docs, norm).collect()
    }
    assert merged == whole


def test_cm_estimate_upper_bounds_truth(spark, docs):
    toks = docs.select(
        F.explode(
            F.split(
                F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))),
                " ",
            )
        ).alias("tok")
    )
    sk = cm_sketch(toks, F.col("tok"))
    assert sk.count() <= CM_DEPTH * CM_WIDTH
    for probe in ("join", "window", "spark", "zzz-absent-token"):
        est = cm_estimate(sk, probe).collect()[0]["cm_est"]
        true = toks.filter(F.col("tok") == probe).count()
        if est is None:  # no bucket rows at all -> token never hashed there
            assert true == 0
        else:
            assert est >= true, f"CM must never under-count ({probe})"


def test_cm_counters_merge_with_add(spark, docs):
    toks = docs.select(
        F.explode(
            F.split(
                F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))),
                " ",
            )
        ).alias("tok"),
        "doc_id",
    )
    half_a = toks.filter(F.col("doc_id") % 2 == 0).select("tok")
    half_b = toks.filter(F.col("doc_id") % 2 == 1).select("tok")
    merged = {
        (r["j"], r["bucket"]): r["c"]
        for r in (
            cm_sketch(half_a, F.col("tok"))
            .unionByName(cm_sketch(half_b, F.col("tok")))
            .groupBy("j", "bucket")
            .agg(F.sum("c").alias("c"))
            .collect()
        )
    }
    whole = {
        (r["j"], r["bucket"]): r["c"]
        for r in cm_sketch(toks.select("tok"), F.col("tok")).collect()
    }
    assert merged == whole
