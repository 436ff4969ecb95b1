"""Shard export: deterministic assignment, reproducible within-shard order."""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from paddleocr_spark.sinks.shards import export_shards, read_shards

N_SHARDS = 8


def _shard(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[16:20], 16) % N_SHARDS


def _ord(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards") / "export")
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("payload")
    )
    manifest = export_shards(df, out, n_shards=N_SHARDS)
    return out, manifest


def test_manifest_counts_and_assignment(spark, exported):
    out, manifest = exported
    assert manifest["total_rows"] == 500
    want: dict = {}
    for i in range(500):
        want[_shard(i)] = want.get(_shard(i), 0) + 1
    assert {int(k): v["rows"] for k, v in manifest["shards"].items()} == want
    # manifest round-trips from disk
    with open(os.path.join(out, "_shards_manifest.json")) as f:
        assert json.load(f)["total_rows"] == 500


def test_within_shard_order_is_md5_order(exported):
    out, _ = exported
    for shard_dir in glob.glob(os.path.join(out, "shard=*")):
        files = glob.glob(os.path.join(shard_dir, "*.parquet"))
        assert len(files) == 1  # one task per shard → one file, order = shard order
        ids = pq.read_table(files[0], columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids, key=lambda i: (_ord(i), i))
        sh = int(shard_dir.rsplit("=", 1)[1])
        assert all(_shard(i) == sh for i in ids)


def test_export_is_parallelism_invariant(spark, exported, tmp_path):
    out, _ = exported
    out2 = str(tmp_path / "export2")
    df = (
        spark.range(500)
        .select(F.col("id").alias("doc_id"), (F.col("id") * 3).alias("payload"))
        .repartition(11)
    )
    export_shards(df, out2, n_shards=N_SHARDS)
    for shard_dir in sorted(glob.glob(os.path.join(out, "shard=*"))):
        f1 = glob.glob(os.path.join(shard_dir, "*.parquet"))[0]
        twin = os.path.join(out2, os.path.basename(shard_dir))
        f2 = glob.glob(os.path.join(twin, "*.parquet"))[0]
        a = pq.read_table(f1, columns=["doc_id"])["doc_id"].to_pylist()
        b = pq.read_table(f2, columns=["doc_id"])["doc_id"].to_pylist()
        assert a == b  # same shards, same order, any input partitioning


def test_read_back_complete(spark, exported):
    out, _ = exported
    df = read_shards(spark, out)
    assert df.count() == 500
    assert df.select("doc_id").distinct().count() == 500
