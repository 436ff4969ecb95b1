"""Training-shard export: deterministically shuffled, sharded parquet.

The hand-off from curation to a training dataloader: the corpus is dealt
into ``n_shards`` shards and each shard is written in a pseudo-random but
REPRODUCIBLE order, so readers get an md5-shuffled stream without any
engine re-shuffle (the portable analog of the reference's seeded
``random.shuffle`` at load time, ``ppocr/data/simple_dataset.py:50-57`` —
rand-free for the same reason as operators/mix.py: per-partition rand
seeding would tie the shuffle to the cluster size).

Shard assignment and within-shard order are pure functions of the id:
  shard = md5(id)[17:20] mod n_shards    (independent hex range from the
                                          mix bucket / pack group / order
                                          prefix, so sampling, packing and
                                          sharding decorrelate)
  order = (md5(id)[1:12], id)

Plan shape at 100 TB: ONE hash shuffle on the shard key + a sort WITHIN
partitions (no global sort → no range exchange, no sampling pass). Each
shard's rows land in exactly one task (hash partitioning on the shard
value), so every ``shard=NNNNN`` dir holds one parquet file whose row order
IS the shard order. The manifest aggregate is map-side combinable and
metadata-sized.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _shard_col(id_col: str, n_shards: int):
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 17, 4), 16, 10)
        .cast("long") % n_shards
    ).cast("int")


def _ord_col(id_col: str):
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
    ).cast("long")


def export_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    extra_order: tuple = (),
) -> dict:
    """Write ``df`` as ``out_dir/shard=NNN/*.parquet`` in deterministic
    shuffled order; returns (and writes) a manifest with per-shard row
    counts and membership checksums.

    ``extra_order`` breaks ties when multiple rows share ``id_col`` (e.g.
    sharding packed sequences by pack_id: pass the within-pack position so
    a pack's rows stay contiguous AND internally ordered)."""
    staged = (
        df.withColumn("shard", _shard_col(id_col, n_shards))
        .withColumn("_ord", _ord_col(id_col))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord", id_col, *extra_order)
    )
    staged.write.mode("overwrite").partitionBy("shard").parquet(out_dir)

    spark = df.sparkSession
    stats = (
        spark.read.parquet(out_dir)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("_ord").alias("ord_sum"),
        )
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "total_rows": int(sum(r.rows for r in stats)),
        "shards": {
            int(r.shard): {"rows": int(r.rows), "ord_sum": int(r.ord_sum)}
            for r in stats
        },
    }
    with open(os.path.join(out_dir, "_shards_manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def read_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the export back (shard + _ord columns included; a dataloader
    streams shard dirs independently — file row order is shard order)."""
    return spark.read.parquet(out_dir)
