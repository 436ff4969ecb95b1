"""Composed curation pipeline: extracted turns → training shards.

The stage a user of this engine actually runs after extraction — the
pipeline the reference's ppstructure "predict → recovery → save" chain
becomes at corpus scale (``ppstructure/predict_system.py:240-276`` runs
per-image extract→order→save; here the same chain continues through
corpus-level curation):

    extracted turns (read_committed / any DataFrame with extracted_text)
      → quality signals + tier           (functions/quality.py, one scan)
      → exact dedup, canonical-only      (md5 fingerprint window, 1 shuffle)
      → curriculum sample by tier        (operators/mix.py, filter-only)
      → sequence packing                 (operators/pack.py, 1 shuffle)
      → deterministic shuffled shards    (sinks/shards.py, 1 shuffle)

Every stage is hash-deterministic (no rand), so the whole pipeline yields
byte-identical shards at any parallelism. Stage counts ride plan-attached
``Observation``s: zero extra passes — all of them materialize during the
single shard-write action.

Shuffle budget at 100 TB: exactly three — dedup fingerprint, pack group,
shard key (``near_dedup=True`` adds the MinHash-LSH shuffles and the CC
star rounds — the documented price of transitive near-dup removal). Quality/mix are filter/project (fuse into the scan); the
pack→text join is on the doc key (co-partitionable; with the bucketed-table
publish path, sinks/bucketed.py, it plans Exchange-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window, functions as F

from ..functions.quality import quality_columns
from ..operators.mix import curriculum_sample
from ..operators.pack import pack_greedy, pack_split
from ..sinks.shards import export_shards


def run_curate(
    extracted: DataFrame,
    out_dir: str,
    rates: tuple = (0.0, 0.5, 1.0),
    max_tokens: int = 2048,
    n_shards: int = 16,
    n_groups: int = 256,
    pack_mode: str = "split",
    text_col: str = "extracted_text",
    near_dedup: bool = False,
    checkpoint: bool = True,
) -> dict:
    """Run the curation chain over ``extracted`` (needs conv_id, turn_idx and
    ``text_col``); writes shards to ``out_dir`` and returns stage metrics.

    ``near_dedup=True`` inserts the near-duplicate REMOVE stage after exact
    dedup: MinHash-LSH candidate pairs → connected components → one survivor
    per component (operators/dedup.py). Adds the LSH shuffles plus the
    star-round iterations (eager: the CC convergence loop runs when this
    function is called); the metrics gain ``rows_near_canonical`` plus
    ``cc_rounds``/``cc_final_edges``.

    ``checkpoint=True`` (default) materializes the two relations each
    consumed more than once downstream — ``canon`` (near-dedup pairs side +
    docs side, or mix + pack) and ``mixed`` (pack side + text-join side) —
    as parquet stage tables under ``<out_dir>.stages/``. Catalyst does not
    share subplans across consumers, so the unmaterialized chain re-runs the
    scan→quality→dedup-window pipeline once PER consumer inside one job; at
    4M turns on a single shared local[32] heap those concurrently-fused
    window sorts + signature transforms + shuffle writes exceeded any
    reasonable heap (measured round 4: repeated OOM unfused, 89 s + 202 s
    when staged). A parquet table, NOT ``localCheckpoint``: checkpoint
    blocks replay the upstream partitioning verbatim (AQE had coalesced the
    dedup shuffle to ~34 fat text partitions), so every downstream stage
    inherits partition granularity chosen for a *shuffle*, not for *maps
    over text* — both MEMORY_AND_DISK and DISK_ONLY seams OOM'd the fused
    LSH stage at a 28g heap, while the identical computation over a parquet
    round-trip re-split by ``maxPartitionBytes`` completes easily (measured
    round 4, three runs). On a real cluster this seam is where you'd publish
    the canonical corpus as a table anyway; the stage dir is left on disk
    for inspection/resume."""
    uid = F.concat_ws(":", F.col("conv_id"), F.col("turn_idx").cast("string"))
    q = quality_columns(F.col(text_col))

    obs_in = Observation("curate_in")
    tiered = (
        extracted.select(
            uid.alias("doc_uid"),
            F.col(text_col).alias("text"),
            q["tier"].cast("int").alias("tier"),
            q["n_tokens"].cast("long").alias("n_tokens"),
        )
        .observe(
            obs_in,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum((F.col("tier") == 2).cast("long")).alias("tier2"),
            F.sum((F.col("tier") == 1).cast("long")).alias("tier1"),
        )
    )

    # exact dedup, canonical survivor only: min uid per normalized-text
    # fingerprint (operators/dedup.py exact_dedup reports groups; curation
    # needs the surviving rows, so the min rides a window — same single
    # shuffle on the 32-byte key)
    fp = F.md5(F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))))
    w = Window.partitionBy("fp")
    obs_dedup = Observation("curate_dedup")
    canon = (
        tiered.withColumn("fp", fp)
        .withColumn("_min_uid", F.min("doc_uid").over(w))
        .where(F.col("doc_uid") == F.col("_min_uid"))
        .drop("fp", "_min_uid")
        .observe(obs_dedup, F.count(F.lit(1)).alias("rows_canonical"))
    )

    stage_dir = out_dir.rstrip("/") + ".stages"
    if checkpoint:
        canon.write.mode("overwrite").parquet(f"{stage_dir}/canon.parquet")
        canon = extracted.sparkSession.read.parquet(f"{stage_dir}/canon.parquet")

    near_stats: dict = {}
    if near_dedup:
        # star edges, not all-pairs: the consumer is transitive-closure
        # removal, so bucket CONNECTIVITY suffices — at high duplicate rates
        # the all-pairs graph is quadratic per bucket (475M edges measured
        # at 4M turns) while the star graph stays linear. Same components.
        from ..operators.dedup import minhash_lsh_star_edges, remove_near_duplicates

        pairs = minhash_lsh_star_edges(
            canon.select(F.col("doc_uid").alias("doc_id"), "text")
        )
        cc_stats: dict = {}
        canon = remove_near_duplicates(
            canon.withColumnRenamed("doc_uid", "doc_id"), pairs, stats=cc_stats
        ).withColumnRenamed("doc_id", "doc_uid")
        near_stats["cc"] = cc_stats  # rounds + final edge count
        obs_near = Observation("curate_near")
        canon = canon.observe(
            obs_near, F.count(F.lit(1)).alias("rows_near_canonical")
        )
        near_stats["_obs"] = obs_near

    obs_mix = Observation("curate_mix")
    mixed = curriculum_sample(canon, rates, tier_col="tier", id_col="doc_uid").observe(
        obs_mix, F.count(F.lit(1)).alias("rows_mixed")
    )
    if checkpoint:
        mixed.write.mode("overwrite").parquet(f"{stage_dir}/mixed.parquet")
        mixed = extracted.sparkSession.read.parquet(f"{stage_dir}/mixed.parquet")

    pack_fn = pack_split if pack_mode == "split" else pack_greedy
    packed = pack_fn(
        mixed, max_tokens, n_groups=n_groups, id_col="doc_uid"
    )
    # re-attach text + tier for the shard payload (equi-join on the doc key)
    final = packed.join(mixed.select("doc_uid", "tier", "text"), "doc_uid")

    pos_col = "pack_offset" if pack_mode == "split" else "pack_pos"
    manifest = export_shards(
        final, out_dir, n_shards=n_shards, id_col="pack_id",
        extra_order=(pos_col, "doc_uid"),
    )

    return {
        "out_dir": out_dir,
        "pack_mode": pack_mode,
        "max_tokens": max_tokens,
        "shards": manifest["n_shards"],
        "rows_written": manifest["total_rows"],
        **{k: int(v) for k, v in obs_in.get.items()},
        **{k: int(v) for k, v in obs_dedup.get.items()},
        **(
            {
                **{k: int(v) for k, v in near_stats["_obs"].get.items()},
                "cc_rounds": int(near_stats["cc"].get("rounds", 0)),
                "cc_final_edges": int(near_stats["cc"].get("final_edges", 0)),
            }
            if near_stats
            else {}
        ),
        **{k: int(v) for k, v in obs_mix.get.items()},
    }
