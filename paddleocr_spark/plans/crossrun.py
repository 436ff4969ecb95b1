"""Cross-run deduplication: skip turns an earlier job run already ingested.

The operational form of the Bloom-sketch story (operators/sketch.py): every
job run can record an 8 KiB bitmap of the turn fingerprints it ingested
(``record_run_bloom``); a later run over an overlapping corpus (re-fetched
crawls, replayed feeds) loads that bitmap and keeps only novel turns
(``filter_novel``) — membership is K codegen'd bit lookups inside the scan
projection (``bloom_hit_lit``), NEVER a join against the prior corpus. State
is the versioned, ``_SUCCESS``-committed layout of streaming/accounting.py,
so chained runs fold each run's bitmap into an accumulated
"everything ingested so far" filter.

False positives (a novel turn skipped as seen) occur at the standard
(K·n/m)^K Bloom rate and are surfaced by the observed counters; false
negatives cannot occur — a skipped-turns guarantee, not a kept-turns one.

Reference analog: the TIPC pipeline re-runs skip already-produced outputs by
file presence (/root/reference/test_tipc/common_func.sh status checks);
here "already produced" is a content sketch, so it survives renames,
repartitions and a different output dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from ..operators.sketch import bloom_build, bloom_hit_lit
from ..streaming.accounting import merge_bloom_state, read_bloom_state

BLOOM_SUBDIR = "bloom_state"


def cross_run_fp(key: str = "turn"):
    """Fingerprint column for cross-run identity.

    - ``turn`` (default): md5 over (conv_id, turn_idx, text) — "this exact
      turn was already ingested" (safe idempotent-re-ingestion semantics).
    - ``content``: md5 over text alone — "this payload content was already
      ingested anywhere" (cross-conversation content dedup).
    """
    text = F.coalesce(F.col("text"), F.lit(""))
    if key == "content":
        return F.md5(text)
    if key != "turn":
        raise ValueError(f"unknown cross-run key: {key!r}")
    return F.md5(
        F.concat_ws(
            "\x1f", F.col("conv_id"), F.col("turn_idx").cast("string"), text
        )
    )


def filter_novel(
    transcripts: DataFrame, prior_out_dir: str, key: str = "turn"
):
    """Keep only turns NOT in ``prior_out_dir``'s recorded bloom state.

    Returns ``(novel_df, observation)`` — the observation carries
    ``turns_probed`` / ``turns_skipped_prior`` once the plan executes (no
    extra pass; the counters ride the scan)."""
    spark = transcripts.sparkSession
    bloom = read_bloom_state(spark, f"{prior_out_dir}/{BLOOM_SUBDIR}")
    hit = bloom_hit_lit(cross_run_fp(key), bloom)
    obs = Observation("cross_run_dedup")
    probed = transcripts.withColumn("_prior_hit", hit).observe(
        obs,
        F.count(F.lit(1)).alias("turns_probed"),
        F.sum("_prior_hit").cast("long").alias("turns_skipped_prior"),
    )
    return probed.filter(F.col("_prior_hit") == 0).drop("_prior_hit"), obs


def record_run_bloom(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    key: str = "turn",
    include_prior: str | None = None,
) -> None:
    """Fold this run's turn fingerprints into ``out_dir``'s bloom state
    (one narrow pass over the input). With ``include_prior`` (the dir this
    run deduped against), the prior bitmap is folded in too, so the new
    state covers EVERYTHING ingested so far — chained runs dedup against
    only the latest run's state."""
    state = f"{out_dir}/{BLOOM_SUBDIR}"
    merge_bloom_state(
        spark, bloom_build(transcripts, cross_run_fp(key)), state
    )
    if include_prior:
        merge_bloom_state(
            spark,
            read_bloom_state(spark, f"{include_prior}/{BLOOM_SUBDIR}"),
            state,
        )
