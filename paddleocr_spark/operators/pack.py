"""Sequence packing — concatenate documents into fixed-token training rows.

The last stage of a pretraining-data pipeline: after extraction, quality
tiering, dedup and curriculum mixing, documents are packed into
``max_tokens``-sized training sequences. The reference's batching analog is
aspect-ratio-sorted recognition batching (`tools/infer/predict_rec.py`
sorts crops by width so each padded batch wastes minimal compute); packing
is the text equivalent — minimal padding waste per fixed-length row.

Two public semantics:

- ``pack_split`` (default, the GPT/Llama-style concat-and-split): documents
  are laid head-to-tail in a deterministic md5-shuffled order within hash
  groups; sequence boundaries fall every ``max_tokens`` tokens regardless of
  document edges, so a document may straddle sequences. This is a pure
  prefix-sum — ONE window over (group, order) — zero Python anywhere in the
  plan, and an exact SQL mirror.

- ``pack_greedy`` (no-split / FirstFit-in-order, the "respect document
  boundaries" variant used for SFT-style rows): a document never straddles;
  a new pack starts when the running total would exceed ``max_tokens``.
  Inherently a sequential scan per group (each verdict depends on the carry
  of everything before it), so it runs as ``applyInPandas`` over hash
  groups — the per-GROUP loop is bounded by the group, not the corpus.

Determinism/scale contract (same as operators/mix.py): order and grouping
are pure functions of doc_id via md5 — identical packs at any parallelism,
any cluster size (tested under repartition). At 100 TB: one shuffle on the
group key; groups are hash-uniform (n_groups >> executors bounds both skew
and per-group memory in greedy mode — 65,536 groups over 100 TB ≈ 1.5 GB of
(id, count) pairs per group, and split mode streams through the window
without materializing the group at all).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.textstats import token_count

#: pack_id = group_id * _PACK_STRIDE + index-within-group — one BIGINT key,
#: globally unique, stable under any parallelism.
_PACK_STRIDE = 1 << 32


def _order_cols(id_col: str):
    """Deterministic md5-shuffled order: (hash prefix, id) — the id breaks
    md5-prefix ties so the order is total."""
    h = F.md5(F.col(id_col).cast("string"))
    return [
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long").alias("_ord"),
        F.col(id_col),
    ]


def _group_col(id_col: str, n_groups: int):
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 13, 4), 16, 10)
        .cast("long") % n_groups
    ).cast("int")


def pack_split(
    df: DataFrame,
    max_tokens: int,
    n_groups: int = 256,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-split packing: one window prefix-sum, zero Python.

    Output per document: ``group_id``, ``cum_before`` (tokens laid down
    ahead of it in its group), ``pack_id`` (sequence holding the document's
    FIRST token), ``pack_last`` (sequence holding its last — straddling docs
    have pack_last > pack_id), ``pack_offset`` (position of the first token
    inside pack_id).
    """
    ordc = _order_cols(id_col)
    w = (
        Window.partitionBy("group_id")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(tokens_col).over(w), F.lit(0).cast("long"))
    out = (
        df.select(
            F.col(id_col),
            F.col(tokens_col).cast("long").alias(tokens_col),
            _group_col(id_col, n_groups).alias("group_id"),
            *ordc[:1],
        )
        .withColumn("cum_before", cum)
        .withColumn(
            "pack_id",
            F.col("group_id").cast("long") * _PACK_STRIDE
            + F.floor(F.col("cum_before") / max_tokens),
        )
        .withColumn(
            "pack_last",
            F.col("group_id").cast("long") * _PACK_STRIDE
            + F.floor(
                (F.col("cum_before") + F.greatest(F.col(tokens_col), F.lit(1)) - 1)
                / max_tokens
            ),
        )
        .withColumn("pack_offset", F.col("cum_before") % max_tokens)
    )
    return out.drop("_ord")


def pack_greedy(
    df: DataFrame,
    max_tokens: int,
    n_groups: int = 256,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """No-split FirstFit-in-order packing via applyInPandas per hash group.

    A new pack opens when the running total would exceed ``max_tokens`` (an
    oversized document gets a pack to itself). Output per document:
    ``group_id``, ``pack_id``, ``pack_pos`` (index within pack),
    ``pack_tokens_before`` (tokens already in the pack ahead of it).
    """
    slim = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        _group_col(id_col, n_groups).alias("group_id"),
        _order_cols(id_col)[0],
    )

    id_type = df.schema[id_col].dataType.simpleString()  # long / string / …
    schema = (
        f"{id_col} {id_type}, {tokens_col} long, group_id int, "
        "pack_id long, pack_pos int, pack_tokens_before long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ord", id_col], kind="mergesort")
        gid = int(pdf["group_id"].iloc[0])
        base = gid * _PACK_STRIDE
        pack_ids, positions, befores = [], [], []
        local, pos, running = 0, 0, 0
        for t in pdf[tokens_col].tolist():
            if running > 0 and running + t > max_tokens:
                local += 1
                pos = 0
                running = 0
            pack_ids.append(base + local)
            positions.append(pos)
            befores.append(running)
            pos += 1
            running += t
        out = pdf[[id_col, tokens_col, "group_id"]].copy()
        out["pack_id"] = pd.array(pack_ids, dtype="int64")
        out["pack_pos"] = pd.array(positions, dtype="int32")
        out["pack_tokens_before"] = pd.array(befores, dtype="int64")
        return out

    return slim.groupBy("group_id").applyInPandas(_pack, schema)


def pack_documents(
    docs: DataFrame,
    max_tokens: int,
    n_groups: int = 256,
    mode: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Convenience: derive ``n_tokens`` (whitespace tokens of the normalized
    text) and pack. ``mode`` = 'split' (zero-Python default) or 'greedy'."""
    with_tokens = docs.select(
        F.col(id_col), token_count(F.col(text_col)).cast("long").alias("n_tokens")
    )
    fn = pack_split if mode == "split" else pack_greedy
    return fn(with_tokens, max_tokens, n_groups=n_groups, id_col=id_col)
