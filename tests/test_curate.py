"""End-to-end curation pipeline: extracted turns → training shards."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from paddleocr_spark.plans.curate import run_curate


def _alpha(n: int) -> str:
    s = ""
    for _ in range(3):
        s += "abcdefghij"[n % 10]
        n //= 10
    return s


def _long_text(seed: int) -> str:
    # ≥50 distinct PURE-ALPHA tokens (the Gopher gate rejects tokens with
    # digits) → keep, low repetition, high TTR → tier 2
    words = [f"w{_alpha(seed)}{_alpha(i)}" for i in range(60)]
    return " ".join(words)


@pytest.fixture(scope="module")
def extracted(spark):
    rows = []
    for c in range(8):
        for t in range(10):
            i = c * 10 + t
            if i % 10 == 9:
                text = "too short"          # tier 0 → dropped by mix
            elif i % 10 == 8:
                text = _long_text(0)        # verbatim dup of conv 0 turn 8 etc.
            else:
                text = _long_text(i)
            rows.append((f"conv-{c:03d}", t, text))
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, extracted_text string")


def test_curate_end_to_end(spark, extracted, tmp_path):
    out = str(tmp_path / "shards")
    m = run_curate(
        extracted, out, max_tokens=100, n_shards=4, n_groups=4, pack_mode="split"
    )
    assert m["rows_in"] == 80
    # _long_text(0) appears 9× (every conv's turn 8 + conv 0 turn 0) → 1
    # canonical; "too short" appears 8× → 1 canonical: 80 - 8 - 7 = 65
    assert m["rows_canonical"] == 65
    # mix drops tier 0 (the one canonical "too short" row); all long texts
    # are tier 2 (distinct tokens → rep 0, TTR 1.0) and kept in full
    assert m["rows_mixed"] == 64
    assert m["rows_written"] == m["rows_mixed"] > 0
    files = glob.glob(os.path.join(out, "shard=*/*.parquet"))
    assert files
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == m["rows_written"]


def test_curate_packs_contiguous_in_shards(spark, extracted, tmp_path):
    out = str(tmp_path / "shards2")
    run_curate(
        extracted, out, max_tokens=100, n_shards=2, n_groups=4, pack_mode="greedy"
    )
    for f in glob.glob(os.path.join(out, "shard=*/*.parquet")):
        tbl = pq.read_table(f, columns=["pack_id", "pack_pos"])
        pids = tbl["pack_id"].to_pylist()
        pos = tbl["pack_pos"].to_pylist()
        # packs are contiguous runs, internally ordered by position
        seen = set()
        prev = None
        for pid, p in zip(pids, pos):
            if pid != prev:
                assert pid not in seen  # no pack split across runs
                seen.add(pid)
                assert p == 0
                prev = pid
            else:
                continue
        # per-pack positions are 0..k in order
        by_pack: dict = {}
        for pid, p in zip(pids, pos):
            by_pack.setdefault(pid, []).append(p)
        for plist in by_pack.values():
            assert plist == list(range(len(plist)))


def test_curate_parallelism_invariant(spark, extracted, tmp_path):
    out1 = str(tmp_path / "a")
    out2 = str(tmp_path / "b")
    run_curate(extracted, out1, max_tokens=100, n_shards=2, n_groups=4)
    run_curate(
        extracted.repartition(13), out2, max_tokens=100, n_shards=2, n_groups=4
    )
    for d1 in sorted(glob.glob(os.path.join(out1, "shard=*"))):
        d2 = os.path.join(out2, os.path.basename(d1))
        f1 = glob.glob(os.path.join(d1, "*.parquet"))[0]
        f2 = glob.glob(os.path.join(d2, "*.parquet"))[0]
        a = pq.read_table(f1, columns=["doc_uid"])["doc_uid"].to_pylist()
        b = pq.read_table(f2, columns=["doc_uid"])["doc_uid"].to_pylist()
        assert a == b  # byte-identical shard order at any parallelism


def test_curate_near_dedup_removes_mutated_copies(spark, extracted, tmp_path):
    """near_dedup=True: a mutated near-copy (last tokens dropped) of every
    row collapses into its original's component, so rows_near_canonical
    falls below rows_canonical and shards stay deterministic."""
    import pyspark.sql.functions as F

    toks = F.split(F.col("extracted_text"), " ")
    mutated = extracted.select(
        F.concat(F.col("conv_id"), F.lit("-near")).alias("conv_id"),
        "turn_idx",
        F.concat_ws(
            " ", F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(1)))
        ).alias("extracted_text"),
    )
    both = extracted.unionByName(mutated)
    m = run_curate(
        both, str(tmp_path / "near"), max_tokens=120, n_shards=2,
        n_groups=8, near_dedup=True,
    )
    assert "rows_near_canonical" in m
    assert m["rows_near_canonical"] < m["rows_canonical"], (
        "near-dup removal must collapse the injected mutated copies"
    )
    # exact-dup stage can't see the mutations; near-dup stage must
    assert m["rows_canonical"] > m["rows_near_canonical"] >= 1
    # determinism: same input, same out
    m2 = run_curate(
        both, str(tmp_path / "near2"), max_tokens=120, n_shards=2,
        n_groups=8, near_dedup=True,
    )
    assert m2["rows_near_canonical"] == m["rows_near_canonical"]
    assert m2["rows_written"] == m["rows_written"]
