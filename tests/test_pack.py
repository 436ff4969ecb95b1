"""Sequence packing vs an independent pure-Python mirror.

Both modes must produce identical packs at any parallelism (md5-derived
group + order, no rand, no partition-dependent state).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from paddleocr_spark.operators.pack import (
    _PACK_STRIDE,
    pack_documents,
    pack_greedy,
    pack_split,
)

N_GROUPS = 8
CAP = 50


def _ord(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)


def _gid(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[12:16], 16) % N_GROUPS


def _mirror_split(items):
    # items: [(doc_id, n_tokens)] → {doc_id: (gid, cum_before)}
    out = {}
    for g in range(N_GROUPS):
        cum = 0
        for i, t in sorted(
            (x for x in items if _gid(x[0]) == g), key=lambda x: (_ord(x[0]), x[0])
        ):
            out[i] = (g, cum)
            cum += t
    return out


def _mirror_greedy(items):
    out = {}
    for g in range(N_GROUPS):
        local, pos, running = 0, 0, 0
        for i, t in sorted(
            (x for x in items if _gid(x[0]) == g), key=lambda x: (_ord(x[0]), x[0])
        ):
            if running > 0 and running + t > CAP:
                local += 1
                pos = 0
                running = 0
            out[i] = (g, g * _PACK_STRIDE + local, pos, running)
            pos += 1
            running += t
    return out


@pytest.fixture(scope="module")
def sized(spark):
    # token counts 1..40 with a few oversized (> CAP) docs mixed in
    return spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 17 == 0, F.lit(75))
        .otherwise(F.col("id") % 40 + 1)
        .cast("long")
        .alias("n_tokens"),
    )


def _items(sized):
    return [(r.doc_id, r.n_tokens) for r in sized.collect()]


def test_pack_split_matches_mirror(spark, sized):
    want = _mirror_split(_items(sized))
    rows = pack_split(sized, CAP, n_groups=N_GROUPS).collect()
    assert len(rows) == 200
    for r in rows:
        g, cum = want[r.doc_id]
        assert r.group_id == g
        assert r.cum_before == cum
        assert r.pack_id == g * _PACK_STRIDE + cum // CAP
        assert r.pack_last == g * _PACK_STRIDE + (cum + max(r.n_tokens, 1) - 1) // CAP
        assert r.pack_offset == cum % CAP


def test_pack_split_straddle_is_real(spark, sized):
    rows = pack_split(sized, CAP, n_groups=N_GROUPS).collect()
    assert any(r.pack_last > r.pack_id for r in rows)  # some docs straddle


def test_pack_greedy_matches_mirror(spark, sized):
    want = _mirror_greedy(_items(sized))
    rows = pack_greedy(sized, CAP, n_groups=N_GROUPS).collect()
    assert len(rows) == 200
    for r in rows:
        g, pid, pos, before = want[r.doc_id]
        assert (r.group_id, r.pack_id, r.pack_pos, r.pack_tokens_before) == (
            g,
            pid,
            pos,
            before,
        )


def test_pack_greedy_capacity_respected(spark, sized):
    rows = pack_greedy(sized, CAP, n_groups=N_GROUPS).collect()
    packs: dict = {}
    for r in rows:
        packs.setdefault(r.pack_id, []).append(r.n_tokens)
    for pid, toks in packs.items():
        # a pack only exceeds CAP when it holds exactly one oversized doc
        assert sum(toks) <= CAP or (len(toks) == 1 and toks[0] > CAP)


def test_pack_partitioning_invariant(spark, sized):
    a = {(r.doc_id, r.pack_id, r.pack_pos) for r in pack_greedy(sized, CAP, n_groups=N_GROUPS).collect()}
    b = {
        (r.doc_id, r.pack_id, r.pack_pos)
        for r in pack_greedy(sized.repartition(7), CAP, n_groups=N_GROUPS).collect()
    }
    assert a == b
    c = {(r.doc_id, r.pack_id) for r in pack_split(sized, CAP, n_groups=N_GROUPS).collect()}
    d = {
        (r.doc_id, r.pack_id)
        for r in pack_split(sized.repartition(3), CAP, n_groups=N_GROUPS).collect()
    }
    assert c == d


def test_pack_split_plan_is_zero_python(spark, sized):
    plan = (
        pack_split(sized, CAP, n_groups=N_GROUPS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan  # pure window — the scalable default
    assert plan.count("Exchange") == 1  # exactly the one group-key shuffle


def test_pack_documents_derives_tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(64)
    out = pack_documents(docs, 128, n_groups=4, mode="split")
    assert out.count() == 64
    assert out.where(F.col("n_tokens") <= 0).count() == 0
