"""Connected components (large-star/small-star) — correctness vs a
pure-Python union-find mirror on adversarial graph shapes, convergence
bounds, and the end-to-end dedup_minhash fold."""

import random

import pytest

from paddleocr_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
    remove_near_duplicates,
    with_near_dups,
)


def _uf_components(pairs):
    """Union-find ground truth: {node: min reachable node}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    return {n: find(n) for n in parent}


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["comp"]
        for r in connected_components(df).collect()
    }
    return got


@pytest.mark.parametrize(
    "name,pairs",
    [
        ("chain64", [(i, i + 1) for i in range(64)]),
        ("star", [(0, i) for i in range(1, 20)]),
        ("two_cliques", [(a, b) for a in range(5) for b in range(a + 1, 5)]
         + [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]),
        ("bridge", [(i, i + 1) for i in range(5)]
         + [(i, i + 1) for i in range(10, 15)] + [(3, 12)]),
        ("single_edge", [(7, 3)]),
    ],
)
def test_cc_known_graphs(spark, name, pairs):
    assert _run(spark, pairs) == _uf_components(pairs)


def test_cc_fuzz_vs_union_find(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 120
        pairs = set()
        while len(pairs) < 150:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        assert _run(spark, pairs) == _uf_components(pairs), f"trial {trial}"


def test_cc_long_chain_converges_fast(spark):
    """A 256-node chain is the adversarial case for min-propagation (256
    rounds); star rounds must finish well inside the O(log^2 n) budget —
    max_iter=12 would be exceeded by any propagation-style implementation."""
    pairs = [(i, i + 1) for i in range(256)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    stats = {}
    got = {
        r["doc_id"]: r["comp"]
        for r in connected_components(df, max_iter=12, stats=stats).collect()
    }
    assert got == {i: 0 for i in range(257)}
    assert 1 <= stats["rounds"] <= 12 and stats["final_edges"] == 256


def test_cc_covers_all_pair_nodes_on_corpus(spark, sf_dir):
    """End-to-end fold shape: every node in the LSH pair graph gets exactly
    one component, components are transitively consistent, and comp is the
    component minimum."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(with_near_dups(docs))
    rows = pairs.collect()
    got = {
        r["doc_id"]: r["comp"]
        for r in connected_components(pairs).collect()
    }
    want = _uf_components([(r["doc_a"], r["doc_b"]) for r in rows])
    assert got == want
    assert all(c <= n for n, c in got.items())


def test_remove_near_duplicates_end_to_end(spark, sf_dir):
    """Survivors = every unpaired doc + exactly the component minimum of
    each duplicate group; mutated copies (doc_id+100000) never outlive
    their originals when paired with them."""
    docs = with_near_dups(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    pairs = minhash_lsh_pairs(docs)
    survivors = {
        r["doc_id"] for r in remove_near_duplicates(docs, pairs).collect()
    }
    comp = _uf_components(
        [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    )
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    want = {d for d in all_ids if d not in comp or comp[d] == d}
    assert survivors == want
    assert len(survivors) < len(all_ids)  # the injected near-dups collapse


def test_star_edges_same_components_as_all_pairs(spark, sf_dir):
    """minhash_lsh_star_edges yields the IDENTICAL component partition to
    minhash_lsh_pairs on the same corpus — linearly fewer edges, same
    transitive closure (the property run_curate's near-dedup stage relies
    on when it swaps all-pairs generation for spanning stars)."""
    from paddleocr_spark.operators.dedup import minhash_lsh_star_edges

    docs = with_near_dups(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    pair_rows = [
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    ]
    star_rows = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_star_edges(docs).collect()
    ]
    assert len(star_rows) <= len(pair_rows)
    assert _uf_components(pair_rows) == _uf_components(star_rows)


def test_star_edges_linear_on_fat_bucket(spark):
    """A bucket of n near-identical docs emits O(n) star edges where
    all-pairs would emit n(n-1)/2 — the web-scale duplicate-rate guard."""
    from paddleocr_spark.operators.dedup import minhash_lsh_star_edges

    n = 400
    docs = spark.createDataFrame(
        [(i, "the exact same sentence repeated for every document") for i in range(n)],
        "doc_id long, text string",
    )
    edges = minhash_lsh_star_edges(docs).collect()
    assert len(edges) == n - 1  # one spanning star, hub = min doc_id
    assert {r["doc_a"] for r in edges} == {0}
    got = {
        r["doc_id"]: r["comp"]
        for r in connected_components(
            minhash_lsh_star_edges(docs)
        ).collect()
    }
    assert got == {i: 0 for i in range(1, n)} | {0: 0}
