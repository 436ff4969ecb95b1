"""BM25 retrieval scoring — parity vs a pure-Python mirror (identical
float-op order) and plan shape (no explode, no Python)."""

import math

from paddleocr_spark.operators.select import BM25_B, BM25_K1, bm25_scores

TERMS = ("join", "window", "spark")


def _mirror(docs, terms, k1=BM25_K1, b=BM25_B):
    toks = {
        i: " ".join(t.lower().split()).split(" ") for i, t in docs
    }
    nd = float(len(toks))
    av = float(sum(len(v) for v in toks.values()))
    df = {t: float(sum(1 for v in toks.values() if t in v)) for t in terms}
    out = {}
    for i, v in toks.items():
        dl = float(len(v))
        score = 0.0
        for t in terms:
            tf = float(v.count(t))
            idf = (nd - df[t] + 0.5) / (df[t] + 0.5)
            denom = tf + k1 * (1.0 - b + b * dl * nd / av)
            score = score + idf * (tf * (k1 + 1.0)) / denom
        out[i] = math.floor(score * 1e6)
    return out


def test_bm25_matches_mirror_on_corpus_sample(spark, doc_items):
    docs = doc_items[:120]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25_micro"]
        for r in bm25_scores(df, TERMS).collect()
    }
    want = _mirror(docs, TERMS)
    assert got == want
    assert len(set(got.values())) > 3, "degenerate score distribution"


def test_bm25_zero_tf_docs_score_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "join join window"), (3, "spark")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["bm25_micro"]
        for r in bm25_scores(df, TERMS).collect()
    }
    assert got[1] == 0
    assert got[2] > 0 and got[3] > 0


def test_bm25_plan_no_explode_no_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        bm25_scores(docs, TERMS)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan, "tf must be array filters, not explode"
    assert "Python" not in plan
