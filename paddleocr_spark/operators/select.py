"""Data-selection operators: hashed n-gram importance scoring.

DSIR-style data selection (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling", public): score every raw document by how
much its hashed token distribution looks like a target corpus, then keep the
highest-scoring slice. The reference's analog is score-threshold routing of
recognition candidates (``drop_score``, /root/reference/tools/infer/
predict_rec.py + paddleocr/_pipelines/ocr.py) — here the "score" is a
corpus-derived importance weight instead of a model confidence.

Mechanics (all JVM built-ins, exact-integer outputs):

- Feature = hashed token bucket: first 8 hex digits of md5(token) mod B
  (B = 256 default). Multiplicity counts, as in DSIR's hashed n-gram model.
- Weight table (B rows): per bucket, add-1-smoothed frequency ratio between
  the target slice and the full corpus, floored to micro units —
  ``w = floor(1e6 * ((t_cnt+1)/(T+B)) / ((r_cnt+1)/(R+B)))``.
  DSIR sums *log* ratios; engines disagree in the last ulp of ``ln``, so the
  driver-checked form sums the micro-ratio weights directly (a monotone
  per-bucket transform of the same evidence — documented divergence, the
  log form is a one-line swap where cross-engine bit-equality isn't needed).
- Score = floor(mean bucket weight over the document's tokens) — length-
  normalized so long documents don't dominate.

Scale shape (100 TB): one token explode feeding a B-row groupBy (map-side
combinable), the B-row weight table broadcast back, one doc_id groupBy.
No self-joins, no Python, no driver collection; the only wide exchange is
the doc_id aggregation. The 1-row totals join is a broadcast nested loop
over a literal single row (the standard scalar-broadcast pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import tokens

DSIR_BUCKETS = 256


def token_bucket(tok, buckets: int = DSIR_BUCKETS):
    """Hash bucket of a token column: int(md5[:8], 16) % buckets — portable
    (the same expression is one CAST in DuckDB)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % buckets
    )


def importance_weights(
    docs: DataFrame, target_col: str = "is_target", buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Per-bucket importance weight table (``bucket``, ``w_micro``) from a
    corpus with a boolean target-membership column.

    ≤ ``buckets`` rows — broadcast it into the scoring join."""
    feats = docs.select(
        F.explode(tokens(F.col("text"))).alias("tok"),
        F.col(target_col).cast("long").alias("is_t"),
    ).select(token_bucket(F.col("tok"), buckets).alias("bucket"), "is_t")
    cnt = feats.groupBy("bucket").agg(
        F.sum("is_t").alias("t_cnt"), F.count(F.lit(1)).alias("r_cnt")
    )
    totals = cnt.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    w = (
        F.lit(1000000.0)
        * ((F.col("t_cnt") + 1) / (F.col("t_tot") + buckets))
        / ((F.col("r_cnt") + 1) / (F.col("r_tot") + buckets))
    )
    return cnt.join(F.broadcast(totals)).select(
        "bucket", F.floor(w).cast("long").alias("w_micro")
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    terms: tuple,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 retrieval score of every document against a literal query
    term set — the ranked-retrieval primitive of a corpus analytics engine
    (score-threshold selection is the same drop_score shape as above, with a
    query-conditional relevance weight instead of a corpus prior).

    Portability: the classic BM25 idf is ln((N-df+0.5)/(df+0.5)); ``ln`` is
    not correctly rounded and differs across engines in the last ulp, so the
    driver-checked form uses the RATIONAL idf (N-df+0.5)/(df+0.5) — same
    evidence, monotone in df — and every remaining op (+,*,/ on doubles in a
    fixed left-to-right order) is correctly-rounded IEEE → bit-equal across
    engines. floor(score·1e6) is emitted. The log form is a one-line swap
    where cross-engine bit-equality isn't needed (documented divergence, as
    with the DSIR micro-ratio weights).

    Scale shape (100 TB): per-term tf columns are array filters in ONE
    projection (terms are a tiny literal set — no explode, no shuffle); the
    corpus-level stats (N, total tokens, per-term df) are a single map-side
    combinable aggregate whose 1-row result is broadcast back. The only full
    pass over text is the tf projection.

    Returns (doc_id, bm25_micro).
    """
    toks = tokens(F.col("text"))
    def _tf(term: str):
        lit = F.lit(term)
        # one-arg lambda: a (x, i) signature would make F.filter pass the
        # element INDEX as the second argument
        return F.size(F.filter(toks, lambda x: x == lit)).cast("long")

    tf_cols = [_tf(t).alias(f"tf{i}") for i, t in enumerate(terms)]
    base = docs.select(
        "doc_id", F.size(toks).cast("long").alias("dl"), *tf_cols
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("dl").alias("av"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    j = base.join(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf{i}").cast("double")
        dl = F.col("dl").cast("double")
        nd = F.col("nd").cast("double")
        av = F.col("av").cast("double")
        df = F.col(f"df{i}").cast("double")
        idf = (nd - df + F.lit(0.5)) / (df + F.lit(0.5))
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * dl * nd / av
        )
        contrib = idf * (tf * F.lit(k1 + 1.0)) / denom
        score = contrib if score is None else score + contrib
    return j.select(
        "doc_id",
        F.floor(score * F.lit(1e6)).cast("long").alias("bm25_micro"),
    )


def importance_scores(
    docs: DataFrame, target_col: str = "is_target", buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Per-doc importance score: floored mean bucket weight over the doc's
    tokens (micro units). Returns (doc_id, dsir_micro) for every input doc."""
    wtab = F.broadcast(importance_weights(docs, target_col, buckets))
    feats = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).select("doc_id", token_bucket(F.col("tok"), buckets).alias("bucket"))
    return (
        feats.join(wtab, "bucket")
        .groupBy("doc_id")
        .agg(
            F.floor(F.sum("w_micro") / F.count(F.lit(1)))
            .cast("long")
            .alias("dsir_micro")
        )
    )
