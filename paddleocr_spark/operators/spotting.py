"""End-to-end text spotting — the PGNet analog (SURVEY.md §2.9, last gap).

The reference's PGNet path (/root/reference/tools/infer/predict_e2e.py:38-100,
postprocess /root/reference/ppocr/postprocess/pg_postprocess.py:29-70) is a
ONE-PASS detector+recognizer: a single forward pass emits (polygon, text)
pairs directly — no detect→crop→recognize cascade — then PGPostProcess drops
pairs under ``score_thresh`` and orders the survivors.

The engine's analog spots (polygon, text) pairs from PDF-like payloads in one
pass of pure Spark built-ins — no pandas UDF, no kernel, whole-stage codegen
end to end (this is the only extraction-family operator with zero Python in
the plan):

  scan → filter(pdf magic) → posexplode(lines) → regex parse → header/footer
  band drop → whitespace collapse → confidence score → score_thresh filter →
  banded reading order → (polygon, text, score) rows

Per-stage reference parity:
- payload line grammar        ← functions/pdflike.py ``parse_pdflike``
  (malformed lines skipped, never raised — the DecodeImage-None contract)
- header/footer band drop     ← recovery_to_markdown.py:168-169
- confidence score            ← PGNet per-word CTC confidence; deterministic
  analog: glyph coverage = 8 px/char over the box width, capped at 1 —
  exact-integer ``least(1e6, 8e6·n_chars // width)`` so the DuckDB oracle
  matches bit-for-bit
- ``score_thresh`` filter     ← PGPostProcess score_thresh (default 0.5 =
  cfg.drop_score, tools/infer/utility.py:109)
- reading order               ← sorted_boxes banded (page, y0//y_band, x0,
  line_idx) total order (predict_system.py:160-182), made deterministic by
  quantization

At 100 TB: one scan, no shuffle until the per-turn ordering window (which
hash-partitions on (conv_id, turn_idx) — millions of small groups, no skew:
a turn's block count is bounded by the payload size cap), and the regex work
is JVM-side codegen. The polygon is emitted in PGNet's point-list form
("x0,y0 x1,y0 x1,y1 x0,y1" — quads, the 'partvgg' valid-set shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import ExtractConfig, DEFAULT_CONFIG
from ..functions.sniff import PDF_MAGIC

# One block line: "page|x0,y0,x1,y1|text" with optional spaces around ints.
# Non-matching lines (including the corpus's deliberate malformed ones) are
# skipped, mirroring parse_pdflike's per-line try/except.
PDF_LINE_RE = r"^\s*(\d+)\s*\|\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\|(.*)$"

# glyph coverage assumption for the confidence analog: 8 px per character
_PX_PER_CHAR = 8


def parsed_blocks(df: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG) -> DataFrame:
    """Transcript corpus → one row per well-formed in-band block (the
    full-fidelity parse: everything a perfect spotter could read).

    Output: (conv_id, turn_idx, page, line_idx, x0, y0, x1, y1, block_text,
    n_chars, score_micro). ``score_micro`` is the exact-integer confidence
    ``least(1e6, 1e6·8·n_chars // width)`` (0 for degenerate width)."""
    lines = (
        df.filter(F.ltrim(F.col("text")).startswith(PDF_MAGIC))
        .select(
            "conv_id",
            "turn_idx",
            F.posexplode(F.split(F.col("text"), "\n")).alias("line_idx", "line"),
        )
        .filter(F.col("line_idx") >= 1)  # line 0 is the 'PDFLIKE v1' magic
        .filter(F.col("line").rlike(PDF_LINE_RE))
    )
    g = lambda i: F.regexp_extract(F.col("line"), PDF_LINE_RE, i).cast("long")
    clean = F.trim(F.regexp_replace(F.regexp_extract(F.col("line"), PDF_LINE_RE, 6), r"\s+", " "))
    parsed = lines.select(
        "conv_id",
        "turn_idx",
        g(1).alias("page"),
        F.col("line_idx").cast("long").alias("line_idx"),
        g(2).alias("x0"),
        g(3).alias("y0"),
        g(4).alias("x1"),
        g(5).alias("y1"),
        clean.alias("block_text"),
    )
    width = F.col("x1") - F.col("x0")
    score = F.when(width <= 0, F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(1000000).cast("long"),
            F.floor(F.lit(1000000 * _PX_PER_CHAR) * F.length("block_text") / width),
        )
    )
    return (
        parsed
        # header/footer band drop (blocks fully inside a band)
        .filter(~((F.col("y1") <= cfg.header_y) | (F.col("y0") >= cfg.footer_y)))
        .filter(F.length("block_text") >= 1)
        .withColumn("n_chars", F.length("block_text").cast("long"))
        .withColumn("score_micro", score)
    )


def e2e_spotting(df: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG) -> DataFrame:
    """One-pass (polygon, text) spotting over PDF-like payloads.

    Output per kept block: (conv_id, turn_idx, det_idx, page, poly,
    spot_text, score_micro) — det_idx is the banded reading-order rank
    within the turn, poly is the PGNet-style point list of the quad."""
    thresh_micro = int(cfg.drop_score * 1000000)
    kept = parsed_blocks(df, cfg).filter(
        (F.col("n_chars") >= cfg.min_chars)
        & (F.col("score_micro") >= thresh_micro)
    )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        "page", F.floor(F.col("y0") / cfg.y_band), "x0", "line_idx"
    )
    s = lambda c: F.col(c).cast("string")
    poly = F.concat_ws(
        " ",
        F.concat_ws(",", s("x0"), s("y0")),
        F.concat_ws(",", s("x1"), s("y0")),
        F.concat_ws(",", s("x1"), s("y1")),
        F.concat_ws(",", s("x0"), s("y1")),
    )
    return kept.select(
        "conv_id",
        "turn_idx",
        (F.row_number().over(w) - 1).cast("long").alias("det_idx"),
        "page",
        poly.alias("poly"),
        F.col("block_text").alias("spot_text"),
        "score_micro",
    )


def spotting_eval(
    df: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    materialize: bool = True,
) -> DataFrame:
    """End-to-end spotting evaluation of ``e2e_spotting`` against the
    full-fidelity parse as ground truth (/root/reference/tools/end2end/
    eval_end2end.py:66-170): boxes matched geometrically (IoU ≥ 0.5,
    one-to-one greedy — operators/spatial.py det_match_pairs), matched texts
    scored by Levenshtein.

    The engine's recognizer is deterministic, so matched-text edit distance
    is structurally 0 (asserted by the n_exact column); the discriminating
    signal is box-level recall — what the score_thresh + min_chars policy
    drops. The Levenshtein path under genuine corruption is exercised in
    tests/ (synthetic one-char corruptions, the pre-round-3 form of this
    query).

    Scale note: gt and pred are two filters of the SAME parsed relation, and
    Catalyst does not share subplans across join sides — an unmaterialized
    plan re-computes the full parse on BOTH sides of the match join (and
    again under the two count aggregates). ``materialize=True`` (default,
    the round-3 verdict's seam-as-default item) eagerly localCheckpoints the
    parsed relation once, so every consumer reads the post-parse blocks —
    which carry no raw payload text, i.e. the cached relation is the SMALL
    side of the tradeoff (unlike extract_routed's measured persist loss,
    where caching meant materializing the full text column). Opt out with
    ``materialize=False`` only when the input is a trivial sample and plan
    laziness matters more than the double parse."""
    from .spatial import det_match_pairs

    page_key = F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"), F.col("page").cast("string"))
    gt_all = parsed_blocks(df, cfg).withColumn("page_id", page_key)
    if materialize:
        gt_all = gt_all.localCheckpoint(eager=True)
    gt = gt_all.select(
        "page_id",
        F.col("line_idx").alias("box_id"),
        "x0",
        "y0",
        "x1",
        "y1",
        F.col("block_text").alias("gt_text"),
    )
    thresh_micro = int(cfg.drop_score * 1000000)
    pred = gt_all.filter(
        (F.col("n_chars") >= cfg.min_chars)
        & (F.col("score_micro") >= thresh_micro)
    ).select(
        "page_id",
        F.col("line_idx").alias("box_id"),
        "x0",
        "y0",
        "x1",
        "y1",
        F.col("block_text").alias("pred_text"),
    )
    pairs = det_match_pairs(gt, pred)
    scored = (
        pairs.join(
            gt.select("page_id", F.col("box_id").alias("gt_id"), "gt_text"),
            ["page_id", "gt_id"],
        )
        .join(
            pred.select("page_id", F.col("box_id").alias("pred_id"), "pred_text"),
            ["page_id", "pred_id"],
        )
        .withColumn("ed", F.levenshtein("gt_text", "pred_text").cast("long"))
    )
    counts = scored.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum("ed").alias("sum_ed"),
        F.sum((F.col("ed") == 0).cast("long")).alias("n_exact"),
    )
    totals = gt.agg(F.count(F.lit(1)).alias("n_gt")).crossJoin(
        pred.agg(F.count(F.lit(1)).alias("n_pred"))
    )
    return totals.crossJoin(counts).select(
        "n_gt",
        "n_pred",
        "n_matched",
        "sum_ed",
        "n_exact",
        F.expr("1000000 * sum_ed DIV n_matched").alias("mean_ed_micro"),
        F.expr("1000000 * n_matched DIV n_gt").alias("recall_micro"),
        F.expr("1000000 * n_matched DIV n_pred").alias("precision_micro"),
    )
