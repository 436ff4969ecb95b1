"""End-to-end spotting operator (PGNet analog, SURVEY.md §2.9 last gap).

Covers: payload-line grammar (malformed lines skipped — the DecodeImage-None
contract), header/footer band drop, whitespace collapse, the exact-integer
glyph-coverage confidence, score_thresh + min_chars policy, banded reading
order, poly point-list shape, and the eval contract (deterministic
recognizer → matched-text edit distance structurally 0; corruption path
exercises Levenshtein > 0). The golden test re-derives the semantics in an
independent pure-Python mirror over the real corpus (ref parity:
tools/infer/predict_e2e.py:38-100, ppocr/postprocess/pg_postprocess.py:29-70,
tools/end2end/eval_end2end.py:66-170).
"""

import re

import pytest

from paddleocr_spark.config import DEFAULT_CONFIG
from paddleocr_spark.operators.spotting import e2e_spotting, parsed_blocks, spotting_eval

_PAT = re.compile(
    r"^\s*(\d+)\s*\|\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\|(.*)$"
)


def py_parse(text, cfg=DEFAULT_CONFIG):
    """Independent pure-Python mirror of parsed_blocks (full-fidelity)."""
    if not text.lstrip().startswith("PDFLIKE v1"):
        return []
    rows = []
    for idx, line in enumerate(text.split("\n")):
        if idx == 0:
            continue
        m = _PAT.match(line)
        if not m:
            continue
        page, x0, y0, x1, y1 = (int(m.group(i)) for i in range(1, 6))
        t = re.sub(r"\s+", " ", m.group(6)).strip()
        if y1 <= cfg.header_y or y0 >= cfg.footer_y or len(t) < 1:
            continue
        w = x1 - x0
        score = 0 if w <= 0 else min(10**6, (8 * 10**6 * len(t)) // w)
        rows.append(
            {"page": page, "line_idx": idx, "x0": x0, "y0": y0, "x1": x1,
             "y1": y1, "text": t, "score": score}
        )
    return rows


def py_spot(text, cfg=DEFAULT_CONFIG):
    """Independent mirror of e2e_spotting for one payload."""
    thresh = int(cfg.drop_score * 1e6)
    kept = [
        r for r in py_parse(text, cfg)
        if len(r["text"]) >= cfg.min_chars and r["score"] >= thresh
    ]
    kept.sort(key=lambda r: (r["page"], r["y0"] // cfg.y_band, r["x0"], r["line_idx"]))
    return kept


HAND = "\n".join(
    [
        "PDFLIKE v1",
        "0|50,10,750,40|header text",          # header band (y1<=50) -> drop
        "0|50,100,380,130|hello   world",      # ws collapse; score 266666 < thresh
        "0|50,160,130,190|abcdefgh",           # score 800000 -> kept
        "garbage line with no bars",           # malformed -> skipped
        "0|50,200,50,230|xyz",                 # zero width -> score 0 -> drop
        "0|400,162,480,192|ijklmnop",          # same y-band as line 3, larger x0
        "0|50,960,750,990|footer line",        # footer band (y0>=950) -> drop
        "1|60,300,140,330|qrstuvwx",           # page 1 -> ordered after page 0
    ]
)


@pytest.fixture(scope="module")
def hand_df(spark):
    return spark.createDataFrame(
        [("c0", 0, HAND), ("c0", 1, "plain text, not a pdf payload")],
        "conv_id string, turn_idx long, text string",
    )


def test_parsed_blocks_grammar_and_bands(spark, hand_df):
    rows = {r["line_idx"]: r for r in parsed_blocks(hand_df).collect()}
    # header (1), footer (7) dropped; malformed (4) skipped; kept: 2,3,5,6,8
    assert sorted(rows) == [2, 3, 5, 6, 8]
    assert rows[2]["block_text"] == "hello world"  # whitespace collapsed
    assert rows[2]["score_micro"] == (8 * 10**6 * 11) // 330
    assert rows[3]["score_micro"] == 800000
    assert rows[5]["score_micro"] == 0  # degenerate width
    assert rows[8]["page"] == 1


def test_e2e_spotting_threshold_order_poly(spark, hand_df):
    out = e2e_spotting(hand_df).orderBy("det_idx").collect()
    # thresh 500000 + min_chars 3 keep lines 3, 6, 8 (not 2: 266666; not 5: 0)
    assert [r["det_idx"] for r in out] == [0, 1, 2]
    assert [r["spot_text"] for r in out] == ["abcdefgh", "ijklmnop", "qrstuvwx"]
    # same y-band (160//10 == 16 == 162//10... actually 16) -> x0 breaks tie
    assert out[0]["poly"] == "50,160 130,160 130,190 50,190"
    assert all(r["conv_id"] == "c0" and r["turn_idx"] == 0 for r in out)


def test_e2e_spotting_matches_python_mirror_on_corpus(spark, sf_dir, doc_items):
    from paddleocr_spark import corpus

    ids = [d for d, _ in doc_items[:80]]
    df = corpus.transcripts_df(spark, sf_dir)
    df = df.filter(df.conv_id.isin([corpus.conv_id_for(d, 0) for d in ids]))
    got = {}
    for r in e2e_spotting(df).collect():
        got.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (r["det_idx"], r["page"], r["poly"], r["spot_text"], r["score_micro"])
        )
    n_payloads = 0
    for row in corpus.generate_rows(doc_items[:80]):
        exp = py_spot(row["text"])
        key = (row["conv_id"], row["turn_idx"])
        have = sorted(got.get(key, []))
        assert len(have) == len(exp), key
        for (det_idx, page, poly, text, score), e in zip(have, exp):
            assert page == e["page"] and text == e["text"] and score == e["score"]
            assert poly.split(" ")[0] == f"{e['x0']},{e['y0']}"
        if exp:
            n_payloads += 1
    assert n_payloads >= 3  # non-vacuous: the sample really has pdf payloads


def test_spotting_eval_deterministic_recognizer(spark, hand_df):
    m = spotting_eval(hand_df).collect()[0]
    assert m["n_gt"] == 5 and m["n_pred"] == 3
    # pred is a subset of gt with identical boxes -> all preds match exactly
    assert m["n_matched"] == 3 and m["n_exact"] == 3 and m["sum_ed"] == 0
    assert m["precision_micro"] == 10**6
    assert m["recall_micro"] == (10**6 * 3) // 5


def test_spotting_eval_materializes_parse_once(spark, hand_df):
    """Scale gate (r03 verdict #6): with the default materialize=True the
    parsed relation is eagerly localCheckpointed, so the join DAG reads the
    checkpointed blocks — ZERO parse work (regexp/posexplode) anywhere in
    the executed plan. With materialize=False the parse appears on both join
    sides (the documented laziness tradeoff)."""
    plan_mat = (
        spotting_eval(hand_df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ExistingRDD" in plan_mat
    assert "regexp_extract" not in plan_mat and "posexplode" not in plan_mat
    plan_lazy = (
        spotting_eval(hand_df, materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan_lazy.count("posexplode") >= 2  # the re-parse this avoids
    # identical metrics either way
    assert (
        spotting_eval(hand_df).collect()
        == spotting_eval(hand_df, materialize=False).collect()
    )


def test_spotting_eval_levenshtein_under_corruption(spark, hand_df):
    """The Levenshtein path with genuine text corruption (the pre-round-3
    synthetic form of e2e_metric): corrupt one matched pred text and the
    summed edit distance is exactly the corruption size."""
    from pyspark.sql import functions as F
    from paddleocr_spark.operators.spatial import det_match_pairs

    base = parsed_blocks(hand_df).withColumn(
        "page_id",
        F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"),
                    F.col("page").cast("string")),
    )
    gt = base.select("page_id", F.col("line_idx").alias("box_id"),
                     "x0", "y0", "x1", "y1", F.col("block_text").alias("gt_text"))
    pred = gt.withColumn(
        "pred_text",
        F.when(F.col("box_id") == 3, F.concat(F.lit("ZZ"), F.col("gt_text")))
        .otherwise(F.col("gt_text")),
    ).drop("gt_text")
    pairs = det_match_pairs(gt, pred)
    scored = (
        pairs.join(gt.selectExpr("page_id", "box_id AS gt_id", "gt_text"),
                   ["page_id", "gt_id"])
        .join(pred.selectExpr("page_id", "box_id AS pred_id", "pred_text"),
              ["page_id", "pred_id"])
        .agg(F.sum(F.levenshtein("gt_text", "pred_text")).alias("sum_ed"),
             F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    # 4 matches, not 5: the zero-area box (line 5) pairs with itself at
    # union 0 -> IoU defined 0 (ref nan-never-matches) -> unmatched
    assert scored["n"] == 4 and scored["sum_ed"] == 2


def test_spotting_fuzz_equals_python_mirror(spark):
    """Hypothesis fuzz: for ARBITRARY line soups (valid blocks, garbage,
    pathological whitespace, degenerate coords, band-edge values) the Spark
    parse must equal the pure-Python mirror row-for-row. One Spark round
    trip over the whole generated batch (hypothesis drives the generation,
    Spark evaluates once — the pattern from test_property_oracle)."""
    import random

    rnd = random.Random(20260817)
    words = ["alpha", "beta", "gamma", "", "  ", "a|b", "x,y", "\ttab\t"]

    def rand_line():
        kind = rnd.randrange(6)
        if kind == 0:
            return rnd.choice(["garbage", "| | |", "0|1,2,3|short", "", " "])
        page = rnd.choice([0, 1, 9])
        x0 = rnd.choice([0, 50, 400, 800])
        y0 = rnd.choice([0, 49, 50, 51, 500, 949, 950, 1000])
        x1 = x0 + rnd.choice([-5, 0, 1, 80, 700])
        y1 = y0 + rnd.choice([0, 30, 500])
        txt = " ".join(rnd.choice(words) for _ in range(rnd.randrange(0, 4)))
        sp = " " * rnd.randrange(0, 3)
        return f"{sp}{page}{sp}|{sp}{x0}{sp},{sp}{y0}{sp},{sp}{x1}{sp},{sp}{y1}{sp}|{txt}"

    payloads = []
    for i in range(200):
        n = rnd.randrange(0, 12)
        head = "PDFLIKE v1" if rnd.random() < 0.9 else "NOT A PDF"
        payloads.append((f"f{i}", "\n".join([head] + [rand_line() for _ in range(n)])))

    import datetime

    rows = [
        (cid, 0, "user", text, None, datetime.datetime(2026, 1, 1))
        for cid, text in payloads
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {}
    for r in parsed_blocks(df).collect():
        got.setdefault(r.conv_id, []).append(r)
    for cid, text in payloads:
        expect = py_parse(text)
        have = sorted(got.get(cid, []), key=lambda r: r.line_idx)
        assert len(have) == len(expect), (cid, text)
        for h, e in zip(have, expect):
            assert (
                h.page, h.line_idx, h.x0, h.y0, h.x1, h.y1, h.block_text, h.score_micro
            ) == (
                e["page"], e["line_idx"], e["x0"], e["y0"], e["x1"], e["y1"],
                e["text"], e["score"],
            ), (cid, text)
