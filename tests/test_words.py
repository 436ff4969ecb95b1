"""Word segmentation / RTL / full-width tests — the test_french_accents.py
style of the reference (/root/reference/tests/test_french_accents.py:28-60):
hand-written inputs with exact expected outputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from paddleocr_spark.functions.textnorm import strq2b, strq2b_col
from paddleocr_spark.functions.words import (
    pred_reverse,
    pred_reverse_col,
    word_segments,
)


def words_of(text):
    return [w for w, _, _ in word_segments(text)]


def test_word_segments_basic():
    assert words_of("hello world") == ["hello", "world"]
    assert words_of("  spaced   out ") == ["spaced", "out"]


def test_word_segments_french_contractions():
    assert words_of("l'été est là") == ["l'été", "est", "là"]
    assert words_of("aujourd'hui") == ["aujourd'hui"]
    assert words_of("café!") == ["café"]


def test_word_segments_joiners():
    assert words_of("state-of-the-art") == ["state-of-the-art"]
    assert words_of("pi is 3.14.") == ["pi", "is", "3.14"]
    assert words_of("end-") == ["end"]  # trailing joiner splits


def test_word_segments_offsets():
    segs = word_segments("ab cd")
    assert segs == [("ab", 0, 2), ("cd", 3, 5)]


def test_word_segments_cjk():
    assert words_of("中文 mixed 字") == ["中", "文", "mixed", "字"]


def test_pred_reverse():
    assert pred_reverse("abc def") == "def abc"
    assert pred_reverse("a1 ! b2") == "b2 ! a1"
    assert pred_reverse("") == ""


def test_pred_reverse_col_matches_python(spark):
    rows = [("abc def!",), ("x 42 , y",), ("",)]
    df = spark.createDataFrame(rows, ["t"])
    got = [r.r for r in df.select(pred_reverse_col(F.col("t")).alias("r")).collect()]
    assert got == [pred_reverse(t) for (t,) in rows]


def test_strq2b_python_and_col(spark):
    s = "ＡＢＣ　１２３！"
    assert strq2b(s) == "ABC 123!"
    df = spark.createDataFrame([(s,)], ["t"])
    assert df.select(strq2b_col(F.col("t")).alias("r")).collect()[0].r == "ABC 123!"


def test_word_boxes_proportional():
    from paddleocr_spark.functions.words import word_boxes

    boxes = word_boxes("ab cd", (100, 10, 200, 40))
    assert [b[0] for b in boxes] == ["ab", "cd"]
    (w1, x0a, y0a, x1a, y1a), (w2, x0b, _, x1b, _) = boxes
    assert (y0a, y1a) == (10, 40)
    assert x0a == 100 and x1a == 140   # chars 0..2 of 5 over width 100
    assert x0b == 160 and x1b == 200   # chars 3..5
    assert word_boxes("", (0, 0, 10, 10)) == []


def test_unclip_box():
    from paddleocr_spark.functions.words import unclip_box

    # 100x20 box: d = round(2000*1.5/240) = round(12.5) = 12 (banker's)
    assert unclip_box((0, 0, 100, 20)) == (-12, -12, 112, 32)
    assert unclip_box((5, 5, 5, 9)) == (5, 5, 5, 9)  # degenerate unchanged


def test_table_similarity_micro():
    from paddleocr_spark.functions.tablesim import table_similarity_micro as sim

    t = "a | b\nc | d"
    assert sim(t, t) == 1000000
    # one relabeled cell of 5 tokens (4 cells + 1 row sep) → 1 - 1/5
    assert sim(t, "a | b\nc | X") == 800000
    # a dropped row costs its cells + the row separator
    assert sim(t, "a | b") < 800000
    assert sim("", "") == 1000000
    # structure matters: same cells, different row split → not identical
    assert sim("a | b\nc | d", "a | b | c | d") < 1000000


def test_table_similarity_udf(spark):
    from paddleocr_spark.functions.tablesim import (
        table_similarity_micro,
        table_similarity_udf,
    )

    rows = [("a | b\nc | d", "a | b\nc | d"), ("a | b", "x | y"), ("", "a")]
    df = spark.createDataFrame(rows, ["pred", "gt"])
    udf = table_similarity_udf()
    got = [r.s for r in df.select(udf("pred", "gt").alias("s")).collect()]
    assert got == [table_similarity_micro(p, g) for p, g in rows]


def test_word_segments_equals_regex_closed_form():
    """The get_word_info state machine (word_segments) must equal the regex
    closed form used by the word_segments DuckDB oracle in __spark_entry__
    (maximal alnum runs glued by one internal joiner followed by alnum)."""
    import re

    from hypothesis import given, settings, strategies as st

    from paddleocr_spark.functions.words import word_segments

    # CJK alternation: the state machine emits one word per CJK char
    # (rec_postprocess.py:131-140 'cn' branch) — the closed form must too
    RX = re.compile(r"[a-zA-Z0-9À-ɏ]+(?:['’\-.][a-zA-Z0-9À-ɏ]+)*|[一-鿿㐀-䶿]")

    def regex_words(t):
        return RX.findall(t)

    for s in [
        "l'été café", "state-of-the-art", "3.14 end.", "a..b", "don't-stop.",
        "x'", "-a", "a- b", "naïve fiancée №5", "a.b.c..d", "", "  ", "...",
        "中文 words 混合", "a.中", "中-b", "你好，世界 hello", "㐀㑇 mixed-字",
    ]:
        assert [w for w, _, _ in word_segments(s)] == regex_words(s), s

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(
            alphabet=st.sampled_from(list("ab1 '’-.,;é!\t\n中文字㐀")),
            max_size=60,
        )
    )
    def fuzz(s):
        assert [w for w, _, _ in word_segments(s)] == regex_words(s)

    fuzz()
