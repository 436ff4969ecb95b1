"""Physical-plan property gates.

The engine's 100 TB story is plan shape, not constants: one deliberate
shuffle for extraction, pruned scans, broadcast for small dims, no nested-
loop joins on the big paths. These tests freeze those properties so a
refactor that silently degrades the plan (a second Exchange, a lost
pushdown, a cartesian product) fails CI — the `.explain`-driven iteration
the build plan calls for (SURVEY.md §4), captured as assertions.
"""

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def transcripts(spark, sf_dir):
    from paddleocr_spark.plans.flagship import corpus_df

    return corpus_df(spark, sf_dir)


def test_extract_has_single_exchange_and_single_python_crossing(spark, transcripts):
    from paddleocr_spark.operators import extract

    plan = _plan(extract(transcripts))
    assert plan.count("Exchange") == 1, plan  # only the salted repartition
    assert plan.count("ArrowEvalPython") == 1, plan  # one fused UDF crossing


def test_extract_unsalted_has_no_exchange(spark, transcripts):
    from paddleocr_spark.operators import extract

    plan = _plan(extract(transcripts, salt=False))
    assert plan.count("Exchange") == 0, plan


def test_extract_ordered_single_udf_pass(spark, transcripts):
    """extract_ordered must range-partition the RAW input: one UDF node, one
    range Exchange, and the UDF sits ABOVE the Exchange (so the sampling
    pass never executes it)."""
    from paddleocr_spark.operators import extract_ordered

    plan = _plan(extract_ordered(transcripts))
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "rangepartitioning" in plan.lower(), plan
    assert plan.lower().index("arrowevalpython") < plan.lower().index(
        "rangepartitioning"
    ), "UDF must be above the range exchange (executedPlan prints top-down)"


def test_narrow_projection_prunes_scan(spark, sf_dir):
    """Column pruning must reach the parquet scan through the UDF: a
    projection needing only the UDF output reads (text) plus the selected
    passthrough keys — never role/tool/ts."""
    from paddleocr_spark.operators import extract
    from paddleocr_spark.plans.flagship import corpus_df

    df = extract(corpus_df(spark, sf_dir)).select("conv_id", "turn_idx", "n_spans")
    plan = _plan(df)
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if m is None:  # corpus may come from the cached parquet or in-memory plan
        pytest.skip("no parquet scan in plan (cached corpus)")
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert "role" not in cols and "tool" not in cols and "ts" not in cols, plan


def test_broadcast_rollup_uses_broadcast_join(spark, sf_dir):
    import __spark_entry__ as E

    plan = _plan(E.q_broadcast_rollup(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_spatial_join_is_not_nested_loop(spark, sf_dir):
    """The rectangle-overlap semi-join hash-partitions on the (page_id)
    equi key with the range predicate as residual — it must never plan as a
    cartesian/nested-loop join."""
    import __spark_entry__ as E

    plan = _plan(E.q_spatial_join(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ann_topk_broadcasts_queries(spark, sf_dir):
    """Cosine top-k must broadcast the small query side, never shuffle the
    corpus side into a sort-merge join."""
    import __spark_entry__ as E

    plan = _plan(E.q_ann_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_kind_filter_pushes_to_scan(spark, sf_dir):
    """payload_kind is a pure-SQL sniff column, so a kind filter must appear
    as a Filter over the scan BELOW the Python crossing (the reference's
    routing-before-inference shape)."""
    from paddleocr_spark.operators import extract, with_payload_kind
    from paddleocr_spark.plans.flagship import corpus_df

    base = with_payload_kind(corpus_df(spark, sf_dir))
    df = extract(base.filter("payload_kind = 'html'"), salt=False)
    plan = _plan(df)
    lower = plan.lower()
    assert "filter" in lower, plan
    assert lower.index("arrowevalpython") < lower.index("filter"), (
        "kind filter must evaluate below (after, in print order) the UDF"
    )


def test_dedup_embedding_no_cartesian(spark, sf_dir):
    """The embedding near-dup path must stay a bucket equi-join — never an
    all-pairs product (the round-1 weak spot, fixed by banded LSH)."""
    import __spark_entry__ as E

    plan = _plan(E.q_dedup_embedding(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_kie_pairs_single_window_no_join(spark, sf_dir):
    """RE linking is one running window over (user, time) — a self-join
    formulation would double-scan events and shuffle twice."""
    import __spark_entry__ as E

    plan = _plan(E.q_kie_pairs(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("WindowExec") <= 1 or plan.count("Window") >= 1, plan


def test_table_master_no_cartesian(spark, sf_dir):
    """The cascade's cross-score is an equi-join on page_id; rules are
    windows/anti-joins over it — no nested-loop anywhere."""
    import __spark_entry__ as E

    plan = _plan(E.q_table_match_master(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_plain_sql_path_has_no_python(spark, transcripts):
    """extract_plain_sql must be Catalyst-only: zero Arrow/Python nodes in
    the physical plan (the routed plain fraction never pays a crossing)."""
    from pyspark.sql import functions as F

    from paddleocr_spark.operators.extract import extract_plain_sql, with_payload_kind

    plain = (
        with_payload_kind(transcripts)
        .filter(F.col("payload_kind") == "plain")
        .drop("payload_kind")
    )
    plan = _plan(extract_plain_sql(plain))
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "FlatMapGroupsInPandas" not in plan, plan


def test_plain_sql_equals_kernel(spark):
    """The SQL plain path must equal the Python kernel row-for-row on
    adversarial plain strings (empty, whitespace soups, short drops,
    truncation-guard sizes are covered by the corpus-level golden check)."""
    import datetime

    from paddleocr_spark.kernel import assemble_text, extract_payload
    from paddleocr_spark.operators.extract import extract_plain_sql

    cases = [
        "",
        "   ",
        "one paragraph only",
        "a\n\nbb\n\nccc",
        "first para here\n\n\n\nsecond para",
        "x\n \t \ny tail",
        "ok\n\nlong enough paragraph",
        "padded   spaces\n\n\nnext",
        None,
    ]
    rows = [
        ("c", i, "user", t, None, datetime.datetime(2026, 1, 1))
        for i, t in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    got = {
        r.turn_idx: r for r in extract_plain_sql(df).collect()
    }
    for i, t in enumerate(cases):
        kind, spans, dropped = extract_payload(t)
        assert kind == "plain"
        g = got[i]
        assert [(s.span_idx, s.kind, s.text, s.score, s.bbox) for s in g.spans] == [
            (i2, k, tx, sc, bb) for (i2, k, tx, sc, bb) in spans
        ], (i, t)
        assert g.n_dropped == dropped and g.n_spans == len(spans)
        assert g.extracted_text == assemble_text(spans)


def test_extract_routed_equals_extract(spark, transcripts):
    """Routed (SQL plain + kernel html/pdf) output must be row-identical to
    the fused kernel on the full mixed corpus; only the html/pdf branch may
    carry an Arrow crossing."""
    from paddleocr_spark.operators.extract import extract, extract_routed

    routed = extract_routed(transcripts)
    plan = _plan(routed)
    assert plan.count("ArrowEvalPython") == 1, plan  # kernel branch only

    cols = ["conv_id", "turn_idx", "payload_kind", "n_spans", "n_dropped",
            "extracted_text"]
    a = sorted(map(tuple, extract(transcripts).select(cols).collect()))
    b = sorted(map(tuple, routed.select(cols).collect()))
    assert a == b


def test_spotting_plan_has_no_python_and_prunes(spark, transcripts):
    """e2e_spotting is the only extraction-family operator that claims ZERO
    Python anywhere in its plan (operators/spotting.py) — gate it: no
    Arrow/Python eval nodes, exactly one Exchange (the per-turn ordering
    window), and the window's shuffle is on the turn key."""
    from paddleocr_spark.operators.spotting import e2e_spotting

    plan = _plan(e2e_spotting(transcripts))
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "FlatMapGroupsInPandas" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # one shuffle: the reading-order window over (conv_id, turn_idx)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bucketed_join_has_no_exchange(spark, transcripts):
    """Co-located storage is the 100 TB join story: two tables bucketed on
    conv_id with the same bucket count must join with ZERO Exchange nodes —
    the shuffle was paid once at write time. Also gate the negative: the
    same files read WITHOUT the catalog bucket spec do shuffle."""
    from pyspark.sql import functions as F

    from paddleocr_spark.sinks.bucketed import read_bucketed, write_bucketed

    left = transcripts.select("conv_id", "turn_idx", "role").limit(500)
    right = (
        transcripts.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    )
    write_bucketed(left, "t_bkt_left", n_buckets=8, keys=("conv_id",))
    write_bucketed(
        right, "t_bkt_right", n_buckets=8, keys=("conv_id",), sort_keys=("conv_id",)
    )
    # tiny test tables would take a broadcast join (which disables bucketed
    # scans as pointless); at 100 TB neither side broadcasts — force the
    # sort-merge path the bucketing exists for
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed(spark, "t_bkt_left").join(
            read_bucketed(spark, "t_bkt_right"), "conv_id"
        )
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 500
        # negative control: reading the same data as plain parquet loses the
        # bucket spec and the join plans an Exchange again
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED t_bkt_left")
            .filter("col_name = 'Location'")
            .collect()[0][1]
        )
        raw = spark.read.parquet(loc.replace("file:", ""))
        plan2 = _plan(raw.join(read_bucketed(spark, "t_bkt_right"), "conv_id"))
        assert "Exchange" in plan2, plan2
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS t_bkt_left")
        spark.sql("DROP TABLE IF EXISTS t_bkt_right")


def test_bucketed_groupby_has_no_exchange(spark, transcripts):
    """Aggregating a bucketed table ON its bucket key needs no shuffle
    either — partial and final aggregation collapse into the bucketed
    scan's distribution."""
    from pyspark.sql import functions as F

    from paddleocr_spark.sinks.bucketed import read_bucketed, write_bucketed

    write_bucketed(
        transcripts.select("conv_id", "turn_idx", "role"),
        "t_bkt_agg",
        n_buckets=8,
        keys=("conv_id",),
    )
    try:
        agg = read_bucketed(spark, "t_bkt_agg").groupBy("conv_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bkt_agg")
