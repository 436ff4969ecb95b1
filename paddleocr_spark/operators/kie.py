"""KIE (key-information extraction) analog: SER labeling + RE linking.

The reference's KIE pipeline labels token spans with semantic classes (SER)
and then links QUESTION→ANSWER entity pairs (RE)
(/root/reference/ppstructure/kie/predict_kie_token_ser_re.py:40-62: SER
predictions feed the RE model, output is a list of (question, answer) span
pairs). Over transcript/event streams the same computation class is:

- **SER analog** (``ser_labels``): classify each row into an entity class by
  a routing predicate — here event_type → question/answer/other (the same
  predicate-routing shape as the cls_thresh branch, SURVEY.md §2.2).
- **RE analog** (``link_entity_pairs``): link each *answer* to the most
  recent preceding *question* of the same partition via a running
  last-ignore-nulls window — the relational form of RE's pairing. One
  window over (user, time): no self-join, no shuffle beyond the partition
  exchange; scales as a plain window at any corpus size.

Both stages are pure Spark SQL (zero Python), and the whole cascade has an
exact DuckDB mirror (last_value IGNORE NULLS) — see __spark_entry__
``kie_pairs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ser_labels(
    events: DataFrame,
    question_type: str = "click",
    answer_type: str = "view",
) -> DataFrame:
    """Add the SER entity label column: question / answer / other."""
    lab = (
        F.when(F.col("event_type") == question_type, F.lit("question"))
        .when(F.col("event_type") == answer_type, F.lit("answer"))
        .otherwise(F.lit("other"))
    )
    return events.withColumn("entity", lab)


def link_entity_pairs(
    labeled: DataFrame,
    key_expr=None,
) -> DataFrame:
    """RE linking: each *answer* row pairs with the latest preceding
    *question* row of the same user (ordered by ts, event_id). Emits
    (user_id, q_event_id, a_event_id, q_key, a_key); answers with no
    preceding question are dropped (no antecedent to link)."""
    if key_expr is None:
        key_expr = F.get_json_object(F.col("props"), "$.k").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_q = F.col("entity") == "question"
    with_prev = labeled.withColumn("k", key_expr).select(
        "user_id",
        "event_id",
        "entity",
        "k",
        F.last(F.when(is_q, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("q_event_id"),
        F.last(F.when(is_q, F.col("k")), ignorenulls=True).over(w).alias("q_key"),
    )
    return (
        with_prev.filter(
            (F.col("entity") == "answer") & F.col("q_event_id").isNotNull()
        )
        .select(
            "user_id",
            "q_event_id",
            F.col("event_id").alias("a_event_id"),
            "q_key",
            F.col("k").alias("a_key"),
        )
    )
