"""Markdown document assembly from ordered span arrays.

The ``convert_info_markdown`` analog (/root/reference/ppstructure/recovery/
recovery_to_markdown.py:129-187): per-span dispatch on kind (title → ``#``,
table → pipe rows, code → fenced block, list → ``- `` bullets, para →
paragraph), markdown special-character escaping for prose kinds
(``recovery_to_markdown.py:141-145`` escapes ``* ` ~ $``), join with blank
lines, squeeze ≥3 newlines — expressed ENTIRELY in Spark SQL built-ins
(``transform`` + ``array_join`` + ``regexp_replace``), zero Python, fully
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _render_span(s) -> Column:
    esc = F.regexp_replace(s["text"], r"([*`~$])", r"\\$1")
    return (
        F.when(s["kind"] == "title", F.concat(F.lit("# "), esc))
        .when(s["kind"] == "formula", F.concat(F.lit("$$\n"), s["text"], F.lit("\n$$")))
        .when(s["kind"] == "code", F.concat(F.lit("```\n"), s["text"], F.lit("\n```")))
        .when(
            s["kind"] == "list",
            F.concat(F.lit("- "), F.regexp_replace(esc, r"\n", "\n- ")),
        )
        .when(
            s["kind"] == "table",
            F.concat(F.lit("| "), F.regexp_replace(s["text"], r"\n", " |\n| "), F.lit(" |")),
        )
        .otherwise(esc)
    )


def render_markdown(df: DataFrame, spans_col: str = "spans") -> DataFrame:
    """Add a ``markdown`` column rendered from the ordered span array."""
    md = F.regexp_replace(
        F.array_join(F.transform(F.col(spans_col), _render_span), "\n\n"),
        r"\n{3,}",
        "\n\n",
    )
    return df.withColumn("markdown", md)
