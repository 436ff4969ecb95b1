from .extract import (  # noqa: F401
    SPAN_TYPE,
    conversation_document,
    extract,
    extract_ordered,
    make_extract_udf,
    ordered_output,
    with_payload_kind,
)
from .markdown import render_markdown  # noqa: F401

__all__ = [
    "extract",
    "extract_ordered",
    "make_extract_udf",
    "with_payload_kind",
    "ordered_output",
    "conversation_document",
    "render_markdown",
    "SPAN_TYPE",
]
