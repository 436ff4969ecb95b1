from .extract import extract, make_extract_udf, with_payload_kind, ordered_output, SPAN_TYPE

__all__ = ["extract", "make_extract_udf", "with_payload_kind", "ordered_output", "SPAN_TYPE"]
