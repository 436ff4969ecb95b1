from .table import TRANSCRIPT_COLUMNS, is_table_ref, read_transcripts

__all__ = ["TRANSCRIPT_COLUMNS", "is_table_ref", "read_transcripts"]
