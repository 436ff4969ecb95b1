from .checkpoint import CheckpointWriter, run_extract_job  # noqa: F401
