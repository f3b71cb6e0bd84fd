from . import parquet  # noqa: F401
