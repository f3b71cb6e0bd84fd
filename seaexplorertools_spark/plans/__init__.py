from .inspect import explain_str, has_pushed_filters, read_schema_columns, scan_info  # noqa: F401
