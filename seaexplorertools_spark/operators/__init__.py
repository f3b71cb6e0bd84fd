from . import grid, joins, qc, windows  # noqa: F401
