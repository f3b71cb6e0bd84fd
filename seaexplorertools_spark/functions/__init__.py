from . import geodesy, math  # noqa: F401
