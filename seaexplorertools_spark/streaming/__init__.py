from .windowed import stream_windowed_counts, windowed_counts  # noqa: F401
