"""Plot sink — S7, the last open reference surface: ~30 % of
process_adcp.py is diagnostic plotting gated by ``options
['debug_plots']`` and saved via ``save_plot(plot_dir, plot_name)``
(process_adcp.py:53-56; panel blocks e.g. :272-308, :1618-1649).

The reference draws matplotlib figures; this engine renders REAL PNGs
with its own codec (operators/multimodal.py::encode_png — no plotting
libs in a Spark executor image, and none needed): a viridis heatmap of
any long-format gridded field (the pcolormesh panels), a polyline
time-series track and 1-px scatter marks (the pitch/pressure panels) on
a shared canvas. Scope is the DATA PANEL — axes text/legends are a
notebook concern, documented deviation.

Scale contract: plotting is inherently a driver-side sink on BOUNDED
data (the reference caps its own panels at ~30 000 pings,
process_adcp.py:967) — ``heatmap_sink`` collects the grid ONLY after a
cheap count gate (``max_cells``, default 2M ≈ a 4 MP image) and raises
loudly above it; the distributed engine work (gridding, binning,
downsampling via LTTB ``operators/downsample.py``) happens BEFORE the
sink, which is exactly how the reference composes plots from its
already-gridded arrays.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# 10 anchor stops of matplotlib's public-domain viridis colormap
_VIRIDIS = [
    (68, 1, 84), (72, 40, 120), (62, 74, 137), (49, 104, 142),
    (38, 130, 142), (31, 158, 137), (53, 183, 121), (109, 205, 89),
    (180, 222, 44), (253, 231, 37),
]
_NAN_RGB = (160, 160, 160)


def colormap_rgb(t: float) -> tuple[int, int, int]:
    """t ∈ [0, 1] → viridis RGB via linear interpolation of the anchor
    stops (clamped outside)."""
    if t != t:  # NaN
        return _NAN_RGB
    t = 0.0 if t < 0 else (1.0 if t > 1 else t)
    pos = t * (len(_VIRIDIS) - 1)
    i = min(int(pos), len(_VIRIDIS) - 2)
    f = pos - i
    a, b = _VIRIDIS[i], _VIRIDIS[i + 1]
    return tuple(round(a[k] + (b[k] - a[k]) * f) for k in range(3))


def render_heatmap(
    grid: list[list[float]],
    vmin: float | None = None,
    vmax: float | None = None,
    cell_px: int = 4,
) -> bytes:
    """Dense row-major grid (rows = y, cols = x; None/NaN = gap) →
    viridis heatmap PNG, each cell ``cell_px`` square. Returns PNG
    bytes (decode_png_pixels round-trips it)."""
    import numpy as np

    a = np.array(grid, dtype=np.float64)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("render_heatmap needs a non-empty 2-D grid")
    finite = a[np.isfinite(a)]
    lo = vmin if vmin is not None else (float(finite.min()) if finite.size else 0.0)
    hi = vmax if vmax is not None else (float(finite.max()) if finite.size else 1.0)
    span = hi - lo if hi > lo else 1.0
    ny, nx = a.shape
    rgb = np.empty((ny, nx, 3), dtype=np.uint8)
    for y in range(ny):
        for x in range(nx):
            rgb[y, x] = colormap_rgb((a[y, x] - lo) / span)
    img = np.repeat(np.repeat(rgb, cell_px, axis=0), cell_px, axis=1)
    from .multimodal import encode_png

    return encode_png(nx * cell_px, ny * cell_px, img.tobytes())


def render_track(
    series: list[tuple[float, float]],
    width: int = 640,
    height: int = 240,
    marks: list[tuple[float, float]] | None = None,
    invert_y: bool = False,
) -> bytes:
    """Time-series panel: polyline of (x, y) samples plus optional 1-px
    scatter marks, white background, black line, viridis-blue marks —
    the pitch/pressure diagnostic shape. ``invert_y`` mirrors the
    reference's ``gca().invert_yaxis()`` for depth/pressure axes."""
    import numpy as np

    pts = [(x, y) for x, y in series if x == x and y == y]
    if not pts:
        raise ValueError("render_track needs at least one finite sample")
    all_pts = pts + [(x, y) for x, y in (marks or []) if x == x and y == y]
    xs = [p[0] for p in all_pts]
    ys = [p[1] for p in all_pts]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    xs_span = (x1 - x0) or 1.0
    ys_span = (y1 - y0) or 1.0

    def to_px(x: float, y: float) -> tuple[int, int]:
        px = round((x - x0) / xs_span * (width - 1))
        py = round((y - y0) / ys_span * (height - 1))
        if not invert_y:
            py = height - 1 - py
        return px, py

    img = np.full((height, width, 3), 255, dtype=np.uint8)
    prev = None
    for x, y in pts:
        cx, cy = to_px(x, y)
        if prev is not None:  # Bresenham segment
            px, py = prev
            dx, dy = abs(cx - px), -abs(cy - py)
            sx, sy = (1 if px < cx else -1), (1 if py < cy else -1)
            err = dx + dy
            while True:
                img[py, px] = (0, 0, 0)
                if (px, py) == (cx, cy):
                    break
                e2 = 2 * err
                if e2 >= dy:
                    err += dy
                    px += sx
                if e2 <= dx:
                    err += dx
                    py += sy
        else:
            img[cy, cx] = (0, 0, 0)
        prev = (cx, cy)
    for x, y in marks or []:
        if x == x and y == y:
            cx, cy = to_px(x, y)
            img[cy, cx] = (49, 104, 142)  # viridis blue
    from .multimodal import encode_png

    return encode_png(width, height, img.tobytes())


def heatmap_sink(
    df: DataFrame,
    x_col: str,
    y_col: str,
    value_col: str,
    plot_dir: str | None = None,
    plot_name: str = "panel",
    vmin: float | None = None,
    vmax: float | None = None,
    cell_px: int = 4,
    max_cells: int = 2_000_000,
) -> bytes:
    """The S7 sink: long-format gridded field (x, y, value — the grid2d
    output shape) → viridis heatmap PNG, optionally saved as
    ``{plot_dir}/{plot_name}.png`` (the reference's save_plot naming,
    process_adcp.py:53-56). Missing (x, y) cells render as gaps.

    Driver boundary, gated: a cheap distinct-cell count runs FIRST and
    anything above ``max_cells`` raises — plot your grid, not your
    corpus; downsample (LTTB / coarser bins) upstream."""
    n = df.select(x_col, y_col).distinct().count()
    if n > max_cells:
        raise ValueError(
            f"heatmap_sink: {n} grid cells exceeds max_cells={max_cells} — "
            "plots are driver-side; downsample or re-grid upstream"
        )
    rows = df.select(x_col, y_col, value_col).collect()
    xs = sorted({r[0] for r in rows})
    ys = sorted({r[1] for r in rows})
    xi = {v: i for i, v in enumerate(xs)}
    yi = {v: i for i, v in enumerate(ys)}
    grid = [[float("nan")] * len(xs) for _ in ys]
    for x, y, v in rows:
        grid[yi[y]][xi[x]] = float("nan") if v is None else float(v)
    png = render_heatmap(grid, vmin=vmin, vmax=vmax, cell_px=cell_px)
    if plot_dir:
        save_plot(plot_dir, plot_name, png)
    return png


def save_plot(plot_dir: str, plot_name: str, png: bytes) -> str:
    """Mirror of the reference's save_plot: ensure the directory, write
    ``{plot_name}.png``, return the path."""
    os.makedirs(plot_dir, exist_ok=True)
    path = os.path.join(plot_dir, f"{plot_name}.png")
    with open(path, "wb") as fh:
        fh.write(png)
    return path
