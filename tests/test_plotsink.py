"""S7 plot sink (operators/plotsink.py): exact colormap endpoints,
pixel-exact heatmap rendering through the real PNG codec, polyline
tracks, the save_plot side-effect, and the driver-boundary gate."""

from __future__ import annotations

import math

import numpy as np
import pytest

from seaexplorertools_spark.operators.multimodal import decode_png_pixels
from seaexplorertools_spark.operators.plotsink import (
    colormap_rgb,
    colormap_rgb_array,
    draw_text,
    format_tick,
    heatmap_sink,
    render_heatmap,
    render_track,
    save_plot,
)


def test_colormap_endpoints_and_nan():
    assert colormap_rgb(0.0) == (68, 1, 84)
    assert colormap_rgb(1.0) == (253, 231, 37)
    assert colormap_rgb(-5.0) == (68, 1, 84)  # clamped
    assert colormap_rgb(float("nan")) == (160, 160, 160)


def test_render_heatmap_exact_pixels():
    png = render_heatmap([[0.0, 1.0], [float("nan"), 0.5]], cell_px=2)
    w, h, ch, px = decode_png_pixels(png)
    assert (w, h, ch) == (4, 4, 3)
    a = np.frombuffer(px, np.uint8).reshape(4, 4, 3)
    assert tuple(a[0, 0]) == (68, 1, 84)        # vmin
    assert tuple(a[0, 2]) == (253, 231, 37)     # vmax
    assert tuple(a[2, 0]) == (160, 160, 160)    # NaN gap
    assert tuple(a[2, 2]) == colormap_rgb(0.5)  # midpoint
    assert tuple(a[1, 1]) == (68, 1, 84)        # cell_px upscale


def test_colormap_array_matches_scalar():
    """The vectorized np.interp path must be pixel-identical to the
    scalar anchor-walk at every representable t, including the
    half-to-even rounding ties."""
    ts = np.concatenate([np.linspace(-0.2, 1.2, 4001), [np.nan]])
    arr = colormap_rgb_array(ts)
    for t, rgb in zip(ts, arr):
        assert tuple(rgb) == colormap_rgb(float(t))


def test_draw_text_rendered_digit_pixels():
    """Exact glyph bitmap for '0' and '-': the tick labels are real
    pixels, not metadata."""
    img = np.full((7, 12, 3), 255, np.uint8)
    draw_text(img, 1, 1, "-0")
    black = np.all(img == 0, axis=2)
    # '-' at x=1..3: only the middle row lit
    assert black[3, 1] and black[3, 2] and black[3, 3]
    assert not black[1, 1] and not black[5, 1]
    # '0' at x=5..7: ring shape — corners lit, center hollow
    assert black[1, 5] and black[1, 7] and black[5, 5] and black[5, 7]
    assert black[3, 5] and black[3, 7] and not black[3, 6]
    # clipping never throws
    draw_text(img, 10, 5, "888")


def test_format_tick_font_coverage():
    for v in (0.0, -1.5, 3.25e-7, 12345.678, float("inf")):
        for ch in format_tick(v):
            assert ch in "0123456789-+.e infa"  # inf renders via known chars
    assert format_tick(float("nan")) == ""


def test_render_heatmap_axes_margins():
    png = render_heatmap(
        [[0.0, 1.0], [0.5, 0.25]], cell_px=8, axes=True,
        x_range=(0.0, 10.0), y_range=(5.0, 45.0),
    )
    w, h, ch, px = decode_png_pixels(png)
    # margins: top 8 + grid 16 + bottom 8; left label margin + grid 16 + 2
    assert h == 32 and w > 18
    a = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    # header row contains black glyph pixels (the value-range label)
    assert np.any(np.all(a[:8] == 0, axis=2))
    # bottom margin contains the x tick labels
    assert np.any(np.all(a[24:] == 0, axis=2))


def test_axes_panel_has_colorbar_legend():
    png = render_heatmap(
        [[0.0, 1.0], [0.5, 0.25]], cell_px=8, axes=True,
        x_range=(0.0, 10.0), y_range=(5.0, 45.0),
    )
    w, h, ch, px = decode_png_pixels(png)
    a = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    # colorbar strip sits right of the grid: vmax color on top,
    # vmin color at the bottom
    bar_x = w - 12 + 5  # 10px strip + 2px right margin, probe mid-strip
    assert tuple(a[8, bar_x]) == (253, 231, 37)
    assert tuple(a[8 + 15, bar_x]) == (68, 1, 84)


def test_render_track_line_and_marks():
    png = render_track([(0, 0), (9, 9)], width=10, height=10,
                       marks=[(0, 9)])
    w, h, ch, px = decode_png_pixels(png)
    a = np.frombuffer(px, np.uint8).reshape(10, 10, 3)
    # diagonal from bottom-left to top-right (y up), black
    assert tuple(a[9, 0]) == (0, 0, 0) and tuple(a[0, 9]) == (0, 0, 0)
    assert tuple(a[0, 0]) == (49, 104, 142)  # mark at (x=0, y=9), y-up
    # invert_y flips the vertical axis (pressure/depth panels)
    png = render_track([(0, 0), (9, 9)], width=10, height=10, invert_y=True)
    a = np.frombuffer(decode_png_pixels(png)[3], np.uint8).reshape(10, 10, 3)
    assert tuple(a[0, 0]) == (0, 0, 0) and tuple(a[9, 9]) == (0, 0, 0)
    with pytest.raises(ValueError):
        render_track([(float("nan"), 1.0)])


def test_heatmap_sink_distributed_and_gate(spark, tmp_path):
    rows = [(x, y, float(x * 3 + y)) for x in range(3) for y in range(4)]
    rows.remove((1, 1, 4.0))  # a missing cell renders as a gap
    df = spark.createDataFrame(rows, "px int, bin int, shear double")
    png = heatmap_sink(
        df, "px", "bin", "shear", plot_dir=str(tmp_path), plot_name="shear_grid",
        cell_px=1,
    )
    w, h, ch, px = decode_png_pixels(png)
    assert (w, h) == (3, 4)
    a = np.frombuffer(px, np.uint8).reshape(4, 3, 3)
    assert tuple(a[0, 0]) == (68, 1, 84)        # min value cell
    assert tuple(a[3, 2]) == (253, 231, 37)     # max value cell
    assert tuple(a[1, 1]) == (160, 160, 160)    # the removed cell
    saved = tmp_path / "shear_grid.png"
    assert saved.exists() and saved.read_bytes() == png

    with pytest.raises(ValueError, match="max_cells"):
        heatmap_sink(df, "px", "bin", "shear", max_cells=5)


def test_heatmap_sink_dense_gate_and_cell_dedup(spark):
    """The gate counts the DENSE grid (distinct-x × distinct-y), not
    distinct pairs — a sparse diagonal must still trip it — and
    duplicated (x, y) cells are averaged engine-side."""
    diag = spark.createDataFrame(
        [(i, i, 1.0) for i in range(40)], "px int, bin int, v double"
    )
    with pytest.raises(ValueError, match="max_cells"):
        # 40 distinct pairs, but the dense grid is 40×40 = 1600 cells
        heatmap_sink(diag, "px", "bin", "v", max_cells=1000)

    dup = spark.createDataFrame(
        [(0, 0, 0.0), (0, 0, 1.0), (1, 0, 1.0), (0, 1, 0.25), (1, 1, 0.75)],
        "px int, bin int, v double",
    )
    png = heatmap_sink(dup, "px", "bin", "v", cell_px=1)
    a = np.frombuffer(decode_png_pixels(png)[3], np.uint8).reshape(2, 2, 3)
    # cell values after per-cell avg: (0,0)=0.5, (1,0)=1.0, (0,1)=0.25,
    # (1,1)=0.75 → lo=0.25, hi=1.0 → t(0,0) = 1/3
    assert tuple(a[0, 0]) == colormap_rgb((0.5 - 0.25) / 0.75)
    assert tuple(a[0, 1]) == colormap_rgb(1.0)  # (px=1, bin=0)
    assert tuple(a[1, 0]) == colormap_rgb(0.0)  # (px=0, bin=1)


def test_heatmap_sink_axes_smoke(spark, tmp_path):
    rows = [(x, y, float(x + y)) for x in range(5) for y in range(6)]
    df = spark.createDataFrame(rows, "px int, bin int, v double")
    png = heatmap_sink(
        df, "px", "bin", "v", plot_dir=str(tmp_path), plot_name="axes_panel",
        cell_px=3, axes=True,
    )
    w, h, ch, px = decode_png_pixels(png)
    a = np.frombuffer(px, np.uint8).reshape(h, w, 3)
    assert np.any(np.all(a == 0, axis=2))  # glyph pixels present
    assert (tmp_path / "axes_panel.png").exists()


def test_mission_gridded_panel_smoke(spark):
    """The reference composition: grid2d output → heatmap panel."""
    from seaexplorertools_spark import contract

    g = contract.QUERIES["a1_grid2d_mean"](spark, "/root/testdata/sf0.001")
    cols = g.columns
    png = heatmap_sink(g, cols[0], cols[1], cols[2], cell_px=1)
    w, h, ch, _ = decode_png_pixels(png)
    assert w > 0 and h > 0 and ch == 3
