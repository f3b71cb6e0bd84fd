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


def test_mission_gridded_panel_smoke(spark):
    """The reference composition: grid2d output → heatmap panel."""
    from seaexplorertools_spark import contract

    g = contract.QUERIES["a1_grid2d_mean"](spark, "/root/testdata/sf0.001")
    cols = g.columns
    png = heatmap_sink(g, cols[0], cols[1], cols[2], cell_px=1)
    w, h, ch, _ = decode_png_pixels(png)
    assert w > 0 and h > 0 and ch == 3
