"""2-D binned aggregation — the reference's core ``grid2d`` operator.

Reference: ``seaexplorertools/process_adcp.py:117-134`` (``grid2d``): bucket
``x`` into ``xi`` edges and ``y`` into ``yi`` edges via ``pd.cut``, group by
the two bin indices, aggregate with a pluggable function, then densify into
a NaN-filled matrix. ~20 call sites (e.g. ``:572-576``, ``:1196-1200``,
``:1670-1703``, ``:1820-1851``).

Spark-first design
------------------
The bucketing is a pair of ``floor`` expressions (whole-stage codegen, no
UDF), the grouping is ONE shuffle keyed ``(xbin, ybin)``, and *all* variables
are aggregated in the same ``groupBy`` (the reference re-buckets per
variable; at 100 TB re-bucketing 10× would be 10 shuffles — here it is one).
Densification to a full matrix is a presentation step (cross-join of the two
axis ranges + left join) applied only at a sink/collect boundary, never
mid-pipeline.

Scale notes
-----------
- ``groupBy(xbin, ybin)`` does a partial (map-side) aggregate before the
  shuffle for all built-in aggs, so shuffle volume is ~|grid cells| per task,
  not |rows|.
- The grid axes are low-cardinality (profiles × depth bins); skew is only
  possible if one cell dominates — AQE skew-join handling is irrelevant here
  (no join), and partial aggregation already collapses hot cells map-side.
- ``fn`` accepts any expression factory (``F.avg``, ``F.median``, ...) —
  mediAn is exact (Spark >= 3.4 ``median``), matching a DuckDB oracle; never
  ``percentile_approx`` in correctness paths.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import consistency_cache


def bucket(col: Column | str, origin: float, width: float, closed: str = "left") -> Column:
    """Uniform bin index for ``col``; ``floor((x - origin)/width)``.

    ``closed='left'`` gives [a, b) bins (matches ``np.digitize`` default);
    ``closed='right'`` gives (a, b] (matches the reference's ``pd.cut``,
    process_adcp.py:123-124). NULL in → NULL out (row lands in no bin and is
    dropped by the groupBy, like NaN under pd.cut).
    """
    c = F.col(col) if isinstance(col, str) else col
    pos = (c - F.lit(float(origin))) / F.lit(float(width))
    if closed == "left":
        return F.floor(pos).cast("long")
    # right-closed: ceil(pos) - 1, with exact-edge x == origin falling in bin -1's
    # successor like pd.cut's first edge exclusion
    return (F.ceil(pos) - F.lit(1)).cast("long")


def binned_agg_2d(
    df: DataFrame,
    x: Column | str,
    y: Column | str,
    aggs: dict[str, Column],
    x_origin: float,
    x_width: float,
    y_origin: float,
    y_width: float,
    closed: str = "left",
    xbin_name: str = "xbin",
    ybin_name: str = "ybin",
) -> DataFrame:
    """grid2d as one shuffle: bucket both axes, groupBy, multi-aggregate.

    ``aggs`` maps output column name -> aggregate Column (already aliased by
    the dict key here). Example::

        binned_agg_2d(lineitem, "l_quantity", "l_extendedprice",
                      {"avg_disc": F.avg("l_discount"), "n": F.count("*")},
                      0, 5, 0, 10000)
    """
    xb = bucket(x, x_origin, x_width, closed).alias(xbin_name)
    yb = bucket(y, y_origin, y_width, closed).alias(ybin_name)
    out = df.groupBy(xb, yb).agg(*[c.alias(n) for n, c in aggs.items()])
    return out


def densify(
    grid: DataFrame,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    xbin_name: str = "xbin",
    ybin_name: str = "ybin",
) -> DataFrame:
    """Fill missing (xbin, ybin) cells with NULL rows — presentation step.

    Reference scatters into a NaN-filled matrix (process_adcp.py:125-131).
    Only call at a sink; mid-pipeline the sparse long format is the right
    representation (a 100 TB grid densified mid-plan would materialize
    mostly-empty cells).
    """
    spark = grid.sparkSession
    axes = (
        spark.range(x_range[0], x_range[1] + 1)
        .withColumnRenamed("id", xbin_name)
        .crossJoin(spark.range(y_range[0], y_range[1] + 1).withColumnRenamed("id", ybin_name))
    )
    return axes.join(grid, [xbin_name, ybin_name], "left")


def histogram(
    df: DataFrame,
    col: Column | str,
    lo: float,
    hi: float,
    nbins: int,
    density: bool = True,
    bin_name: str = "bin",
    count_name: str = "n",
    density_name: str = "pdf",
) -> DataFrame:
    """1-D histogram (reference ``verify_depth_bias`` np.histogram,
    process_adcp.py:1884-1896). Matches np.histogram's range semantics:
    values outside [lo, hi] are dropped, and the LAST bin is right-CLOSED —
    c == hi lands in bin nbins-1, not out of range; density normalizes by
    total*binwidth.
    """
    width = (hi - lo) / nbins
    c = F.col(col) if isinstance(col, str) else col
    b = F.least(bucket(c, lo, width), F.lit(nbins - 1).cast("long")).alias(bin_name)
    counts = (
        df.filter(c.isNotNull() & (c >= lo) & (c <= hi))
        .groupBy(b)
        .agg(F.count("*").alias(count_name))
    )
    if not density:
        return counts
    # total rides a 1-row broadcast (windowless — the counts table is ≤
    # nbins rows; cached because it feeds the total AND the output)
    counts = consistency_cache(counts)
    tot = counts.agg(F.sum(count_name).alias("__t")).withColumn("__k", F.lit(1))
    return (
        counts.withColumn("__k", F.lit(1))
        .join(F.broadcast(tot), "__k")
        .withColumn(
            density_name,
            (
                F.col(count_name)
                / F.nullif(F.col("__t").cast("double") * F.lit(width), F.lit(0.0))
            ).cast("double"),
        )
        .drop("__k", "__t")
    )


GroupAgg = Callable[[Column], Column]
