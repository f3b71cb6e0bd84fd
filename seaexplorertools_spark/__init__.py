"""seaexplorertools_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of bastienqueste/SeaExplorerTools.

The reference (`/root/reference/seaexplorertools/process_adcp.py`) is a
single-process pandas/xarray dataflow; this package re-expresses every
operator Spark-first: declarative DataFrame lineage, Catalyst-optimized,
pandas-UDF only where built-ins cannot express the semantics
(per-ping regrid, gsw thermodynamics).

Layout
------
- ``session``   : SparkSession factory (UTC, Arrow, AQE).
- ``model``     : long-format schemas for glider / adcp / adcp_bt / gridded.
- ``operators`` : engine primitives — 2-D binned agg (grid2d), interp/as-of
                  joins, window kit, QC masking, per-ping regrid, dedup,
                  similarity search, text analysis, multimodal plumbing.
- ``functions`` : scalar expression library (beam geometry, rotations,
                  Francois–Garrison, geodesy, epoch conversions, gsw UDFs).
- ``sources``   : parquet readers + NetCDF→Parquet ingestion (gated import).
- ``pipeline``  : the reference's three entry points recomposed from the
                  operators (shear_from_adcp / grid_shear /
                  velocity_from_shear parity).
"""

__version__ = "0.1.0"
