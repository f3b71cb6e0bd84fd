"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (grid2d 2-D binned aggregation, the
reference's most-used operator) at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, implemented in ``seaexplorertools_spark/contract.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from seaexplorertools_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grid2d binned multi-aggregate over lineitem at sf0.001
    (reference grid2d, process_adcp.py:117-134 — the core operator)."""
    return contract.QUERIES["a1_grid2d_mean"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLES)
