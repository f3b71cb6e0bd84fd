"""Hilbert-curve clustering keys — the locality-superior alternative to
Z-order for data-skipping layout (public xy2d algorithm; the curve behind
"Hilbert clustering" in modern lakehouse optimizers).

Morton interleaving has locality "seams": consecutive keys can jump across
half the domain (e.g. 0b0111→0b1000 crosses the midline in both dims).
The Hilbert curve's defining property is UNIT-STEP locality — every pair
of consecutive keys is adjacent in space (Manhattan distance exactly 1) —
so equal key ranges cut tighter bounding boxes, i.e. better file-level
min/max pruning for the same file count.

The classic xy2d loop (one reflection/swap level per bit, d accumulating
s²·((3·rx) XOR ry)) is data-dependent per level, so it's built here as a
STAGED column chain — one projection per bit level. Staging matters:
inlining each level's CASE expressions into the next multiplies the
expression tree ~4× per level (4^bits nodes by level 8); as staged
columns, Catalyst's CollapseProject keeps the non-cheap conditionals
materialized and the plan stays linear in ``bits``. Everything is integer
arithmetic — for n = 2^bits the reflection n−1−x is borrow-free (bitwise
complement), so the whole chain is reproducible bit-identically in any
engine (the DuckDB oracle runs the same per-level CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_hilbert_key(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "hkey",
) -> DataFrame:
    """Append the Hilbert d-index of the (x, y) cell — inputs must already
    be quantized to [0, 2^bits) (see zorder.quantize). One staged
    projection per bit level; the temporaries are dropped."""
    n = 1 << bits
    out = df.withColumns(
        {
            "__hx": F.col(x_col).cast("long"),
            "__hy": F.col(y_col).cast("long"),
            "__hd": F.lit(0).cast("long"),
        }
    )
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        rx = F.when(F.col("__hx").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        ry = F.when(F.col("__hy").bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(
            F.lit(0)
        )
        refl_x = F.when(rx == 1, F.lit(n - 1) - F.col("__hx")).otherwise(
            F.col("__hx")
        )
        refl_y = F.when(rx == 1, F.lit(n - 1) - F.col("__hy")).otherwise(
            F.col("__hy")
        )
        out = out.withColumns(
            {
                "__hd": F.col("__hd")
                + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry),
                # rot: when ry==0, reflect (if rx) then swap; else unchanged
                "__hx": F.when(ry == 0, refl_y).otherwise(F.col("__hx")),
                "__hy": F.when(ry == 0, refl_x).otherwise(F.col("__hy")),
            }
        )
    return out.withColumn(out_col, F.col("__hd")).drop("__hx", "__hy", "__hd")


def hilbert_oracle_ctes(base_cte: str, bits: int = 8, keep_cols: str = "") -> str:
    """DuckDB replay: one CTE per bit level running the IDENTICAL integer
    chain (xor(), borrow-free reflection). ``base_cte`` must yield columns
    hx, hy (quantized), hd (0) plus ``keep_cols``."""
    n = 1 << bits
    extra = f", {keep_cols}" if keep_cols else ""
    parts = [f"l{bits} AS ({base_cte})"]
    for level in range(bits - 1, -1, -1):
        s = 1 << level
        prev = f"l{level + 1}"
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        refl_x = f"(CASE WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END)"
        refl_y = f"(CASE WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END)"
        parts.append(
            f"""l{level} AS (
      SELECT hd + {s * s} * xor(3 * {rx}, {ry}) AS hd,
             CASE WHEN {ry} = 0 THEN {refl_y} ELSE hx END AS hx,
             CASE WHEN {ry} = 0 THEN {refl_x} ELSE hy END AS hy{extra}
      FROM {prev}
    )"""
        )
    return ",\n    ".join(parts)


def xy2d_reference(bits: int, x: int, y: int) -> int:
    """Pure-python replay of the same algorithm (tests compare the
    distributed chain against this and against the curve's defining
    unit-step property)."""
    n = 1 << bits
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d
