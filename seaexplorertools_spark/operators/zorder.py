"""Z-order (Morton) clustering keys — multi-dimensional sort keys for
data-skipping layout (engine addition; the public technique behind
Delta/Iceberg OPTIMIZE ZORDER BY and the classic Morton curve).

Sorting 100 TB by one column gives perfect file-level min/max pruning on
that column and none on any other. Interleaving the bits of several
quantized columns into one key and sorting by THAT bounds every
participating dimension within each file: a curve key's high bits fix a
hyper-rectangle, so each of the 2^p leading-bit buckets spans only
1/2^(p/dims) of every dimension's domain — scan pruning works for
predicates on any of them.

Everything is integer arithmetic (bit spread via shift/mask chains, exact
quantization via integer division) — whole-stage-codegen expressions,
reproducible bit-identically in any engine (the DuckDB oracle runs the
same chain), no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shift/mask chain that spreads the low 16 bits of x to even bit
# positions (Morton spread): classic public "interleave by magic masks"
_SPREAD16 = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread16(c: Column) -> Column:
    """x_15..x_0 → x_15 0 x_14 0 ... x_0 (32-bit result, even positions)."""
    out = c.cast("long")
    for sh, mask in _SPREAD16:
        out = (out.bitwiseOR(F.shiftleft(out, sh))).bitwiseAND(F.lit(mask))
    return out


def spread16_sql(expr: str) -> str:
    """The identical chain as engine-portable SQL (DuckDB oracle)."""
    out = f"CAST({expr} AS BIGINT)"
    for sh, mask in _SPREAD16:
        out = f"(({out} | ({out} << {sh})) & {mask})"
    return out


def quantize(expr: str, lo: int, hi: int, bits: int = 16) -> Column:
    """Map an integer column expression with known domain [lo, hi] to
    [0, 2^bits) by exact integer division — no float rounding to drift
    across engines."""
    return F.expr(f"((({expr}) - {lo}L) * {1 << bits}L) div ({hi} - {lo} + 1)")


def quantize_sql(expr: str, lo: int, hi: int, bits: int = 16) -> str:
    return f"((({expr}) - {lo}) * {1 << bits} // ({hi} - {lo} + 1))"


def zorder_key2(x: Column, y: Column) -> Column:
    """Interleave two 16-bit quantized columns into one 32-bit Morton
    key; sort (or range-partition) by it to cluster both dimensions."""
    return spread16(x).bitwiseOR(F.shiftleft(spread16(y), 1))


def zorder_key2_sql(x: str, y: str) -> str:
    return f"({spread16_sql(x)} | ({spread16_sql(y)} << 1))"
