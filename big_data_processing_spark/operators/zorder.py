"""Z-order (Morton) clustering key — multi-column data-skipping layout.

Single-column range clustering (``txn_optimize(cluster=True)``) makes
file min/max ranges disjoint on ONE column; queries filtering any other
column still scan everything.  The standard multi-column remedy (Delta
``OPTIMIZE ZORDER BY``, Iceberg ``sort_order z-order``) sorts rows by
the MORTON CODE of the filter columns: normalize each column to a
fixed-width unsigned integer, then interleave the bits.  Points close
on the Z-curve are close in EVERY dimension, so files cut from a
Z-sorted stream have small bounding boxes in all clustered columns at
once and a box predicate prunes to ~the files its box touches.

Everything here is a pure Column expression (shifts/masks/ors — JVM
codegen, no UDF).  Normalization bounds come from one metadata-scale
min/max aggregate; rows outside the recorded bounds (possible only if
the table changed between planning and execution) clamp to the edge
bucket, which affects layout quality, never correctness.

Reference shape: Morton 1966; Delta's OPTIMIZE ZORDER.  No counterpart
in the reference repo (beyond-reference scale feature).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Preferred bits/column: 65536 buckets per dimension — far finer than
# any realistic file count.  When the interleave would overflow a
# signed long (> 62 usable bits: 16 x 4 cols = 64), the DEFAULT is
# clamped to 62 // n_cols (15 bits for 4 columns); an EXPLICIT bits
# argument that overflows still raises.
DEFAULT_BITS = 16


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """``col`` min/max-normalized to an integer in [0, 2^bits)."""
    span = hi - lo
    top = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = ((col.cast("double") - F.lit(float(lo))) / F.lit(float(span))) * top
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top))


def zorder_key(
    df: DataFrame, cols: list[str], bits: int | None = None
) -> Column:
    """Morton-code Column over ``cols`` (2-4 numeric columns).

    Runs ONE min/max aggregate over ``df`` to fix the normalization
    bounds (metadata-scale: 2 x len(cols) scalars), then builds the
    bit-interleave as a closed-form expression: bit b of column i lands
    at position b * n_cols + (n_cols - 1 - i), so higher-order bits of
    all columns lead the key together — the Z-curve property.

    ``bits=None`` picks min(DEFAULT_BITS, 62 // n_cols) so every legal
    column count works out of the box; an explicit ``bits`` that
    overflows a long raises."""
    n = len(cols)
    if not 2 <= n <= 4:
        raise ValueError("zorder_key wants 2-4 columns")
    if bits is None:
        bits = min(DEFAULT_BITS, 62 // n)
    if bits * n > 62:
        raise ValueError(f"bits={bits} x {n} cols overflows a long")
    row = df.agg(
        *[F.min(c).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = row[f"mn_{i}"], row[f"mx_{i}"]
        if lo is None:
            continue  # all-NULL column contributes nothing
        s = _scaled(F.coalesce(F.col(c), F.lit(lo)), float(lo), float(hi), bits)
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(s, b).bitwiseAND(F.lit(1)),
                    b * n + (n - 1 - i),
                )
            )
    return key
