"""Bloom-filter semi-join pruning — the runtime-filter pattern for the
dominant 100 TB join shape (huge fact ⋈ selectively-filtered dim).

The dim side's join keys are summarized into an m-bit Bloom filter by
one distributed aggregation; the bitmap (KBs–MBs, sized by key count,
never by data volume) comes back to the driver as BOUNDED metadata
(the z-order-bounds collect class) and is embedded as a hex-string
literal, so the probe is a pure row-local scan predicate built from
JVM built-ins (xxhash64 / conv / substr / bit ops) — no UDF, no join,
no shuffle.  Fact rows that cannot match are dropped inside their scan
stage BEFORE the join exchange: with a 20%-selective dim and ~3% false
positives the shuffle moves ~4× fewer fact bytes, which at 100 TB is
the difference between a network-bound and a scan-bound job.

Bloom filters have NO false negatives by construction, so the exact
join downstream returns precisely the unpruned result — the catalog
entry's driver hash against a plain-join DuckDB oracle certifies that
end to end.  Spark's own runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.enabled) injects the same
shape automatically but only above size thresholds and only inside one
query; this explicit operator also serves the cases the optimizer
can't see — a filter REUSED across queries, or built from a different
table than the one being joined.

Reference parity: the reference has no runtime filters; this is part
of the beyond-reference scale surface (SURVEY.md §7.2).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hashes(key: Column, m: int, k: int) -> list[Column]:
    """k double-hashed bit positions (Kirsch–Mitzenmacher): pos_i =
    (xxhash64(key) + i * stride) mod m with an odd murmur-based
    stride.  Signed-overflow wrap is deterministic and identical
    between build and probe (both evaluate in Spark), which is all a
    Bloom filter needs."""
    h1 = F.xxhash64(key)
    stride = F.abs(F.hash(key).cast("long")) * F.lit(2) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * stride, F.lit(m)) for i in range(k)]


def build_bloom_hex(
    keys: DataFrame, key_col: str, bits_per_key: int = 8, k: int = 3
) -> tuple[str, int, int]:
    """Aggregate ``keys[key_col]`` into a Bloom bitmap; returns
    ``(hex_bitmap, m_bits, k)``.

    m is the next power of two above bits_per_key × |keys| (floor 512
    bits), so the driver-side collect is ≤ m/8 bytes of metadata —
    bounded by the KEY CARDINALITY the caller chose to summarize,
    independent of fact volume.  The aggregation is one shuffle of
    (byte_idx, bit) pairs with map-side bit_or combining."""
    n = keys.select(key_col).distinct().count()
    m = 1 << max(9, math.ceil(math.log2(max(1, n) * bits_per_key)))
    exploded = keys.select(
        F.col(key_col).alias("k"),
        F.explode(F.array(*_hashes(F.col(key_col), m, k))).alias("pos"),
    )
    # 1 << (pos % 8) via an 8-entry array literal: the PySpark
    # shiftleft wrapper only takes a literal shift amount
    bit_table = F.lit([1, 2, 4, 8, 16, 32, 64, 128])
    rows = (
        exploded.select(
            (F.col("pos") / 8).cast("int").alias("byte_idx"),
            F.element_at(
                bit_table, (F.col("pos") % 8).cast("int") + 1
            ).alias("bit"),
        )
        .groupBy("byte_idx")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    buf = bytearray(m // 8)
    for r in rows:
        buf[r["byte_idx"]] = r["bits"]
    return buf.hex(), m, k


def bloom_might_contain(hex_bitmap: str, m: int, k: int, key: Column) -> Column:
    """Row-local membership predicate over the hex-encoded bitmap —
    true if ``key`` MIGHT be in the summarized set (false positives
    possible, false negatives impossible).  Pure built-in expressions
    (substr into the literal + conv(hex) + shift/mask), so it runs
    inside whole-stage codegen in the fact table's scan stage."""
    lit = F.lit(hex_bitmap)
    cond = F.lit(True)
    for pos in _hashes(key, m, k):
        byte_hex = lit.substr(
            ((pos / 8).cast("int") * 2 + 1).cast("int"), F.lit(2)
        )
        byte_val = F.conv(byte_hex, 16, 10).cast("long")
        cond = cond & (F.bit_get(byte_val, (pos % 8).cast("int")) == 1)
    return cond
