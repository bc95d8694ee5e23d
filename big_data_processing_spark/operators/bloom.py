"""Bloom-filter semi-join pruning — the runtime-filter pattern for the
dominant 100 TB join shape (huge fact ⋈ selectively-filtered dim).

The dim side's join keys are summarized into an m-bit Bloom filter by
one distributed aggregation; the bitmap (KBs–MBs, sized by key count,
never by data volume) comes back to the driver as BOUNDED metadata
(the z-order-bounds collect class) and is embedded as an array<long>
literal, so the probe is a pure row-local scan predicate built from
JVM built-ins (xxhash64 / element_at / bit_get) — no UDF, no join, no
shuffle.  Fact rows that cannot match are dropped inside their scan
stage BEFORE the join exchange: with a 20%-selective dim and ~3% false
positives the shuffle moves ~4× fewer fact bytes, which at 100 TB is
the difference between a network-bound and a scan-bound job.

Representation matters: the bitmap is 64-bit WORDS in an array
literal, probed with O(1) element_at + bit_get.  The first cut encoded
it as a hex STRING probed with substr — and UTF8String.substring is
a byte SCAN (variable-width chars), so every probe walked the whole
64 KB literal: ~100 s for 600 k rows at sf0.1 vs ~1 s for the word
array.  Literal size is not literal cost; per-row access must be O(1).

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

# 1 << b for b in 0..63 as SIGNED longs (bit 63 wraps negative):
# the PySpark shiftleft wrapper only takes literal shift amounts, so
# per-row shifts go through an element_at lookup into this table.
_BIT_TABLE = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def _hashes(key: Column, m: int, k: int) -> list[Column]:
    """k double-hashed bit positions (Kirsch–Mitzenmacher): pos_i =
    (h1 + i * stride) mod m with an odd murmur-based stride.

    Both h1 and the stride are reduced mod m BEFORE the multiply-add,
    so every intermediate stays below 3m and the expression is safe
    under spark.sql.ansi.enabled=true (the first cut let h1 + i*stride
    wrap in signed 64-bit — deterministic in non-ANSI sessions but an
    ARITHMETIC_OVERFLOW throw in ANSI ones).  m is a power of two, so
    `pmod(2*|hash|, m) + 1` keeps the stride odd (full period) and
    still < m."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m))
    stride = F.pmod(
        F.abs(F.hash(key).cast("long")) * F.lit(2), F.lit(m)
    ) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * stride, F.lit(m)) for i in range(k)]


def build_bloom_words(
    keys: DataFrame,
    key_col: str,
    bits_per_key: int = 8,
    k: int = 3,
    n_keys: int | None = None,
) -> tuple[list[int], int, int]:
    """Aggregate ``keys[key_col]`` into a Bloom bitmap; returns
    ``(words, m_bits, k)`` where words is the m/64-long signed-word
    list.

    m is the next power of two above bits_per_key × |keys| (floor 512
    bits) — |keys| taken as a plain count, which over-sizes m when the
    column carries duplicates and that is safe.  The driver-side
    collect is ≤ m/64 longs of metadata, bounded by the KEY CARDINALITY
    the caller chose to summarize, independent of fact volume.  The
    aggregation is one shuffle of (word_idx, bit) pairs with map-side
    bit_or combining.

    ``n_keys`` (r14, guide §1.2 — don't compute things you throw
    away): an UPPER BOUND on the key count supplied by the caller —
    typically the unfiltered table row count from parquet footer /
    table-format manifest metadata — replaces the per-run ``count()``
    job that otherwise exists only to size m.  Any bound ≥ the true
    count only lowers the false-positive rate; a bound BELOW the true
    count only raises it — membership answers stay correct either way
    (false negatives are impossible by construction), so downstream
    exact joins are unaffected.  At 100 TB the count() this replaces
    is a full scan+aggregate of the dim table per query; the metadata
    read is O(files) driver-side work the planner already pays."""
    n = keys.count() if n_keys is None else n_keys
    m = 1 << max(9, math.ceil(math.log2(max(1, n) * bits_per_key)))
    bit_table = F.lit(_BIT_TABLE)
    exploded = keys.select(
        F.explode(F.array(*_hashes(F.col(key_col), m, k))).alias("pos")
    )
    rows = (
        exploded.select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.element_at(
                bit_table, (F.col("pos") % 64).cast("int") + 1
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * (m // 64)
    for r in rows:
        words[r["word_idx"]] = r["bits"]
    return words, m, k


def bloom_might_contain(
    words: list[int], m: int, k: int, key: Column
) -> Column:
    """Row-local membership predicate over the word-array bitmap —
    true if ``key`` MIGHT be in the summarized set (false positives
    possible, false negatives impossible).  Pure built-in expressions
    (O(1) element_at into the array literal + bit_get), so it runs
    inside whole-stage codegen in the fact table's scan stage.

    The literal is cast to array<bigint> explicitly: lit() infers the
    NARROWEST type from the values, and a sparse bitmap whose words
    all happen to fit 32 bits would otherwise become array<int> — on
    which bit_get throws for positions above 31.

    The word list crosses to the JVM as ONE parsed SQL expression
    (r14): ``F.lit(list)`` expands to ``array(lit(w) for w)`` — one
    py4j round-trip PER ELEMENT — and even ``F.lit(ndarray)`` converts
    element-wise inside py4j; both measured 1.4-3.5 s PER PLAN BUILD
    for an m/64 = 4-8k word bitmap, larger than the probe's whole
    execution (~0.4 s warm).  Catalyst parses the same array literal
    from one ~100 KB string in ~10 ms.  Exact: ``L``-suffixed longs
    parse to the identical BIGINT values, no float round-trip."""
    arr = F.expr(
        "array(" + ",".join(f"{w}L" for w in words) + ")"
    ).cast("array<bigint>")
    cond = F.lit(True)
    for pos in _hashes(key, m, k):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        cond = cond & (F.bit_get(word, (pos % 64).cast("int")) == 1)
    return cond
