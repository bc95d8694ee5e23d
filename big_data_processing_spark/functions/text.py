"""Text-analysis column expressions (tokenize, shingles, hashing).

All pure JVM built-ins (split/transform/aggregate/md5/conv) — no Python
UDFs — so they run inside whole-stage codegen and scale linearly with
executor count. Hashes are md5-derived 32-bit ints, chosen because md5
is bit-identical in every engine (Spark, DuckDB, Python), which makes
the dedup/similarity operators oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize(text: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), r"\s+")


def hash32(col: Column, seed: str = "") -> Column:
    """Deterministic 32-bit hash: first 8 hex chars of md5(seed || value).

    Cross-engine reproducible (unlike murmur-based ``F.hash``):
    DuckDB twin is ``('0x' || substr(md5(seed || v), 1, 8))::BIGINT``.
    """
    seeded = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(seeded), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str, seed: str = "") -> str:
    inner = f"'{seed}' || {expr}" if seed else expr
    return f"(('0x' || substr(md5({inner}), 1, 8))::BIGINT)"


def hash60(col: Column, seed: str = "") -> Column:
    """Deterministic 60-bit hash (first 15 md5 hex chars): wide enough
    for 60-bit SimHash fingerprints while staying inside signed BIGINT
    on both engines (16 chars could exceed 2^63). DuckDB twin:
    :func:`hash60_sql`."""
    seeded = F.concat(F.lit(seed), col) if seed else col
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, seed: str = "") -> str:
    inner = f"'{seed}' || {expr}" if seed else expr
    return f"(('0x' || substr(md5({inner}), 1, 15))::BIGINT)"


def shingles(tokens: Column, n: int = 3) -> Column:
    """Token n-gram shingles; short docs fall back to one whole-doc shingle.

    Built with sequence+transform+slice — array codegen, no shuffle, no
    explode (the array stays row-local until the LSH band explode).
    """
    k = F.size(tokens)
    ngrams = F.transform(
        F.sequence(F.lit(1), k - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, n)),
    )
    return F.when(k >= n, ngrams).otherwise(F.array(F.concat_ws(" ", tokens)))


def shingles_sql(tokens_expr: str, n: int = 3) -> str:
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(generate_series(1, len({tokens_expr}) - {n - 1}), "
        f"i -> array_to_string(({tokens_expr})[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({tokens_expr}, ' ')] END"
    )


def token_sum_len(tokens: Column) -> Column:
    """Total characters across tokens (exact int arithmetic)."""
    return F.aggregate(
        F.transform(tokens, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "is", "a"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "les", "et", "des", "un"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3"),
}


def stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens present in a stopword list (multiset count)."""
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wl, t))).cast("long")


def stopword_hits_sql(tokens_expr: str, words: tuple[str, ...]) -> str:
    lit = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"CAST(len(list_filter({tokens_expr}, t -> list_contains({lit}, t))) AS BIGINT)"


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


NORMALIZE_SQL = "trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
