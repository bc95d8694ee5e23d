"""Streaming deduplication — the ingest-time guard a training-data
pipeline needs (re-crawled pages, re-sent files, at-least-once
sources).

``streaming_exact_dedup`` keys on a content digest and drops repeats
within the watermark horizon via ``dropDuplicatesWithinWatermark`` —
state is bounded by the watermark (unlike a plain dropDuplicates whose
state grows forever), which is what makes it safe on an unbounded
100 TB stream. Near-dup streaming would chain the same digest pattern
over MinHash band hashes (operators/dedup.py) — band hash as the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop exact-duplicate documents arriving within the watermark.

    Input: a streaming DataFrame with an event-time column and a text
    payload. The digest column is retained for downstream lineage."""
    return (
        docs.withColumn("digest", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )
