"""Heavy hitters: per-partition Misra-Gries summaries + exact recount.

The naive plan for "top-k most frequent values" is
``groupBy(value).count().orderBy(...).limit(k)`` — correct, but its
shuffle carries EVERY distinct value.  On a web-scale token stream the
distinct-key set is 10^9-10^10 and the first shuffle dominates the job
even though only k rows survive.

The communication-optimal classic (Misra & Gries 1982; merged-summary
form from Agarwal et al., "Mergeable Summaries", PODS 2012) is:

  pass 1  each partition builds a Misra-Gries summary of capacity m
          (at most m counters, decrement-on-overflow).  Summary size is
          O(m) REGARDLESS of partition size, and each surviving counter
          under-counts its value's partition frequency by at most
          n_p/(m+1).  A value absent from every partition summary has
          global frequency <= N/(m+1).
  merge   MG summaries are MERGEABLE: summing counters per key and
          trimming back to the m largest keeps the error bound at
          N/(m+1) (Agarwal et al. 2012, Thm 1).  The merge here is a
          distributed ``groupBy("v").sum("n")`` followed by a
          distributed top-m trim — the summaries NEVER land on the
          driver; the stream length N rides the same aggregate as a
          per-partition sentinel row.
  pass 2  the trimmed candidate set (<= m slim rows, a JVM-side
          broadcast) is exact-recounted with a broadcast semi-join and
          TakeOrdered(k).  Only the final k rows reach the driver.

The result is exact whenever the k-th exact candidate count exceeds
N/m (strictly inside the N/(m+1) merge bound) — the operator VERIFIES
that at runtime and falls back to the full groupBy when it fails, so
the fast path can never silently return a wrong answer.  Ties at the
k-th rank are safe: every value tied with a passing k-th count also
exceeds the bound, hence is a candidate, so the (n DESC, v ASC)
tie-break sees the identical row set either way.

NULLs are excluded from the stream up front, so the fast path and the
exact fallback agree on NULL-heavy inputs (an MG summary has no NULL
key; the fallback's groupBy otherwise would).

Pass 1 is an Arrow-batched ``mapInPandas`` because decrement-on-
overflow is inherently stateful per partition — no built-in column
expression expresses it (SURVEY §7.2 escape hatch; same rationale as
the multimodal codecs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(batches: Iterator[pd.DataFrame], capacity: int) -> Iterator[pd.DataFrame]:
    """Misra-Gries over one partition's value stream (column 'v').

    Emits the surviving counters as (v, residual) rows — residuals, not
    zeros, so downstream ``groupBy("v").sum("n")`` IS the mergeable-
    summaries merge — plus one sentinel (NULL, partition_row_count) row
    so the same pass carries N; no separate count() scan."""
    counters: dict[str, int] = {}
    seen = 0
    for pdf in batches:
        seen += len(pdf)
        for v, c in pdf["v"].value_counts().items():
            c = int(c)
            if v in counters:
                counters[v] += c
            elif len(counters) < capacity:
                counters[v] = c
            else:
                # decrement all by the min of (c, current min counter)
                # repeatedly is O(distinct); the standard batch trick:
                # add then strip the (capacity+1)-th largest.
                counters[v] = c
                if len(counters) > capacity:
                    cut = sorted(counters.values())[len(counters) - capacity - 1]
                    counters = {
                        k: n - cut for k, n in counters.items() if n > cut
                    }
    yield pd.DataFrame(
        {
            "v": list(counters.keys()) + [None],
            "n": list(counters.values()) + [seen],
        }
    )


def mg_merged_summary(vals: DataFrame, capacity: int) -> DataFrame:
    """Distributed merged Misra-Gries summary of ``vals`` (one string
    column 'v', NULL-free).

    Returns (v, n): the NULL-keyed row carries N (total stream length,
    summed from the per-partition sentinels); non-NULL rows are merged
    counter residuals.  Everything is a DataFrame — nothing
    proportional to the partition count ever reaches the driver."""
    return (
        vals.mapInPandas(
            lambda it: _mg_partition(it, capacity), schema="v string, n long"
        )
        .groupBy("v")
        .agg(F.sum("n").alias("n"))
    )


def heavy_hitters_topk(
    values: DataFrame,
    k: int,
    capacity: int = 4096,
) -> DataFrame:
    """Exact global top-k of a single-column DataFrame ``values`` (its
    one column is renamed 'v'; NULLs are excluded on both paths),
    Misra-Gries-pruned.

    Returns columns (v, n) with n = exact global count, ordered
    n DESC, v ASC, limited to k (TakeOrderedAndProject — never a
    global-window sort).  Exactness guard: if the k-th candidate's
    exact count does not exceed N/capacity (strictly inside the merged
    MG recall bound N/(capacity+1)), the candidate set may be
    incomplete and the operator recomputes via the full groupBy instead
    of returning a possibly-wrong answer.
    """
    col = values.columns[0]
    vals = (
        values.select(F.col(col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
    )

    def exact_topk(df: DataFrame) -> list:
        return (
            df.groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("v"))
            .limit(k)
            .collect()
        )

    # Distributed merge of the per-partition summaries.  The summary is
    # tiny (<= n_partitions x (capacity+1) rows pre-merge, <= capacity+1
    # post-merge) but persisting it avoids re-running the pass-1 scan
    # for the candidate join after the N lookup.
    merged = mg_merged_summary(vals, capacity).persist()
    try:
        total_row = merged.filter(F.col("v").isNull()).agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("n")
        ).first()
        total = int(total_row["n"])
        # Mergeable-summaries trim: keep the capacity largest merged
        # residuals (ties broken on v for determinism).  Compiles to a
        # distributed TakeOrderedAndProject feeding a broadcast — the
        # candidate set is bounded by capacity, not by partition count.
        candidates = (
            merged.filter(F.col("v").isNotNull())
            .orderBy(F.desc("n"), F.asc("v"))
            .limit(capacity)
            .select("v")
        )
        rows = exact_topk(vals.join(F.broadcast(candidates), "v", "left_semi"))
    finally:
        merged.unpersist()
    if len(rows) < k or rows[-1]["n"] <= total / capacity:
        # MG guarantee does not cover the k-th rank at this capacity:
        # fall back to the exact (all-distinct-keys shuffle) plan.
        rows = exact_topk(vals)
    # k rows are driver-local either way; return them as a local
    # relation so the caller's materialization doesn't re-run the scan.
    spark = values.sparkSession
    return spark.createDataFrame(rows, schema="v string, n bigint")
