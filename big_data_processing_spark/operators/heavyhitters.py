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
          O(m) REGARDLESS of partition size, and any value with
          partition frequency > n_p/m survives its partition summary.
          Consequently any value with GLOBAL frequency > N/m survives
          in at least one partition (a value absent from every summary
          has count <= n_p/m in each, so <= N/m overall).
  pass 2  the union of summaries (n_partitions x m rows, kilobytes) is
          the candidate set; re-scan with a broadcast semi-join and
          count EXACTLY only the candidates, then TakeOrdered(k).

The result is exact whenever the true k-th frequency > N/m — the
operator VERIFIES that bound at runtime and falls back to the full
groupBy when it fails, so the fast path can never silently return a
wrong answer.  Pass 1 shuffles nothing (summaries are a tiny
mapInPandas output); pass 2 shuffles only candidate keys.

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

    Emits the surviving candidate values as (v, 0) rows plus one
    sentinel (NULL, partition_row_count) row, so the caller learns N
    from the same pass — no separate count() scan of the stream."""
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
            "n": [0] * len(counters) + [seen],
        }
    )


def heavy_hitters_topk(
    values: DataFrame,
    k: int,
    capacity: int = 4096,
) -> DataFrame:
    """Exact global top-k of a single-column DataFrame ``values`` (its
    one column is renamed 'v'), Misra-Gries-pruned.

    Returns columns (v, n) with n = exact global count, ordered
    n DESC, v ASC, limited to k (TakeOrderedAndProject — never a
    global-window sort).  Exactness guard: if the k-th candidate's
    exact count does not exceed N/capacity (the MG recall bound), the
    candidate set may be incomplete and the operator recomputes via
    the full groupBy instead of returning a possibly-wrong answer.
    """
    col = values.columns[0]
    vals = values.select(F.col(col).cast("string").alias("v"))

    def exact_topk(df: DataFrame) -> list:
        return (
            df.groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("v"))
            .limit(k)
            .collect()
        )

    summaries = vals.mapInPandas(
        lambda it: _mg_partition(it, capacity), schema="v string, n long"
    ).collect()  # bounded: n_partitions x (capacity + 1) slim rows
    total = sum(r["n"] for r in summaries if r["v"] is None)
    cand = sorted({r["v"] for r in summaries if r["v"] is not None})
    spark = values.sparkSession
    candidates = spark.createDataFrame([(v,) for v in cand], "v string")

    rows = exact_topk(vals.join(F.broadcast(candidates), "v", "left_semi"))
    if len(rows) < k or rows[-1]["n"] <= total / capacity:
        # MG guarantee does not cover the k-th rank at this capacity:
        # fall back to the exact (all-distinct-keys shuffle) plan.
        rows = exact_topk(vals)
    # k rows are driver-local either way; return them as a local
    # relation so the caller's materialization doesn't re-run the scan.
    return spark.createDataFrame(rows, schema="v string, n bigint")
