"""Print value-hashes of a representative catalog subset under a given
parallelism — the harness behind the cross-partitioning determinism
invariant (results must be identical under any local[N] / shuffle
partition count, or the DuckDB oracle gate would be flaky by design).

Usage: python scripts/partition_determinism.py <cpus> [sf_dir]
Output: one "<name> <hash>" line per query, sorted by name.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Order-sensitive shapes on purpose: multi-shuffle aggregation, window
# ranking, band-join dedup, ADC ranking, histogram narrowing, sampling.
SUBSET = [
    "pricing_summary",
    "district_monthly_rollup",
    "lineitem_feature_stats",
    "quantiles_by_priority",
    "lineitem_winsorized_hist",
    "rollup_revenue",
    "global_month_rank",
    "events_sessionize",
    "events_funnel_conversion",
    "doc_tfidf_top_terms",
    "dedup_minhash_pairs",
    "dedup_winnow_pairs",
    "knn_ivf_pq_rerank",
    "curation_stratified_sample",
    "part_type_revenue_share",
    # round-4 additions: forward-fill window, SCD2 interval chain,
    # MG candidate pruning (partition-count-sensitive by construction),
    # hopping-window fan-out, cohort distinct-count
    "events_gap_fill_ffill",
    "scd2_priority_history",
    "heavy_hitters_tokens",
    "events_hopping_window",
    "orders_retention_cohort",
    # round-5 additions: salt assignment varies with partition layout
    # (result must not), distributed MG merge
    "join_skew_salted",
    # round-6 additions: pair counts merge across partitions before the
    # tie-broken top-k; chunk signatures are row-local but ride an
    # explode whose task layout varies with parallelism; the canonical
    # argmax depends on the CC label fixpoint being layout-independent
    "bpe_pair_merge_step",
    "doc_chunk_windows",
    "dedup_canonical_docs",
    # round-7 additions: two-level decimal aggregation through a
    # materialized artifact (row order in the parquet varies with
    # layout, values must not), quantized-distance sums merged across
    # partitions after a txnlog MERGE, grouping-sets expansion whose
    # partial-agg combining varies with task layout
    "serving_top_nations_monthly",
    # r13: knn_ivf_refresh retired into knn_ivf_cosine's 'refresh' arm
    # — the merged entry keeps the quantized-distance-sum coverage
    "knn_ivf_cosine",
    "dashboard_grouping_sets",
    # round-11 addition: the span detector's bucket-cap/dup-test window
    # and per-doc lag window both repartition; duplicated-position sets
    # (and therefore the merged span geometry) must not vary with how
    # the gram explode's tasks are laid out
    "dedup_span_coverage",
    # round-12 additions: the dHash fingerprints are row-local Arrow
    # work, but the banded hamming self-join + dropDuplicates merge
    # candidates across whatever task layout the media explode got —
    # the pair set (and each pair's hamming) must not vary with it;
    # the BPE entry's top-k vocabulary cut and fold encodes must be
    # identical under any partitioning of the word count
    "image_phash_neardup",
    "bpe_vocab_encode",
    # round-13 addition: both AV arms run the banded hamming join over
    # packed (media, frame) keys and roll up with countDistinct — the
    # pair set, matched-frame counts and min hammings must not vary
    # with how the media synth/decode explode's tasks are laid out
    "av_neardup_pairs",
]


def main() -> int:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from pyspark.sql import SparkSession

    from scripts.driver_sim import value_hash

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .appName(f"determinism-{cpus}")
        .getOrCreate()
    )
    from big_data_processing_spark.plans.catalog import CATALOG

    for name in sorted(SUBSET):
        df = CATALOG[name].fn(spark, sf_dir).toPandas()
        print(name, value_hash(df), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
