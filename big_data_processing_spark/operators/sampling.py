"""Deterministic exact-count sampling — the subsampling step of a
training-data pipeline (balanced per-language corpora, eval holdouts,
debugging slices) done reproducibly.

``df.sample``/``sampleBy`` draw Bernoulli per-row samples: counts are
only approximate and depend on partitioning/seed plumbing, so two runs
of the same pipeline can ship different corpora.  Here the "randomness"
is a cryptographic hash of the row key — uniform, engine-independent
(md5 is md5 in Spark, DuckDB, and everything else), reproducible, and
SQL-oracle-checkable — and the count per stratum is EXACT via top-k
selection on the hash ranking.

Scale: the per-stratum selection is the W1 top-k-per-group shape (one
shuffle by stratum, per-group heap/rank).  A stratum is as big as its
corpus slice, so the rank runs over the full stratum — same cost
envelope as any per-group top-k; for tiny k and huge strata the
TakeOrdered-per-group optimization applies when |strata| is small
(filter per stratum + limit), which this module deliberately does not
hand-roll: the generic windowed form is partition-parallel across
strata and map-side prunable in future Spark versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY min(n, |stratum|) rows per stratum, chosen by md5-hash
    ranking of the key (deterministic pseudo-random, reproducible
    across engines/partitionings; change ``salt`` to draw an
    independent sample).  Adds ``sample_rank`` (1-based within the
    stratum, hash order) to the selected rows."""
    hash_key = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(hash_key.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def weighted_sample_exact(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY min(n, |rows with positive weight|) rows drawn WITHOUT
    replacement with probability proportional to ``weight_col`` —
    Efraimidis & Spirakis (2006) exponential-rank sampling (the A-ES
    scheme): each row gets key u^(1/w) with u uniform in (0, 1], and
    the top-n keys are the weighted draw.

    The uniform is md5-derived from (salt, key) — the same
    deterministic-pseudo-random device as the other samplers, so the
    draw is reproducible across runs and partitionings; change ``salt``
    for an independent draw.  PRECONDITION: ``key_col`` must be unique
    (true of the other deterministic samplers too) — duplicate keys get
    identical rank keys AND identical tie-breaks, so which physical
    duplicate survives at the ``limit(n)`` boundary would be
    partition-layout-dependent.  Note also that draws with the same
    salt are fully correlated ACROSS tables sharing key values: use a
    per-purpose salt for independent draws, exactly as documented.  Rows with NULL, NaN or non-positive
    weight are excluded (A-ES is defined for finite w > 0; NaN weights
    would otherwise rank FIRST — NaN > 0 is true and NaN sorts
    greatest under desc — so a 0/0 in a quality score would fill the
    sample with exactly the garbage rows).

    Used for quality-weighted corpus subsampling (draw documents
    proportionally to a quality score).  Kept OUT of the driver
    catalog deliberately: the selection boundary compares pow() of
    transcendental doubles, which is deterministic within one engine
    but not bit-contracted across engines the way md5 is — evidence is
    the exact NumPy-model parity test instead of a DuckDB hash row.

    Scale: the rank key is row-local codegen (md5 + pow); top-n is
    ``orderBy().limit(n)`` — TakeOrderedAndProject, a per-partition
    heap of n rows merged on the driver, never a global sort or a
    partitionless window.  Output carries exactly the input columns
    (the rank key lives in a collision-free temp column, dropped)."""
    import uuid

    from ..functions.text import hash32  # the engine's canonical 32-bit hash

    h = hash32(F.col(key_col).cast("string"), seed=salt)
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 32))  # (0, 1]
    w = F.col(weight_col).cast("double")
    skey = f"__sample_key_{uuid.uuid4().hex[:8]}"
    return (
        df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn(skey, F.pow(u, F.lit(1.0) / w))
        .orderBy(F.desc(skey), F.col(key_col).asc())
        .limit(n)
        .drop(skey)
    )


def deterministic_fraction_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Reproducible ~fraction sample with NO shuffle at all: keep rows
    whose key-hash prefix falls under the fraction threshold (the
    row-local engine-independent analog of Bernoulli sampling — the
    same rows are kept on every run, every engine, every partitioning).
    Exactness is per-key, not per-count; use stratified_sample_exact
    when the COUNT must be exact."""
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return df.filter(bucket < F.lit(int(fraction * (1 << 32))))
