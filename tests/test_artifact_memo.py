"""The shared dedup artifact memo (plans/catalog_ext._memo_artifact)
must key by scale dir — one process routinely serves multiple sf dirs
(this very pytest suite runs sf0.001 fixtures while ad-hoc checks hit
sf0.01), and a cross-contaminated memo would hand one scale's pair
list to another scale's entry: wrong results that LOOK plausible.
Also pins that a memo hit returns the same rows as a fresh build.
"""

from __future__ import annotations

import pytest

from big_data_processing_spark.plans import catalog_ext as ce

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


@pytest.fixture(autouse=True)
def _fresh_memo():
    saved = dict(ce._ARTIFACTS)
    ce._ARTIFACTS.clear()
    yield
    ce._ARTIFACTS.clear()
    ce._ARTIFACTS.update(saved)


def test_memo_keys_by_sf_dir(spark):
    a = ce._dedup_pairs_default(spark, SF_A)
    b = ce._dedup_pairs_default(spark, SF_B)
    pa = {(r.id_a, r.id_b) for r in a.collect()}
    pb = {(r.id_a, r.id_b) for r in b.collect()}
    # distinct artifacts on disk, not one frame served twice
    assert ce._ARTIFACTS[(SF_A, "minhash_pairs_default")] != ce._ARTIFACTS[
        (SF_B, "minhash_pairs_default")
    ]
    assert pa != pb  # different corpora -> different pair sets


def test_memo_hit_matches_fresh_build(spark):
    first = {(r.id_a, r.id_b, r.jaccard) for r in
             ce._dedup_pairs_default(spark, SF_A).collect()}
    # second call must be a memo hit...
    path = ce._ARTIFACTS[(SF_A, "minhash_pairs_default")]
    again = {(r.id_a, r.id_b, r.jaccard) for r in
             ce._dedup_pairs_default(spark, SF_A).collect()}
    assert ce._ARTIFACTS[(SF_A, "minhash_pairs_default")] == path
    assert again == first
    # ...and a forced fresh build produces the identical pair set
    # (doubles included: the parquet round-trip is bit-exact)
    ce._ARTIFACTS.clear()
    fresh = {(r.id_a, r.id_b, r.jaccard) for r in
             ce._dedup_pairs_default(spark, SF_A).collect()}
    assert fresh == first


def test_build_barriers_released_after_artifact_write(spark):
    """ADVICE r13: barriers persisted INSIDE a one-time build can never
    be reused once the artifact parquet exists, so _memo_artifact must
    release them at the write instead of deferring to the owner's next
    release_barriers() (driver_sim never drains)."""
    from big_data_processing_spark.operators.util import _BARRIERS

    n_before = len(_BARRIERS)
    # the pairs build persists the banded frame across its branches
    ce._dedup_pairs_default(spark, SF_A)
    assert len(_BARRIERS) == n_before, (
        f"{len(_BARRIERS) - n_before} build-internal barrier(s) left "
        "registered after the artifact write"
    )
