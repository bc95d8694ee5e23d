"""Property-based tests (hypothesis) for the text/dedup/similarity
operator invariants — the guarantees that make them trustworthy on
arbitrary 100 TB content, not just the fixture distributions."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_processing_spark.operators.dedup import (
    MINHASH_AB,
    MINHASH_P,
    minhash_band_rows,
    minhash_lsh_pairs,
    minhash_pairs_from_bands,
    simhash_fingerprints,
    simhash_hamming_pairs,
)
from big_data_processing_spark.operators.similarity import brute_force_knn
from big_data_processing_spark.operators.textstats import quality_features

words = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=6), min_size=1, max_size=30
)


@st.composite
def documents(draw, n=st.integers(2, 8)):
    k = draw(n)
    return [(i, " ".join(draw(words))) for i in range(k)]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(documents())
def test_split_banding_pipeline_equals_monolithic(spark, docs):
    """minhash_pairs_from_bands(minhash_band_rows(df)) must return the
    exact pair set of minhash_lsh_pairs(df) — the r13 split lets
    callers sign the corpus once and share the banded frame, and this
    pins that the composition (including the cap path) stays
    value-identical.  Duplicates are injected so pairs exist, and a
    tight cap (2) exercises the over-cap pre-aggregate branch."""
    dup = docs + [(len(docs) + i, d[1]) for i, d in enumerate(docs[:2])]
    df = spark.createDataFrame(dup, ["doc_id", "text"])
    for cap in (None, 2):
        mono = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 12))
            for r in minhash_lsh_pairs(
                df, jaccard_threshold=0.3, max_bucket_size=cap
            ).collect()
        )
        split = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 12))
            for r in minhash_pairs_from_bands(
                minhash_band_rows(df), jaccard_threshold=0.3, max_bucket_size=cap
            ).collect()
        )
        assert split == mono


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(documents())
def test_identical_docs_always_pair(spark, docs):
    """A duplicated document must be found by MinHash+LSH (identical
    signatures collide in every band; Jaccard = 1)."""
    dup = docs + [(len(docs), docs[0][1])]
    df = spark.createDataFrame(dup, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, jaccard_threshold=0.99).collect()
    assert any({p.id_a, p.id_b} == {0, len(docs)} for p in pairs)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(documents())
def test_quality_ratios_bounded(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for r in quality_features(df).collect():
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert r.n_tokens >= 1
        assert 0.0 <= r.quality_score <= 1.0 + 1e-9


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(documents())
def test_simhash_deterministic_and_bounded(spark, docs):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = {r.id: r.simhash for r in simhash_fingerprints(df).collect()}
    b = {r.id: r.simhash for r in simhash_fingerprints(df).collect()}
    assert a == b
    assert all(0 <= v < (1 << 16) for v in a.values())
    # identical text → identical fingerprint
    df2 = spark.createDataFrame([(0, docs[0][1]), (1, docs[0][1])], ["doc_id", "text"])
    s = [r.simhash for r in simhash_fingerprints(df2).collect()]
    assert s[0] == s[1]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(documents())
def test_simhash_hamming_pairs_exact_within_radius(spark, docs):
    """Banded block join is EXACT within the radius (pigeonhole with
    radius+1 blocks): it reports the same pair set as a brute-force
    hamming scan, and a duplicated doc always pairs at distance 0."""
    dup = docs + [(len(docs), docs[0][1])]
    df = spark.createDataFrame(dup, ["doc_id", "text"])
    got = {
        (p.id_a, p.id_b): p.hamming
        for p in simhash_hamming_pairs(df, bits=60, radius=3).collect()
    }
    fps = {r.id: r.simhash for r in simhash_fingerprints(df, bits=60).collect()}
    want = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert got == want
    assert got[(0, len(docs))] == 0


def test_minhash_permutation_params_valid():
    assert all(a % 2 == 1 and 0 < a < MINHASH_P for a, _ in MINHASH_AB)
    assert all(0 <= b < MINHASH_P for _, b in MINHASH_AB)
    # no duplicate permutations
    assert len(set(MINHASH_AB)) == len(MINHASH_AB)


def test_knn_self_similarity_and_symmetry(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    knn = brute_force_knn(df, df, k=3)
    rows = knn.collect()
    # no self matches; cosine within [-1, 1]; ranks contiguous
    assert all(r.query_id != r.neighbor_id for r in rows)
    assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in rows)
    for q in {r.query_id for r in rows}:
        ranks = sorted(r.rank for r in rows if r.query_id == q)
        assert ranks == list(range(1, len(ranks) + 1))
    # 0 and 1 are mutual nearest neighbors
    top = {r.query_id: r.neighbor_id for r in rows if r.rank == 1}
    assert top[0] == 1 and top[1] == 0


def test_lsh_knn_recall_vs_bruteforce(spark, sf_dir):
    """LSH candidates must recover most true top-5 neighbors (recall
    measured against the exact baseline on the real embeddings)."""
    from big_data_processing_spark.plans.catalog_ext import (
        knn_bruteforce_cosine,
        knn_lsh_cosine,
    )

    exact = {
        (r.query_id, r.neighbor_id) for r in knn_bruteforce_cosine(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in knn_lsh_cosine(spark, sf_dir).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"LSH recall too low: {recall:.2f}"


def test_ivf_knn_recall_vs_bruteforce(spark, sf_dir):
    """IVF (16 cells, probe 4 = 25% of the corpus) must recover most
    true top-5 neighbors."""
    import pyspark.sql.functions as F

    from big_data_processing_spark.operators.similarity import ivf_knn
    from big_data_processing_spark.plans.catalog_ext import knn_bruteforce_cosine
    from big_data_processing_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id) for r in knn_bruteforce_cosine(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_knn(
            emb, emb.filter(F.col("vec_id") % 50 == 0), k=5, n_cells=16, n_probe=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall:.2f}"


def test_pq_rerank_recall_and_containment(spark, sf_dir):
    """PQ shortlist + exact rerank must recover most true top-5
    neighbors, every reported neighbor must come from the ADC
    shortlist, and the reported cosine must equal the exact cosine
    for that pair (the rerank is exact by construction)."""
    import pyspark.sql.functions as F

    from big_data_processing_spark.operators.similarity import (
        fit_pq_codebooks_parquet,
        pq_adc_topk,
        pq_rerank_topk,
    )
    from big_data_processing_spark.plans.catalog_ext import knn_bruteforce_cosine
    from big_data_processing_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = fit_pq_codebooks_parquet(f"{sf_dir}/embeddings.parquet", m=16, k=16)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact_rows = knn_bruteforce_cosine(spark, sf_dir).collect()
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in exact_rows}
    shortlist = {
        (r.query_id, r.neighbor_id)
        for r in pq_adc_topk(emb, queries, books, k=25).collect()
    }
    rerank = pq_rerank_topk(emb, queries, books, k=5, shortlist=25).collect()
    got = {(r.query_id, r.neighbor_id) for r in rerank}
    assert got <= shortlist, "rerank emitted a pair outside its shortlist"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.6, f"PQ recall too low: {recall:.2f}"
    for r in rerank:
        key = (r.query_id, r.neighbor_id)
        if key in exact_cos:
            assert r.cosine == exact_cos[key]


def test_pq_codes_bounded_and_deterministic(spark, sf_dir):
    """Every PQ code is in [0, k); encoding twice gives identical
    codes (the argmin tie-break is deterministic)."""
    from big_data_processing_spark.operators.similarity import (
        fit_pq_codebooks_parquet,
        pq_encode,
    )
    from big_data_processing_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    books = fit_pq_codebooks_parquet(f"{sf_dir}/embeddings.parquet", m=16, k=16)
    a = {r.id: list(r.codes) for r in pq_encode(emb, books).collect()}
    b = {r.id: list(r.codes) for r in pq_encode(emb, books).collect()}
    assert a == b
    for codes in a.values():
        assert len(codes) == 16
        assert all(0 <= c < 16 for c in codes)


def test_minhash_jaccard_estimate_tracks_truth(spark):
    """Signature agreement rate ≈ true Jaccard (the MinHash property),
    checked loosely on two half-overlapping documents."""
    a = " ".join(f"w{i}" for i in range(40))
    b = " ".join(f"w{i}" for i in range(20, 60))  # ~ 1/3 shingle overlap
    df = spark.createDataFrame([(0, a), (1, b)], ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, jaccard_threshold=0.0, bands=12, num_hashes=12).collect()
    if pairs:  # banding may or may not surface the pair; if it does, Jaccard is exact
        j = pairs[0].jaccard
        # shared 3-shingles are those fully inside w20..w39: starts
        # 20..37 → 18 of 38 per doc → J = 18/(38+38-18)
        assert math.isclose(j, 18 / 58, rel_tol=1e-9)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_equal_union_find(spark, edges):
    """Min-label propagation must converge to exactly the components a
    driver-side union-find computes on the same arbitrary edge list."""
    from big_data_processing_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    nodes = {n for e in edges for n in e}
    expected = {}
    for n in nodes:
        root = find(n)
        expected.setdefault(root, set()).add(n)
    truth = {n: min(member) for member in expected.values() for n in member}

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.node: r.cluster_id for r in connected_components(df).collect()}
    assert got == truth


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_star_contraction_equals_min_label(spark, edges):
    """Alternating star contraction must produce exactly the same
    (node, cluster_id) assignment as min-label propagation on any
    arbitrary edge list (both converge to the component-minimum
    fixpoint)."""
    from big_data_processing_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    truth = {r.node: r.cluster_id for r in connected_components(df).collect()}
    comp, rounds = connected_components_star(df)
    got = {r.node: r.cluster_id for r in comp.collect()}
    assert got == truth
    assert rounds <= 40


def test_star_contraction_logarithmic_on_chain(spark):
    """On a 600-node path graph (diameter 599 — min-label propagation's
    worst case) the alternation must converge in O(log n) rounds, not
    O(n): the property the dedup_cc_star_contraction entry certifies
    in-query at data scale."""
    import math

    from big_data_processing_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(599)], "id_a long, id_b long"
    )
    comp, rounds = connected_components_star(df)
    rows = comp.collect()
    assert len(rows) == 600
    assert all(r.cluster_id == 0 for r in rows)
    assert rounds <= 2 * math.ceil(math.log2(600)) + 4


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(  # left events: (key, time)
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(  # right updates: (key, time, payload)
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(100, 999)),
        min_size=0,
        max_size=15,
        unique_by=lambda r: (r[0], r[1]),  # unique per (key, time) as the contract requires
    ),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """The union+window as-of composition must equal the brute-force
    definition: payload of the max right time <= left time per key,
    inclusive, null when no right row precedes."""
    from big_data_processing_spark.operators.asof import asof_join_backward

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lefts)], ["row_id", "k", "t"]
    )
    rdf = spark.createDataFrame(rights, ["k", "t", "payload"]) if rights else (
        spark.createDataFrame([], "k int, t int, payload int")
    )
    got = {
        r.row_id: r.payload
        for r in asof_join_backward(
            ldf, rdf, on=["k"], time_col="t", payload_cols=["payload"]
        ).collect()
    }
    for i, (k, t) in enumerate(lefts):
        cands = [(rt, p) for rk, rt, p in rights if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, got[i], want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(  # intervals: (key, lo, width)
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 40)),
        min_size=1,
        max_size=20,
    ),
    st.lists(  # points: (key, t)
        st.tuples(st.integers(0, 3), st.integers(0, 140)), min_size=1, max_size=30
    ),
    st.integers(1, 50),  # bucket width — correctness must not depend on it
)
def test_range_join_matches_bruteforce(spark, intervals, points, bucket):
    """The bucketized range join must produce exactly the pairs of the
    raw inequality definition, for ANY bucket width."""
    from big_data_processing_spark.operators.rangejoin import range_join

    idf = spark.createDataFrame(
        [(i, k, lo, lo + w) for i, (k, lo, w) in enumerate(intervals)],
        ["iv_id", "k", "lo", "hi"],
    )
    pdf = spark.createDataFrame(
        [(j, k, t) for j, (k, t) in enumerate(points)], ["pt_id", "k", "t"]
    )
    got = {
        (r.iv_id, r.pt_id)
        for r in range_join(
            idf, pdf, key_cols=["k"], lo_col="lo", hi_col="hi", t_col="t",
            bucket_width=bucket,
        ).collect()
    }
    want = {
        (i, j)
        for i, (ik, lo, w) in enumerate(intervals)
        for j, (pk, t) in enumerate(points)
        if ik == pk and lo <= t <= lo + w
    }
    assert got == want


def test_asof_join_null_payload_not_stitched(spark):
    """A matched right row's NULL payload field must come through as
    NULL (true as-of semantics) — not fall through to an older right
    row; and multi-column payloads must all come from the SAME matched
    row, never stitched across rows."""
    from big_data_processing_spark.operators.asof import asof_join_backward

    ldf = spark.createDataFrame([(1, 0, 30)], ["row_id", "k", "t"])
    rdf = spark.createDataFrame(
        [(0, 10, 100, "old"), (0, 20, None, "new")],
        "k int, t int, a int, b string",
    )
    row = asof_join_backward(
        ldf, rdf, on=["k"], time_col="t", payload_cols=["a", "b"]
    ).collect()[0]
    # matched row is t=20: a must be its NULL, b its 'new' — a per-
    # column carry would wrongly produce (100, 'new'), mixing rows
    assert row.a is None and row.b == "new", (row.a, row.b)


def _py_winnow(text: str, k: int = 3, w: int = 4) -> set[int]:
    """Independent pure-Python winnowing reference (Schleimer et al.
    2003, robust variant: rightmost min per window) for cross-checking
    the Spark array-expression implementation."""
    import hashlib
    import re

    toks = re.split(r"\s+", text.lower())
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    else:
        grams = [" ".join(toks)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    m = len(hs)
    fps = set()
    for p in range(max(1, m - w + 1)):
        win = hs[p : p + w]
        best = 0
        for i in range(len(win)):
            if win[i] <= win[best]:
                best = i
        fps.add(win[best])
    return fps


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(documents())
def test_winnow_matches_python_reference(spark, docs):
    """The Spark nested-HOF winnowing fold selects exactly the same
    fingerprint set as an independent per-document Python scan."""
    from big_data_processing_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.id: set(r.fps) for r in winnow_fingerprints(df).collect()}
    for doc_id, text in docs:
        assert got[doc_id] == _py_winnow(text), text


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(words, words)
def test_winnow_shared_substring_guarantee(spark, fill_a, fill_b):
    """Winnowing's coverage guarantee: two documents sharing a token
    run of length >= shingle_n + window - 1 (here 6) must share at
    least one selected fingerprint VALUE (ties break by position, but
    fingerprints are values, so the guarantee survives)."""
    from big_data_processing_spark.operators.dedup import winnow_shared_pairs

    shared = "zeta yotta quux corge grault garply"  # 6 tokens
    doc_a = " ".join(fill_a) + " " + shared
    doc_b = " ".join(fill_b) + " " + shared
    df = spark.createDataFrame([(0, doc_a), (1, doc_b)], ["doc_id", "text"])
    pairs = winnow_shared_pairs(df, min_shared=1).collect()
    assert any({p.id_a, p.id_b} == {0, 1} for p in pairs)


def test_results_identical_across_parallelism():
    """The cross-partitioning determinism invariant, automated: a
    representative catalog subset (multi-shuffle aggregation, window
    ranking, band joins, ADC ranking, histogram narrowing, sampling)
    must hash identically under local[2]/2-shuffle-partitions and
    local[8]/8 — otherwise the DuckDB oracle gate would be flaky by
    construction. Runs each side in its own subprocess (one JVM
    cannot host two masters)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "scripts", "partition_determinism.py")

    def run(cpus: int) -> dict[str, str]:
        out = subprocess.run(
            [sys.executable, script, str(cpus)],
            capture_output=True,
            text=True,
            timeout=600,
            cwd=root,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return dict(
            line.split() for line in out.stdout.splitlines() if " " in line
        )

    # the two sides are independent JVMs — overlap them (r14, suite
    # wall budget: this test was the #2 entry at 153 s serial; the
    # local[2]+local[8] pair does not saturate the test host)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f2, f8 = pool.submit(run, 2), pool.submit(run, 8)
        h2, h8 = f2.result(), f8.result()
    assert h2 and h2 == h8, {
        k: (h2.get(k), h8.get(k)) for k in set(h2) | set(h8) if h2.get(k) != h8.get(k)
    }


# ---------------------------------------------------------------- heavy hitters


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee", "ff", "g1", "g2", "g3", "g4"]),
        min_size=1,
        max_size=300,
    )
)
def test_heavy_hitters_exact_vs_groupby(spark, values):
    """Misra-Gries-pruned top-k must equal the exact groupBy top-k on
    ANY distribution — the runtime bound check falls back whenever the
    MG recall guarantee can't certify the candidate set."""
    from big_data_processing_spark.operators.heavyhitters import heavy_hitters_topk

    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [(r.v, r.n) for r in heavy_hitters_topk(df, k=3, capacity=4).collect()]
    exact = [
        (r.v, r.n)
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("v"))
        .limit(3)
        .collect()
    ]
    assert got == exact


def test_heavy_hitters_fast_path_engages(spark):
    """On a skewed stream with ample capacity the MG fast path (no
    all-keys shuffle) must produce the exact answer without fallback —
    verified by checking the bound that gates the fast path holds."""
    from big_data_processing_spark.operators.heavyhitters import heavy_hitters_topk

    rows = [("hot",)] * 500 + [("warm",)] * 200 + [(f"cold{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "v string").repartition(4)
    got = [(r.v, r.n) for r in heavy_hitters_topk(df, k=2, capacity=64).collect()]
    assert got == [("hot", 500), ("warm", 200)]
    # k-th count (200) > N/capacity (750/64 ≈ 11.7): fast path certified
    assert 200 > (500 + 200 + 50) / 64


def test_heavy_hitters_no_partition_proportional_collect(spark, monkeypatch):
    """The r4 scale flag, pinned: no driver collect may scale with the
    partition count.  Spy on DataFrame.collect while running the fast
    path over 32 partitions — every collected result must be bounded by
    k, never the n_partitions x capacity summary union."""
    import pyspark.sql.classic.dataframe as df_mod

    from big_data_processing_spark.operators.heavyhitters import heavy_hitters_topk

    sizes = []
    orig = df_mod.DataFrame.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(df_mod.DataFrame, "collect", spy)
    rows = [("hot",)] * 500 + [("warm",)] * 200 + [(f"cold{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "v string").repartition(32)
    result = heavy_hitters_topk(df, k=2, capacity=64)
    monkeypatch.undo()
    assert sizes and max(sizes) <= 2
    assert [(r.v, r.n) for r in result.collect()] == [("hot", 500), ("warm", 200)]


def test_heavy_hitters_null_values_excluded_both_paths(spark):
    """NULLs are excluded from the stream up front (ADVICE r4): a
    NULL-heavy input must yield the same non-NULL top-k whether the MG
    fast path or the exact fallback runs."""
    from big_data_processing_spark.operators.heavyhitters import heavy_hitters_topk

    rows = [(None,)] * 400 + [("a",)] * 5 + [("b",)] * 4 + [("c",)] * 3
    df = spark.createDataFrame(rows, "v string").repartition(4)
    # tiny capacity forces the fallback; generous capacity keeps the
    # fast path — both must agree and neither may surface NULL
    want = [("a", 5), ("b", 4), ("c", 3)]
    fast = [(r.v, r.n) for r in heavy_hitters_topk(df, k=3, capacity=64).collect()]
    slow = [(r.v, r.n) for r in heavy_hitters_topk(df, k=3, capacity=1).collect()]
    assert fast == want and slow == want


# ---------------------------------------------------------------- timeseries


def test_gap_fill_dense_and_ffill_matches_pandas(spark):
    """The filled series must be day-dense per entity and equal a
    pandas ffill of the last-event-per-day series."""
    import datetime as dt

    import pandas as pd

    from big_data_processing_spark.operators.timeseries import gap_fill_ffill

    rows = [
        (1, dt.datetime(2024, 1, 1, 5), 10.0, 1),
        (1, dt.datetime(2024, 1, 1, 9), 11.0, 2),  # later same day wins
        (1, dt.datetime(2024, 1, 4, 0), 14.0, 3),  # 2-day gap
        (2, dt.datetime(2024, 1, 2, 0), 20.0, 4),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")
    out = (
        gap_fill_ffill(df, "user_id", "ts", "value", "event_id")
        .orderBy("entity", "day")
        .toPandas()
    )
    got = [
        (r.entity, str(r.day), r.value_filled, r.is_observed)
        for r in out.itertuples()
    ]
    assert got == [
        (1, "2024-01-01", 11.0, 1),
        (1, "2024-01-02", 11.0, 0),
        (1, "2024-01-03", 11.0, 0),
        (1, "2024-01-04", 14.0, 1),
        (2, "2024-01-02", 20.0, 1),
    ]
    _ = pd  # imported for symmetry with other pandas-reference tests


def test_scd2_intervals_chain_and_collapse(spark):
    """SCD2: consecutive duplicate attributes collapse, intervals chain
    [from, to) with exactly one open current row per key."""
    import datetime as dt

    from big_data_processing_spark.operators.timeseries import scd2_intervals

    rows = [
        (7, "A", dt.datetime(2024, 1, 1), 1),
        (7, "A", dt.datetime(2024, 2, 1), 2),  # duplicate — collapsed
        (7, "B", dt.datetime(2024, 3, 1), 3),
        (7, "A", dt.datetime(2024, 4, 1), 4),  # back to A — new interval
        (8, "Z", dt.datetime(2024, 1, 15), 5),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, id long")
    out = [
        (r.key, r.attr, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd2_intervals(df, "k", "attr", "ts", "id")
        .orderBy("key", "valid_from")
        .collect()
    ]
    assert out == [
        (7, "A", "2024-01-01", "2024-03-01", 0),
        (7, "B", "2024-03-01", "2024-04-01", 0),
        (7, "A", "2024-04-01", "9999-12-31", 1),
        (8, "Z", "2024-01-15", "9999-12-31", 1),
    ]


def test_constraint_report_null_hostile_single_scan(spark):
    """A NULL predicate result counts as a violation (expectations are
    null-hostile, unlike SQL CHECK), and the whole report is ONE
    aggregate — no per-check scan."""
    from big_data_processing_spark.operators.constraints import constraint_report

    df = spark.createDataFrame(
        [(1.0,), (None,), (-2.0,)], "x double"
    )
    rep = constraint_report(
        df,
        {
            "x_positive": F.col("x") > 0,
            "x_nullable_positive": F.col("x").isNull() | (F.col("x") > 0),
        },
    )
    got = {(r.check_name, r.n_rows, r.n_violations, r.passed) for r in rep.collect()}
    assert got == {
        ("x_positive", 3, 2, 0),          # NULL row violates
        ("x_nullable_positive", 3, 1, 0),  # NULL explicitly allowed
    }
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1  # local relation: zero scans, one agg


def test_constraint_report_rejects_injection_prone_names(spark):
    """Check names reach a stack() SQL expression; anything outside
    [A-Za-z0-9_]+ is rejected up front instead of breaking (or
    altering) the parsed expression (ADVICE r4)."""
    import pytest

    from big_data_processing_spark.operators.constraints import constraint_report

    df = spark.createDataFrame([(1.0,)], "x double")
    for bad in ("it's", "a`b", "a, b", "x') --"):
        with pytest.raises(ValueError, match="check names"):
            constraint_report(df, {bad: F.col("x") > 0})
    # any case variant of the internal row-counter alias is ambiguous
    # under Spark's case-insensitive resolver — rejected up front
    for clash in ("_n_rows", "_N_ROWS", "_N_rows"):
        with pytest.raises(ValueError, match="row counter"):
            constraint_report(df, {clash: F.col("x") > 0})


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),                      # entity
            st.integers(0, 20),                     # day offset
            st.integers(0, 23),                     # hour (intra-day order)
            st.integers(-50, 50),                   # value (int-valued double)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_gap_fill_matches_pandas_reference(spark, events):
    """gap_fill_ffill ≡ pandas asfreq('D').ffill() of the last-event-
    per-day series, on arbitrary event streams."""
    import datetime as dt

    import pandas as pd

    from big_data_processing_spark.operators.timeseries import gap_fill_ffill

    base = dt.datetime(2024, 3, 1)
    rows = [
        (e, base + dt.timedelta(days=d, hours=h), float(v), i)
        for i, (e, d, h, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    got = {
        (r.entity, str(r.day)): (r.value_filled, r.is_observed)
        for r in gap_fill_ffill(df, "user_id", "ts", "value", "event_id").collect()
    }

    pdf = pd.DataFrame(rows, columns=["e", "ts", "v", "id"])
    want = {}
    for e, g in pdf.groupby("e"):
        g = g.sort_values(["ts", "id"])  # last event of day by (ts, id)
        daily = g.groupby(g["ts"].dt.date).last()["v"]
        idx = pd.date_range(daily.index.min(), daily.index.max(), freq="D").date
        filled = daily.reindex(idx).ffill()
        for day, v in filled.items():
            want[(e, str(day))] = (float(v), int(day in set(daily.index)))
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),               # key
            st.integers(0, 15),              # day
            st.sampled_from(["A", "B", "C"]),  # attr
        ),
        min_size=1,
        max_size=30,
    )
)
def test_scd2_matches_python_reference(spark, changes):
    """scd2_intervals ≡ a sequential fold over the (ts, id)-ordered
    change stream, on arbitrary histories (duplicate days, re-visited
    attributes, single-row keys)."""
    import datetime as dt

    from big_data_processing_spark.operators.timeseries import scd2_intervals

    base = dt.datetime(2024, 5, 1)
    rows = [
        (k, attr, base + dt.timedelta(days=d), i)
        for i, (k, d, attr) in enumerate(changes)
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, id long")
    got = {
        (r.key, r.attr, r.anchor, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd2_intervals(df, "k", "attr", "ts", "id").collect()
    }

    want = set()
    bykey: dict[int, list] = {}
    for k, attr, ts, i in rows:
        bykey.setdefault(k, []).append((ts, i, attr))
    for k, seq in bykey.items():
        seq.sort()
        kept = [
            (ts, i, attr)
            for j, (ts, i, attr) in enumerate(seq)
            if j == 0 or seq[j - 1][2] != attr
        ]
        for j, (ts, i, attr) in enumerate(kept):
            nxt = kept[j + 1][0].date().isoformat() if j + 1 < len(kept) else "9999-12-31"
            want.add(
                (k, attr, i, ts.date().isoformat(), nxt, int(j + 1 == len(kept)))
            )
    assert got == want


def test_new_operators_empty_input(spark):
    """Empty inputs: heavy hitters, gap-fill, and SCD2 return empty
    frames with the right schema instead of raising — a 100 TB
    pipeline's first run of the day often sees an empty partition."""
    from big_data_processing_spark.operators.heavyhitters import heavy_hitters_topk
    from big_data_processing_spark.operators.timeseries import (
        gap_fill_ffill,
        scd2_intervals,
    )

    empty_vals = spark.createDataFrame([], "v string")
    hh = heavy_hitters_topk(empty_vals, k=3, capacity=8)
    assert hh.collect() == [] and hh.columns == ["v", "n"]

    empty_ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, value double, event_id long"
    )
    gf = gap_fill_ffill(empty_ev, "user_id", "ts", "value", "event_id")
    assert gf.collect() == [] and gf.columns == [
        "entity", "day", "value_filled", "is_observed",
    ]

    empty_ch = spark.createDataFrame(
        [], "k long, attr string, ts timestamp, id long"
    )
    iv = scd2_intervals(empty_ch, "k", "attr", "ts", "id")
    assert iv.collect() == []


# ---------------------------------------------------------------------------
# Weighted sampling (Efraimidis-Spirakis A-ES, r6)
# ---------------------------------------------------------------------------


def _es_keyed(rows, salt=""):
    """Pure-Python model of weighted_sample_exact's rank keys: the
    exact same md5-derived uniform and exponential-rank formula."""
    import hashlib

    keyed = []
    for k, w in rows:
        if w is None or w <= 0:
            continue
        h = int(hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / float(1 << 32)
        keyed.append((u ** (1.0 / float(w)), k))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    return keyed


def test_weighted_sample_matches_python_model(spark):
    """The Spark draw must equal the Python model — for several salts
    and n values, including null/zero/negative weights being excluded.

    JVM Math.pow and CPython pow are each only ulp-accurate, so when
    the n-th and (n+1)-th model keys sit within float noise the strict
    set equality is relaxed to 'every selected key ranks at or above
    the boundary key minus 1 ulp-scale epsilon' (code-review r6: a
    boundary straddle within 1 ulp would flake the bitwise assert)."""
    from big_data_processing_spark.operators.sampling import weighted_sample_exact

    rows = [(f"doc{i}", float(1 + (i * 7) % 13)) for i in range(60)]
    # 0/negative/NULL/NaN weights must all be excluded — NaN passes a
    # bare w > 0 in Spark and then sorts FIRST under desc (r6 review)
    rows += [("dead0", 0.0), ("dead1", -2.0), ("dead2", None), ("dead3", float("nan"))]
    df = spark.createDataFrame(rows, "k string, w double")
    eps = 1e-12
    for salt in ("", "s1", "s2"):
        keyed = _es_keyed(rows, salt)
        model_key = {k: key for key, k in keyed}
        for n in (1, 5, 25):
            sel = weighted_sample_exact(df, "k", "w", n, salt=salt)
            got = [r.k for r in sel.select("k").collect()]
            assert len(got) == n
            assert sel.columns == ["k", "w"]  # no leaked temp column
            want = [k for _, k in keyed[:n]]
            gap = keyed[n - 1][0] - keyed[n][0] if len(keyed) > n else 1.0
            if gap > eps:
                assert sorted(got) == sorted(want), (salt, n)
            else:  # boundary ambiguity within float noise: rank containment
                floor = keyed[n - 1][0] - eps
                assert all(model_key[k] >= floor for k in got), (salt, n)


def test_weighted_sample_biases_toward_heavy_weights(spark):
    """Across independent salts, a 20x-weight key must be selected far
    more often than a 1x key (distribution sanity, not exactness)."""
    from big_data_processing_spark.operators.sampling import weighted_sample_exact

    rows = [("heavy", 20.0)] + [(f"light{i}", 1.0) for i in range(39)]
    df = spark.createDataFrame(rows, "k string, w double")
    hits = 0
    for s in range(30):
        sel = {
            r.k
            for r in weighted_sample_exact(df, "k", "w", 4, salt=f"t{s}")
            .select("k")
            .collect()
        }
        hits += "heavy" in sel
    # P(select) for the heavy key is ~20/59 per slot without
    # replacement (>75% over 4 slots); lights sit near 4/59 each.
    assert hits >= 18, hits


def test_weighted_sample_plan_is_take_ordered(spark):
    """The top-n must plan as TakeOrderedAndProject (per-partition
    heap), never a global sort or partitionless window."""
    from big_data_processing_spark.operators.sampling import weighted_sample_exact

    df = spark.range(10_000).selectExpr(
        "cast(id as string) k", "cast(1 + id % 7 as double) w"
    )
    plan = (
        weighted_sample_exact(df, "k", "w", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 5)), max_size=12),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 5)), max_size=12),
)
def test_multisets_equal_matches_exceptall_semantics(spark, a_rows, b_rows):
    """The one-job weighted-union equality must agree with the
    two-job exceptAll-both-directions definition on arbitrary
    multisets (duplicates included)."""
    from big_data_processing_spark.operators.util import multisets_equal

    schema = "x long, y long"
    a = spark.createDataFrame(a_rows, schema) if a_rows else spark.createDataFrame([], schema)
    b = spark.createDataFrame(b_rows, schema) if b_rows else spark.createDataFrame([], schema)
    truth = sorted(a_rows) == sorted(b_rows)
    assert multisets_equal(a, b) == truth


def _py_span_stats(docs, k=4):
    """Independent pure-Python duplicated-span reference: positional
    k-gram inverted index, dup = hash in >= 2 distinct docs, union of
    equal-length intervals via the sorted-gap identity."""
    import hashlib
    import re

    toks_by, index = {}, {}
    for did, text in docs:
        toks = re.split(r"\s+", text.lower())
        toks_by[did] = toks
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            index.setdefault(h, []).append((did, i + 1))
    dup_pos = {did: [] for did, _ in docs}
    for rows in index.values():
        if len({d for d, _ in rows}) >= 2:
            for d, p in rows:
                dup_pos[d].append(p)
    out = {}
    for did, _ in docs:
        ps = sorted(dup_pos[did])
        covered = spans = 0
        prev = None
        for p in ps:
            if prev is None or p - prev > k:
                spans += 1
            covered += k if prev is None else min(k, p - prev)
            prev = p
        out[did] = (len(toks_by[did]), len(ps), spans, covered)
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(documents())
def test_span_stats_match_python_reference(spark, docs):
    """duplicated_span_stats must agree with an independent per-corpus
    Python scan on arbitrary small corpora (the tiny alphabet makes
    cross-doc k-gram collisions likely, exercising merge geometry)."""
    from big_data_processing_spark.operators.dedup import duplicated_span_stats

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    # max_bucket_size=None: the pure-Python reference does not model
    # the bucket cap, so the operator must run uncapped here — with
    # the default cap this only passed because the documents()
    # strategy tops out below it, a silent coupling that would turn
    # into a flake if the strategy widened (ADVICE r11).
    got = {
        r.id: (r.n_tokens, r.n_dup_positions, r.n_spans, r.covered_tokens)
        for r in duplicated_span_stats(df, k=4, max_bucket_size=None).collect()
    }
    assert got == _py_span_stats(docs, k=4)


def test_span_merge_geometry(spark):
    """Hand-built multi-span case: two shared runs separated by unique
    filler must report exactly 2 maximal spans with the union-of-
    intervals token count, and the clean doc reports zeros (the
    fixture corpora only produce whole-doc single-span duplicates, so
    the merge arithmetic is pinned here)."""
    from big_data_processing_spark.operators.dedup import duplicated_span_stats

    s1 = "alpha beta gamma delta epsilon"  # 5 tokens: 2 grams at k=4
    s2 = "omega psi chi phi"  # 4 tokens: 1 gram at k=4
    docs = [
        (0, f"u0a u0b u0c {s1} u0d u0e u0f u0g {s2} u0h"),
        (1, f"v1a {s1} v1b v1c {s2}"),
        (2, "w2a w2b w2c w2d w2e w2f w2g w2h"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {r.id: r for r in duplicated_span_stats(df, k=4).collect()}
    # doc 0: s1 grams at pos 4,5 (covers tokens 4..8), s2 gram at pos
    # 13 (covers 13..16) -> 2 spans, 5 + 4 = 9 covered of 17 tokens
    assert (
        rows[0].n_tokens,
        rows[0].n_dup_positions,
        rows[0].n_spans,
        rows[0].covered_tokens,
    ) == (17, 3, 2, 9)
    assert rows[0].dup_coverage == 9 / 17
    # doc 1: same two runs at pos 2,3 and 9 -> 2 spans, 9 of 12
    assert (
        rows[1].n_tokens,
        rows[1].n_dup_positions,
        rows[1].n_spans,
        rows[1].covered_tokens,
    ) == (12, 3, 2, 9)
    # doc 2: clean -> zero-filled row still present (doc grain)
    assert (
        rows[2].n_tokens,
        rows[2].n_dup_positions,
        rows[2].n_spans,
        rows[2].covered_tokens,
        rows[2].dup_coverage,
    ) == (8, 0, 0, 0, 0.0)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(documents())
def test_span_cap_modes_identical(spark, docs):
    """cap_stats='salted' (the hot-gram straggler exit, r12) must be
    BIT-IDENTICAL to the default window form on arbitrary corpora —
    count/min/max are associative, so the two-level aggregate + join
    is a pure physical rewrite."""
    from big_data_processing_spark.operators.dedup import duplicated_span_stats

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = duplicated_span_stats(df, k=4, max_bucket_size=None).collect()
    b = duplicated_span_stats(
        df, k=4, max_bucket_size=None, cap_stats="salted"
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_span_cap_modes_identical_when_cap_bites(spark):
    """Both cap modes must drop EXACTLY the same over-cap buckets: a
    hot gram repeated across many docs (bucket size 12 > cap 10) is
    excluded from duplicated positions in both forms, while a
    below-cap shared run still counts."""
    from big_data_processing_spark.operators.dedup import duplicated_span_stats

    hot = "h1 h2 h3 h4"  # one k=4 gram per doc, 12 docs -> bucket 12
    cold = "c1 c2 c3 c4"
    docs = [(i, f"u{i}a {hot} u{i}b") for i in range(12)]
    docs += [(100, f"x {cold}"), (101, f"{cold} y")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for mode in ("window", "salted"):
        rows = {
            r.id: r
            for r in duplicated_span_stats(
                df, k=4, max_bucket_size=10, cap_stats=mode
            ).collect()
        }
        assert all(rows[i].n_dup_positions == 0 for i in range(12)), mode
        assert rows[100].n_dup_positions == 1 and rows[101].n_dup_positions == 1, mode
        assert rows[100].covered_tokens == 4, mode


def test_span_salted_plan_has_partial_aggregate(spark):
    """The salted form's whole point: the per-hash stats must come
    from a two-level aggregate (partial on (h, salt) → merge on h),
    never a Window over h — assert the optimized plan carries
    Aggregate nodes and NO window over the gram hash."""
    from big_data_processing_spark.operators.dedup import duplicated_span_stats

    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d f")], ["doc_id", "text"]
    )
    plan = (
        duplicated_span_stats(df, k=4, cap_stats="salted")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the alias is folded away in the optimized plan; the salt term
    # itself (pmod(hash(id, pos))) must sit in an Aggregate grouping
    assert "pmod(hash(id" in plan and "Aggregate" in plan, plan[:2000]
    # the only Window left is the per-doc lag/span merge on id
    import re

    for m in re.finditer(r"windowspecdefinition\(([^,)]+)", plan):
        assert m.group(1).startswith("id"), plan[:2000]


def test_span_stats_at_production_gram_size(spark):
    """The catalog entry runs k=8 against the short fixture docs; the
    production grain is k~50 tokens (Lee et al. 2022). Pin that the
    operator works unchanged at that grain: a 60-token verbatim block
    shared by two long docs is detected as one maximal span covering
    exactly the 60 shared tokens, and a doc shorter than k produces
    the zero-filled row instead of an error."""
    from big_data_processing_spark.operators.dedup import duplicated_span_stats

    k = 50
    shared = " ".join(f"s{i}" for i in range(60))
    doc_a = " ".join(f"a{i}" for i in range(70)) + " " + shared
    doc_b = shared + " " + " ".join(f"b{i}" for i in range(40))
    short = "too short for any gram"
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b), (2, short)], ["doc_id", "text"]
    )
    rows = {r.id: r for r in duplicated_span_stats(df, k=k).collect()}
    # 60 shared tokens at k=50 -> 11 duplicated gram positions per doc,
    # contiguous -> one span of exactly 60 covered tokens
    for did, n_tok in ((0, 130), (1, 100)):
        r = rows[did]
        assert (r.n_tokens, r.n_dup_positions, r.n_spans, r.covered_tokens) == (
            n_tok, 11, 1, 60,
        ), (did, tuple(r))
    assert (rows[2].n_dup_positions, rows[2].covered_tokens) == (0, 0)
    assert rows[2].n_tokens == 5
