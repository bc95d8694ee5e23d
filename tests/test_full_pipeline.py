"""Capstone: one call produces the reference's entire warehouse, with
the reference's output-shape invariants (table inventory and
cardinalities scaled to the fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_processing_spark.plans.pipeline import run_full_pipeline

from .weather_fixture import generate


def test_full_pipeline_builds_warehouse(spark, tmp_path):
    info = generate(str(tmp_path / "src"), years=(2012, 2013))
    paths = run_full_pipeline(
        spark,
        info["weather_csv"],
        info["location_csv"],
        str(tmp_path / "warehouse"),
    )
    # table inventory mirrors the reference warehouse
    # (DATA_ANALYSIS_TABLES_MAPPING.md:531-544)
    assert set(paths) == {
        "weather_fact",
        "locations",
        "district_monthly_weather",
        "highest_precipitation",
        "top_temperate_cities",
        "evapotranspiration_by_season",
        "radiation_analysis",
        "weekly_max_temp_hottest_months",
        "ml_feature_statistics",
        "ml_model_performance",
        "et_model",
    }
    n_months = 2 * 12
    counts = {
        "weather_fact": info["n_clean_weather"],
        "district_monthly_weather": 27 * n_months,
        "highest_precipitation": 1,
        "top_temperate_cities": 10,
        "radiation_analysis": n_months,
        "ml_feature_statistics": 12 * 4,  # (month, feature) keyed, ref contract
        "ml_model_performance": 1,
        "locations": 27,
    }
    for name, expected in counts.items():
        got = spark.read.parquet(paths[name]).count()
        assert got == expected, f"{name}: {got} != {expected}"

    # fact partitioned by year → pruning works
    fact = spark.read.parquet(paths["weather_fact"])
    assert set(r.year for r in fact.select("year").distinct().collect()) == {2012, 2013}

    # model performance row carries the full reference contract
    # (train_et_model.py:72-90): metrics + features + coefficients
    perf = spark.read.parquet(paths["ml_model_performance"]).first()
    assert perf.rmse > 0 and perf.mae > 0 and -1.0 < perf.r2 <= 1.0
    assert perf.train_size > 0 and perf.test_size > 0
    assert (perf.feature_1, perf.feature_2, perf.feature_3) == (
        "sunshine_hours",
        "precipitation_sum",
        "wind_speed_10m_max",
    )
    import math

    for c in (perf.coefficient_1, perf.coefficient_2, perf.coefficient_3, perf.intercept):
        assert math.isfinite(c)

    # persisted model is loadable and predicts
    from big_data_processing_spark.ml.pipeline import load_model, predict_single

    model = load_model(paths["et_model"])
    assert isinstance(predict_single(model, spark, 8.0, 5.0, 12.0), float)


def test_pii_scrub_leaves_no_matches(spark, sf_dir):
    """After redaction, re-scanning the scrubbed text with the same
    regexes must find ZERO matches — the scrub is complete, not just
    counted."""
    from pyspark.sql import functions as F

    from big_data_processing_spark.plans.catalog_ext import (
        _PII_EMAIL_RE,
        _PII_EMOD,
        _PII_PHONE_RE,
        _PII_PMOD,
        _PII_UMOD,
        _PII_URL_RE,
        _t,
    )

    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % _PII_EMOD == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@mail.example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % _PII_UMOD == 0,
            F.concat(F.lit(" ref https://data.example.org/doc/"), did.cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            did % _PII_PMOD == 0,
            F.concat(F.lit(" call 555-010-"), F.lpad((did % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL_RE, "<email>"), _PII_URL_RE, "<url>"
        ),
        _PII_PHONE_RE,
        "<phone>",
    )
    residuals = d.select(
        (
            F.regexp_count(clean, F.lit(_PII_EMAIL_RE))
            + F.regexp_count(clean, F.lit(_PII_URL_RE))
            + F.regexp_count(clean, F.lit(_PII_PHONE_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("total")).first()
    assert residuals.total == 0


def test_curation_pipeline_statuses_partition_corpus(spark, sf_dir):
    """Every document lands in exactly one funnel status — the summary
    counts must sum to the corpus size."""
    from big_data_processing_spark.plans.catalog_ext import (
        curation_pipeline_summary,
        _t,
    )

    total = _t(spark, sf_dir, "documents").count()
    rows = curation_pipeline_summary(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == total
    assert {r.status for r in rows} <= {
        "eval_holdout",
        "low_quality",
        "duplicate",
        "contaminated",
        "kept",
    }
    assert any(r.status == "kept" for r in rows)


def test_curation_pipeline_materializes_consistent_corpus(spark, sf_dir, tmp_path):
    """The written corpus must agree with the hash-checked summary:
    kept rows on disk == 'kept' count in the report, splits partition
    the kept set, and split=train reads prune to the train partition."""
    from pyspark.sql import functions as F

    from big_data_processing_spark.plans.curation import (
        read_curated_split,
        run_curation_pipeline,
    )

    paths = run_curation_pipeline(spark, sf_dir, str(tmp_path / "out"))
    curated = spark.read.parquet(paths["curated_documents"])
    report = spark.read.parquet(paths["curation_report"])

    kept_in_report = (
        report.filter(F.col("status") == "kept").agg(F.sum("n_docs")).first()[0]
    )
    assert curated.count() == kept_in_report
    assert set(r.split for r in curated.select("split").distinct().collect()) <= {
        "train",
        "validation",
        "test",
    }

    train = read_curated_split(spark, paths["curated_documents"], "train")
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan
    assert train.count() > 0
    # quality gate actually held
    assert curated.agg(F.min("quality_score")).first()[0] >= 0.45
