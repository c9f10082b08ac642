"""Classifier quality filtering (functions/classifier.py): the in-plan
hashed-weight scorer vs the broadcast weight-table scorer, empty-doc
handling, and the zero-shuffle plan shape of the registry entry."""

from __future__ import annotations

from pyspark.sql import functions as F

from datashare_extension_neo4j_spark.functions.classifier import (
    md5_weight_table,
    quality_score_cols,
    score_with_weight_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_weight_table_path_equals_in_plan_path(spark):
    """With the md5-derived weight table, the production (broadcast
    join) scorer must produce EXACTLY the in-plan scorer's rows —
    proves a trained weight table swaps in without semantic drift."""
    d = _docs(spark)
    inplan = d.select("doc_id", *quality_score_cols(F.col("text")))
    tabled = score_with_weight_table(d, md5_weight_table(d))
    assert inplan.exceptAll(tabled).count() == 0
    assert tabled.exceptAll(inplan).count() == 0


def test_unknown_buckets_weigh_zero(spark):
    d = _docs(spark)
    empty_weights = md5_weight_table(d).where(F.lit(False))
    scored = score_with_weight_table(d, empty_weights)
    assert scored.where(F.col("scoreSum") != 0).count() == 0
    assert scored.where(~F.col("passes")).count() == 0


def test_empty_doc_scores_zero_and_passes(spark):
    d = spark.createDataFrame(
        [(1, "the fast key"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in d.select(
            "doc_id", *quality_score_cols(F.col("text"))
        ).collect()
    }
    assert rows[1].nTokens == 3
    assert rows[2].nTokens == 0 and rows[2].qualityScore == 0.0
    assert rows[2].passes
    # null text reads as the empty document — identical in the
    # weight-table path and the oracle (no null-parity divergence)
    assert rows[3].nTokens == 0 and rows[3].scoreSum == 0
    assert rows[3].qualityScore == 0.0 and rows[3].passes


def test_paths_equal_on_null_and_empty_text(spark):
    d = spark.createDataFrame(
        [(1, "the fast key"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    inplan = d.select("doc_id", *quality_score_cols(F.col("text")))
    tabled = score_with_weight_table(d, md5_weight_table(d))
    assert inplan.exceptAll(tabled).count() == 0
    assert tabled.exceptAll(inplan).count() == 0


def test_classifier_quality_plan_is_scan_shaped(spark):
    from datashare_extension_neo4j_spark.queries import classifier_quality

    plan = (
        classifier_quality(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan
