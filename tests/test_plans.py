"""Physical-plan quality gates: filters reach the scan, partition
pruning fires on the (lang, warc_day) layout, small joins broadcast,
and the whole docs stage is codegen'd (no Python in the hot path)."""

import pytest
from pyspark.sql import functions as F

from datashare_extension_neo4j_spark.fixtures import (
    materialize_pages,
    reference_pages,
)
from datashare_extension_neo4j_spark.queries import kg_semi_join, tpch_q1


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    df = li.select("l_orderkey", "l_extendedprice").where(
        F.col("l_shipdate") < "1996-01-01"
    )
    plan = df.queryExecution().explainString("formatted") if False else _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: read schema contains only the 3 needed columns
    assert "l_comment" not in plan


def test_partition_pruning_on_pages(spark, tmp_path):
    out = str(tmp_path / "pages_part")
    materialize_pages(
        spark, "/root/testdata/sf0.001", out, multiplier=1, partitioned=True
    )
    pages = spark.read.parquet(out)
    pruned = pages.where(F.col("lang") == "en")
    plan = _plan(pruned)
    # hive-layout partition filter appears as a partition filter, and
    # the scan enumerates only lang=en directories
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:200]
    n_all = pages.count()
    n_en = pruned.count()
    assert 0 < n_en < n_all


def test_semi_join_strategy(spark):
    df = kg_semi_join(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "LeftSemi" in plan


def test_agg_pushes_partial(spark):
    df = tpch_q1(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    # partial (map-side) aggregation before the exchange
    assert "partial_" in plan.lower() or "HashAggregate" in plan


def test_docs_stage_no_python_udf(spark):
    """The document-node stage must be pure codegen — no ArrowEval/
    BatchEval python nodes (the RFC-2047 decode is native now)."""
    from datashare_extension_neo4j_spark.operators.documents import doc_nodes
    from datashare_extension_neo4j_spark.operators.extract import parse_pages

    pages = reference_pages(spark, n_docs=3)
    parsed = parse_pages(pages)
    # materialize parse output shape, then docs over a parquet scan
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        parsed.write.parquet(f"{d}/p")
        docs = doc_nodes(spark.read.parquet(f"{d}/p")).drop(
            "ann_mentions", "ann_edges"
        )
        plan = _plan(docs)
        assert "EvalPython" not in plan, plan
        # '*(n)' prefixes mark whole-stage-codegen'd operators
        assert "*(1)" in plan


@pytest.mark.parametrize("n", [4])
def test_alias_clustering(spark, n):
    from datashare_extension_neo4j_spark.operators.entities import alias_clusters

    rows = [
        ("john smith", "Person"),
        ("jon smith", "Person"),
        ("john smith", "Location"),  # other category: never merged
        ("completely different", "Person"),
    ]
    m = spark.createDataFrame(rows, "mentionNorm string, category string")
    out = {
        (r["mentionNorm"], r["category"]): r.asDict()
        for r in alias_clusters(m, jaccard_threshold=0.3).collect()
    }
    a = out[("john smith", "Person")]
    b = out[("jon smith", "Person")]
    assert a["canonicalNorm"] == b["canonicalNorm"]
    assert "jon smith" in a["aliases"] or "john smith" in b["aliases"]
    # cross-category never clustered together
    c = out[("john smith", "Location")]
    assert set(c["aliases"]) <= {"john smith"}
    d = out[("completely different", "Person")]
    assert d["canonicalNorm"] == "completely different"


def test_read_pages_source(spark, tmp_path):
    from datashare_extension_neo4j_spark.sources.pages import (
        count_pages,
        read_pages,
    )

    out = str(tmp_path / "pages_src")
    materialize_pages(
        spark, "/root/testdata/sf0.001", out, multiplier=1, partitioned=True
    )
    df = read_pages(spark, out, langs=["en", "de"], columns=["url", "lang"])
    assert set(df.columns) == {"url", "lang"}
    langs = {r["lang"] for r in df.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}
    assert count_pages(spark, out) > df.count() > 0
