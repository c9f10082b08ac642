"""Incremental import semantics — re-import updates, not duplicates
(reference tests/core/neo4j/test_documents.py:56-141) and counters
shaped like ImportSummary (imports.py:130-135)."""

from pyspark.sql import functions as F

from datashare_extension_neo4j_spark.fixtures import reference_pages
from datashare_extension_neo4j_spark.manifest import run_pipeline
from datashare_extension_neo4j_spark.sinks.tables import incremental_import


def test_reimport_updates_not_duplicates(spark, tmp_path):
    pages_all = reference_pages(spark, n_docs=12)
    first = pages_all.where(
        F.regexp_extract("url", r"example-(\d+)", 1).cast("int") < 8
    )
    pages_path = str(tmp_path / "pages1")
    first.write.parquet(pages_path)
    run_dir = str(tmp_path / "run")
    run_pipeline(spark, pages_path, run_dir)
    n_docs_1 = spark.read.parquet(f"{run_dir}/docs").count()
    assert n_docs_1 == 8

    # 1) re-import the SAME pages: counts unchanged, zero created
    c = incremental_import(spark, first, run_dir)
    assert c["imported"] == 8
    assert c["nodes_created"] == 0
    assert c["relationships_created"] == 0
    assert c["entities_created"] == 0
    assert spark.read.parquet(f"{run_dir}/docs").count() == 8
    assert (
        spark.read.parquet(f"{run_dir}/docs").select("id").distinct().count() == 8
    )

    # 2) import the remaining 4 docs: created counts = the delta
    c2 = incremental_import(spark, pages_all, run_dir)
    assert c2["imported"] == 12
    assert c2["nodes_created"] == 4
    assert c2["relationships_created"] > 0
    docs = spark.read.parquet(f"{run_dir}/docs")
    assert docs.count() == 12
    assert docs.select("id").distinct().count() == 12
    # edges merged, no duplicate keys
    a = spark.read.parquet(f"{run_dir}/appears_in")
    assert (
        a.groupBy("startId", "endId").count().where("count > 1").count() == 0
    )
    # emails merged too (fixture attaches SENT/RECEIVED to doc-11,
    # which only arrives in the second batch — a stale emails table
    # would still be empty here)
    emails = spark.read.parquet(f"{run_dir}/emails")
    got = {r["type"]: r["fields"] for r in emails.collect()}
    assert got == {
        "SENT": ["tika_metadata_message_from"],
        "RECEIVED": ["tika_metadata_message_to"],
    }

    # 3) idempotence: repeating the full import changes nothing
    c3 = incremental_import(spark, pages_all, run_dir)
    assert c3["nodes_created"] == 0
    assert c3["relationships_created"] == 0
    assert spark.read.parquet(f"{run_dir}/emails").count() == 2
