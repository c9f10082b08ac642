"""Typed relation extraction (kg_typed_relations) and triangle
counting (kg_triangle_count): crafted-corpus semantics on top of the
registry-wide oracle parity that tests/test_oracle_parity.py already
replays for both entries.

Covers: window cut-off (gap > W emits nothing; gap == W, which crosses
a bucket boundary in the banded join, emits), canonical subj/obj
direction (text order never leaks into the triple), the predicate map
per category pair, same-entity self-pair exclusion, and a known
triangle with an isolated vertex.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_typed_relations_semantics(spark, tmp_path):
    from datashare_extension_neo4j_spark.queries import kg_typed_relations

    sf = _write_docs(
        tmp_path,
        [
            "customer spark",                # P-O gap 1
            "customer aa bb cc dd ee spark", # gap 6 > window: no pair
            "spark customer",                # O first: direction canonical
            "customer supplier",             # P-P
            "spark spark",                   # same entity: excluded
            "window table",                  # L-L
            "stream batch",                  # L then O: subj is the ORG
            "customer aa bb cc dd spark",    # gap == 5 (bucket boundary)
        ],
    )
    got = {
        (r["subj"], r["predicate"], r["obj"]): (
            r["nMentionPairs"],
            r["nDocs"],
            r["minGap"],
        )
        for r in kg_typed_relations(spark, sf).collect()
    }
    assert got == {
        ("customer/PERSON", "AFFILIATED_WITH", "spark/ORGANIZATION"):
            (3, 3, 1),
        ("customer/PERSON", "ASSOCIATED_WITH", "supplier/PERSON"): (1, 1, 1),
        ("table/LOCATION", "NEAR", "window/LOCATION"): (1, 1, 1),
        ("batch/ORGANIZATION", "BASED_IN", "stream/LOCATION"): (1, 1, 1),
    }


def test_relation_surface_semantics(spark, tmp_path):
    """Most frequent intervening token sequence wins per directed
    pair; direction follows text order; doubled spaces yield an empty
    surface candidate (positions index the raw split) but never beat
    a repeated real surface."""
    from datashare_extension_neo4j_spark.queries import kg_relation_surface

    sf = _write_docs(
        tmp_path,
        [
            "customer works at spark",
            "customer works at spark",
            "customer sits near spark",
            "customer  spark",          # doubled space: empty surface
            "spark hires customer",     # reverse text order: own row
        ],
    )
    got = {
        (r["subj"], r["obj"]): (r["surfaceForm"], r["nPairs"])
        for r in kg_relation_surface(spark, sf).collect()
    }
    assert got == {
        ("customer/PERSON", "spark/ORGANIZATION"): ("works at", 2),
        ("spark/ORGANIZATION", "customer/PERSON"): ("hires", 1),
    }


def test_link_prediction_path_graph(spark, tmp_path):
    """Path a—b—c: the only candidate is (a, c) through middle b with
    commonNeighbors=1, jaccard=1/(1+1-1)=1.0, adamicAdar=1/ln(2);
    existing edges are excluded; a hub cap below the middle's degree
    suppresses the wedge entirely."""
    import math

    from datashare_extension_neo4j_spark.queries import kg_link_prediction

    sf = _write_docs(
        tmp_path,
        [
            "customer supplier",  # a-b
            "supplier spark",     # b-c
        ],
    )
    rows = kg_link_prediction(spark, sf).collect()
    assert [
        (
            r["entityA"], r["entityB"], r["commonNeighbors"],
            r["jaccard"], r["adamicAdar"],
        )
        for r in rows
    ] == [
        (
            "customer/PERSON", "spark/ORGANIZATION", 1, 1.0,
            round(1.0 / math.log(2.0), 6),
        )
    ]
    assert kg_link_prediction(spark, sf, max_wedge_degree=1).count() == 0


def test_triangle_count_known_graph(spark, tmp_path):
    from datashare_extension_neo4j_spark.queries import kg_triangle_count

    # customer-supplier-spark form a triangle via three pairwise docs;
    # window is mentioned but never co-occurs (isolated vertex).
    sf = _write_docs(
        tmp_path,
        [
            "customer supplier",
            "customer spark",
            "supplier spark",
            "window",
        ],
    )
    got = {
        r["entity"]: (r["degree"], r["nTriangles"], r["clusterCoeff"])
        for r in kg_triangle_count(spark, sf).collect()
    }
    assert got == {
        "customer/PERSON": (2, 1, 1.0),
        "supplier/PERSON": (2, 1, 1.0),
        "spark/ORGANIZATION": (2, 1, 1.0),
        "window/LOCATION": (0, 0, 0.0),
    }


def test_graph_query_plans_stay_truncated(spark, tmp_path):
    """Regression guard for the multi-reference plan blowup: without
    the eager checkpoints on the vocab-sized edge frames,
    kg_triangle_count compiled to ~474 exchanges and
    kg_link_prediction to ~208 (the mention-scan → co-occurrence
    subplan re-instantiated per reference). The checkpointed plans sit
    at 7 and 11; bound with headroom so legitimate small changes
    don't flap the test."""
    from datashare_extension_neo4j_spark.queries import (
        kg_link_prediction,
        kg_triangle_count,
    )

    sf = _write_docs(
        tmp_path,
        ["customer supplier", "customer spark", "supplier spark"],
    )
    for fn, bound in ((kg_triangle_count, 20), (kg_link_prediction, 30)):
        plan = (
            fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        )
        n = plan.count("Exchange hashpartitioning") + plan.count(
            "Exchange rangepartitioning"
        )
        assert n <= bound, f"{fn.__name__}: {n} exchanges"


def test_entity_salience_ranking(spark, tmp_path):
    """tf × smoothed-idf ranks the doc-specific entity above the
    corpus-ubiquitous one; every doc gets its own ranked list."""
    import math

    from datashare_extension_neo4j_spark.queries import kg_entity_salience

    sf = _write_docs(
        tmp_path,
        ["customer customer spark", "spark", "spark"],
    )
    got = {
        (r["documentId"], r["entity"]): (r["tf"], r["salience"], r["rank"])
        for r in kg_entity_salience(spark, sf).collect()
    }
    two_ln2 = round(2 * math.log(4 / 2), 6)
    assert got == {
        ("doc-0", "customer/PERSON"): (2, two_ln2, 1),
        ("doc-0", "spark/ORGANIZATION"): (1, 0.0, 2),
        ("doc-1", "spark/ORGANIZATION"): (1, 0.0, 1),
        ("doc-2", "spark/ORGANIZATION"): (1, 0.0, 1),
    }
