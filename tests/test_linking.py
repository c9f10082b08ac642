"""Entity-link scoring (operators/linking.py): scorer-path equality,
oracle parity (including a binding blocking cap), and ranking sanity.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _duck(sf=SF_DIR):
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_linking_oracle_parity(spark):
    from datashare_extension_neo4j_spark.queries import (
        ORACLE_KG_ENTITY_LINKING,
        kg_entity_linking,
    )

    got = (
        kg_entity_linking(spark, SF_DIR)
        .toPandas()
        .sort_values("mention_id")
        .reset_index(drop=True)
    )
    want = (
        _duck()
        .execute(ORACLE_KG_ENTITY_LINKING)
        .df()
        .sort_values("mention_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("mention_id", "entityId", "linkedNorm"):
        assert got[c].tolist() == want[c].tolist(), c
    assert (got["score"] - want["score"]).abs().max() == 0.0
    # exact-surface-form mentions must link to themselves
    assert (got["mentionNorm"] == got["linkedNorm"]).all()


def test_udf_scorer_equals_column_scorer(spark):
    """The vectorized pandas-UDF scorer (the learned-model slot) must
    produce the identical links and scores as the JVM-expression
    path."""
    from datashare_extension_neo4j_spark.operators.linking import (
        link_mentions,
    )
    from datashare_extension_neo4j_spark.queries import _mentions

    m = _mentions(spark, SF_DIR)
    col_path = {
        r["mention_id"]: (r["linkedNorm"], r["score"])
        for r in link_mentions(m, scorer="column").collect()
    }
    udf_path = {
        r["mention_id"]: (r["linkedNorm"], r["score"])
        for r in link_mentions(m, scorer="udf").collect()
    }
    assert col_path == udf_path and len(col_path) > 0


def test_linking_cap_binds_consistently(spark):
    """With a binding bigram-bucket cap, Spark and a cap-adjusted
    oracle must still agree (mirrored-cap discipline)."""
    from datashare_extension_neo4j_spark.operators.linking import (
        link_mentions,
    )
    from datashare_extension_neo4j_spark.queries import (
        ORACLE_KG_ENTITY_LINKING,
        _mentions,
    )

    got = (
        link_mentions(_mentions(spark, SF_DIR), max_bucket=2)
        .toPandas()
        .sort_values("mention_id")
        .reset_index(drop=True)
    )
    oracle = ORACLE_KG_ENTITY_LINKING.replace(
        "HAVING count(*) <= 1000", "HAVING count(*) <= 2"
    )
    assert oracle != ORACLE_KG_ENTITY_LINKING, "cap not in oracle"
    want = (
        _duck()
        .execute(oracle)
        .df()
        .sort_values("mention_id")
        .reset_index(drop=True)
    )
    assert got["mention_id"].tolist() == want["mention_id"].tolist()
    assert got["linkedNorm"].tolist() == want["linkedNorm"].tolist()


def test_linked_appears_in_roundtrip(spark):
    """Typo-injected mentions linked against the clean KB must
    aggregate back to EXACTLY the clean APPEARS_IN edges — linking
    undoes the noise."""
    from pyspark.sql import functions as F

    from datashare_extension_neo4j_spark.queries import (
        kg_appears_in,
        kg_linked_appears_in,
    )

    got = sorted(
        (r["linkedNorm"], r["endId"], r["category"], r["mentionCount"])
        for r in kg_linked_appears_in(spark, SF_DIR).collect()
    )
    clean = sorted(
        (r["mentionNorm"], r["endId"], r["category"], r["mentionCount"])
        for r in kg_appears_in(spark, SF_DIR)
        .select("mentionNorm", "endId", "category", "mentionCount")
        .collect()
    )
    assert got == clean and len(got) > 0
    # the noise is real: the noisy stream contains surface forms the
    # clean KB does not
    from datashare_extension_neo4j_spark.queries import _mentions

    m = _mentions(spark, SF_DIR)
    n_noised = m.where(F.col("offset") % 7 == 0).count()
    assert n_noised > 0


def test_linked_appears_in_oracle_parity(spark):
    from datashare_extension_neo4j_spark.queries import (
        ORACLE_KG_LINKED_APPEARS_IN,
        kg_linked_appears_in,
    )

    got = sorted(
        tuple(r)
        for r in kg_linked_appears_in(spark, SF_DIR)
        .select(
            "startId", "endId", "type", "linkedNorm", "category",
            "mentionCount",
        )
        .collect()
    )
    want = sorted(
        map(
            tuple,
            _duck().execute(ORACLE_KG_LINKED_APPEARS_IN).fetchall(),
        )
    )
    assert got == want and len(got) > 0


def test_near_miss_surface_form_links_to_closest_entity(spark):
    """Against an external KB (the real linking setup), a misspelled
    mention must link to the bigram-closest canonical entity of the
    same category; with self-derived entities it self-links (the
    reference's exact-key behavior)."""
    from datashare_extension_neo4j_spark.operators.linking import (
        link_mentions,
    )

    m = spark.createDataFrame(
        [
            ("m1", "doc-1", "acme corp", "ORG"),
            ("m2", "doc-2", "acme corp", "ORG"),
            ("m3", "doc-3", "acme cort", "ORG"),  # typo variant
            ("m4", "doc-4", "zzz inc", "ORG"),
            ("m5", "doc-5", "someone", "PERSON"),  # category not in KB
        ],
        "mention_id string, documentId string, mentionNorm string,"
        " category string",
    )
    kb = spark.createDataFrame(
        [("acme corp", "ORG", 2), ("zzz inc", "ORG", 1)],
        "entNorm string, category string, df long",
    )
    out = {
        r["mention_id"]: r["linkedNorm"]
        for r in link_mentions(m, entities=kb).collect()
    }
    assert out["m1"] == "acme corp"
    assert out["m3"] == "acme corp"  # typo resolves to the canonical
    assert out["m4"] == "zzz inc"
    # no ORG candidate for a PERSON mention → NIL row, not a drop
    assert "m5" in out and out["m5"] is None
    # self-derived entities: every exact surface form self-links
    self_out = {
        r["mention_id"]: r["linkedNorm"] for r in link_mentions(m).collect()
    }
    assert self_out["m3"] == "acme cort"

    # a null-df KB row (arbitrary user parquet) must not crash either
    # scorer, must score null, and both paths must still agree
    kb_null = kb.unionByName(
        spark.createDataFrame(
            [("acme corpse", "ORG", None)],
            "entNorm string, category string, df long",
        )
    )
    col_rows = {
        r["mention_id"]: (r["linkedNorm"], r["score"])
        for r in link_mentions(m, entities=kb_null).collect()
    }
    udf_rows = {
        r["mention_id"]: (r["linkedNorm"], r["score"])
        for r in link_mentions(m, entities=kb_null, scorer="udf").collect()
    }
    assert col_rows == udf_rows
    assert col_rows["m1"][0] == "acme corp"  # null-df row never wins
