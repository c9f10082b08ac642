"""Local replica of the driver's oracle gate for the flagship.

The driver runs every ``queries()`` entry against its ``oracle_sql()``
in DuckDB at sf0.01 and hash-compares values. ``kg_full_pipeline`` is
the one entry that exercises the whole engine (mapInPandas HTML parse
→ rule NER → APPEARS_IN aggregation), so its oracle — which rebuilds
the rule NER's character offsets in SQL from the deterministic page
carrier — is guarded here at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "name",
    [
        "kg_full_pipeline",
        "kg_appears_in",
        "dedup_minhash_assign",
        "decontaminate_ngram",
        "kg_entity_pagerank",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "media_embed_neardup",
        "events_funnel",
        "tfidf_topterms",
    ],
)
def test_oracle_parity(spark, name):
    from datashare_extension_neo4j_spark.queries import QUERIES

    fn, oracle = QUERIES[name]
    got = _canon(fn(spark, SF_DIR).toPandas())
    con = duckdb.connect()
    for tbl in ("documents", "embeddings", "events"):
        con.execute(
            f"create view {tbl} as select * from "
            f"read_parquet('{SF_DIR}/{tbl}.parquet')"
        )
    want = _canon(con.execute(oracle).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) and len(got) > 0
    assert got.equals(want)
