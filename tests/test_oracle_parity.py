"""Local replica of the driver's oracle gate — for EVERY registry
entry, not just the driver's 50-slot window.

The driver runs ``queries()`` entries against ``oracle_sql()`` in
DuckDB at sf0.01 and hash-compares values, but its correctness file
caps at 50 entries while the registry keeps growing — entries rotated
out of the window would otherwise go unverified between rounds. This
suite closes that gap: ``test_oracle_parity_all`` replays the exact
compare (sorted columns, stringified values, sorted rows) for ALL
registry entries at sf0.001, and ``test_oracle_parity_nonempty``
additionally pins the flagship entries to non-degenerate results.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# flagship entries that must produce non-degenerate (row-bearing)
# results at sf0.001 — a 0-row == 0-row "pass" would be vacuous here
NONEMPTY = {
    "web_link_edges",
    "web_host_graph",
    "web_host_pagerank",
    "web_host_hits",
    "web_url_canonical",
    "web_anchor_aliases",
    "web_domain_components",
    "crawl_latest_capture",
    "crawl_change_rate",
    "web_crawl_budget",
    "kg_entity_host_affinity",
    "web_crawl_waves",
    "kg_entity_timeline",
    "kg_entity_trend",
    "kg_full_pipeline",
    "kg_appears_in",
    "dedup_minhash_assign",
    "decontaminate_ngram",
    "kg_entity_pagerank",
    "kg_typed_relations",
    "kg_triangle_count",
    "kg_link_prediction",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "media_embed_neardup",
    "curate_corpus",
    "events_funnel",
    "tfidf_topterms",
}


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _duck():
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"create view {tbl} as select * from "
            f"read_parquet('{SF_DIR}/{tbl}.parquet')"
        )
    return con


def _all_names():
    from datashare_extension_neo4j_spark.queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _all_names())
def test_oracle_parity_all(spark, name):
    from datashare_extension_neo4j_spark.queries import QUERIES

    fn, oracle = QUERIES[name]
    got = _canon(fn(spark, SF_DIR).toPandas())
    want = _canon(_duck().execute(oracle).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert got.equals(want)
    if name in NONEMPTY:
        assert len(got) > 0


def test_registry_covers_driver_contract():
    """Every registry entry must round-trip through the driver entry
    points: a queries() callable AND an oracle_sql() string (the
    correctness gate's contract), with matching key sets."""
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    assert set(o) <= set(q)
    missing = set(q) - set(o)
    assert missing == set(), f"entries without an oracle: {missing}"
