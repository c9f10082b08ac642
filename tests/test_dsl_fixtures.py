"""Verbatim replay of the reference's 19 DSL JSON fixtures
(src/test/resources/neo4j_utils/*.json + objects/*.json), asserted per
the Java tests (Neo4jUtilsTest.java:225-480, ObjectsTest.java:49-118):
each fixture either compiles to the DataFrame equivalent of the
expected Cypher, or raises a DSLError carrying the reference's message.
"""

import json
from pathlib import Path

import pytest

from datashare_extension_neo4j_spark.plans.dsl import (
    DSLError,
    GraphTables,
    compile_dump_query,
    compile_query,
)

NEO4J_UTILS = Path("/root/reference/src/test/resources/neo4j_utils")
OBJECTS = Path("/root/reference/src/test/resources/objects")

pytestmark = pytest.mark.skipif(
    not NEO4J_UTILS.is_dir(), reason="reference fixture dir unavailable"
)


def load(d: Path, name: str) -> dict:
    return json.loads((d / f"{name}.json").read_text())


@pytest.fixture(scope="module")
def g(spark):
    """Graph sized so each fixture's expected Cypher has a known
    answer: APPEARS_IN edges go entity→doc (reference orientation),
    LINKED is an extra symmetric-test edge type."""
    nodes = spark.createDataFrame(
        [
            ("doc-0", ["Document"],
             {"id": "someId", "path": "some_path", "name": "other",
              "created": "someDate"}),
            ("doc-1", ["Document", "Important"],
             {"id": "id-1someSuffix", "path": "some/path/prefix/x",
              "name": "some_name", "created": "someDate"}),
            ("doc-2", ["Document"],
             {"id": "somePrefix-2", "path": "b/2", "name": "some_prefixed",
              "created": "otherDate"}),
            ("ne-1", ["NamedEntity", "Person"],
             {"mentionNorm": "keanu reeves", "docId": "someId"}),
            ("ne-2", ["NamedEntity", "EMAIL"],
             {"mentionNorm": "dev@icij.org", "docId": "nope"}),
        ],
        "node_id string, labels array<string>, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("ne-1", "doc-0", "APPEARS_IN", {"mentionCount": "2"}),
            ("ne-1", "doc-1", "APPEARS_IN", {"mentionCount": "1"}),
            ("ne-2", "doc-1", "SENT", None),
            ("doc-2", "ne-2", "LINKED", None),
        ],
        "src string, dst string, type string, props map<string,string>",
    )
    return GraphTables(nodes=nodes, edges=edges)


def path_query(fixture: dict, **kw) -> dict:
    q = {"matches": [{"path": fixture["path"]}]}
    q.update(kw)
    return q


# --------------------------------------------------- path_pattern_*.json


def test_path_pattern_from(g):
    """Expected Cypher: MATCH (doc)<-[rel:`APPEARS_IN`]-(person) —
    'from' = edge src is the RIGHT node (Neo4jUtilsTest.java:239)."""
    fx = load(NEO4J_UTILS, "path_pattern_from")
    out = compile_query(g, path_query(fx)).collect()
    got = {(r["person"]["node_id"], r["doc"]["node_id"]) for r in out}
    # unlabeled vars: person binds edge sources, doc binds edge dests
    assert got == {("ne-1", "doc-0"), ("ne-1", "doc-1")}


def test_path_pattern_to(g):
    """MATCH (person)-[rel:`APPEARS_IN`]->(doc)
    (Neo4jUtilsTest.java:258)."""
    fx = load(NEO4J_UTILS, "path_pattern_to")
    out = compile_query(g, path_query(fx)).collect()
    got = {(r["person"]["node_id"], r["doc"]["node_id"]) for r in out}
    assert got == {("ne-1", "doc-0"), ("ne-1", "doc-1")}


def test_path_pattern_between(g):
    """MATCH (person)-[rel:`LINKED`]-(doc) — undirected: both
    orientations (Neo4jUtilsTest.java:277)."""
    fx = load(NEO4J_UTILS, "path_pattern_between")
    out = compile_query(g, path_query(fx)).collect()
    got = {(r["person"]["node_id"], r["doc"]["node_id"]) for r in out}
    assert got == {("doc-2", "ne-2"), ("ne-2", "doc-2")}


def test_path_pattern_without_names_and_types(g):
    """MATCH ()-->() (Neo4jUtilsTest.java:297): anonymous nodes, all
    edge types, one row per directed edge; nothing is returned."""
    fx = load(NEO4J_UTILS, "path_pattern_without_names_and_types")
    df = compile_query(g, path_query(fx))
    assert df.count() == 4  # every edge once, 'to' orientation
    assert df.columns == []  # RETURN * returns no anonymous parts


def test_path_pattern_with_missing_relationships(g):
    fx = load(NEO4J_UTILS, "path_pattern_with_missing_relationships")
    with pytest.raises(
        DSLError,
        match="Invalid number of nodes and relationships, found 2 nodes"
        " and 0 relationships",
    ):
        compile_query(g, path_query(fx))


def test_path_pattern_with_too_many_relationships(g):
    fx = load(NEO4J_UTILS, "path_pattern_with_too_many_relationships")
    with pytest.raises(
        DSLError,
        match="Invalid number of nodes and relationships, found 2 nodes"
        " and 2 relationships",
    ):
        compile_query(g, path_query(fx))


# --------------------------------------------------------- query_*.json


def test_query_missing_matches(g):
    with pytest.raises(DSLError, match="missing matches"):
        compile_query(g, load(NEO4J_UTILS, "query_missing_matches"))


def test_query_empty_matches(g):
    with pytest.raises(DSLError, match="empty matches"):
        compile_query(g, load(NEO4J_UTILS, "query_empty_matches"))


def test_query_optional_match(g):
    """OPTIONAL MATCH (person:`Person`) RETURN *
    (Neo4jUtilsTest.java:342): leading optional is allowed — matches,
    or one all-null row when none."""
    fx = load(NEO4J_UTILS, "query_optional_match")
    out = compile_query(g, fx).collect()
    assert [r["person"]["node_id"] for r in out] == ["ne-1"]
    # and the empty case yields exactly one null row
    empty = dict(fx)
    empty["matches"] = [
        {"path": {"optional": True,
                  "nodes": [{"name": "x", "labels": ["NoSuchLabel"]}]}}
    ]
    rows = compile_query(g, empty).collect()
    assert len(rows) == 1 and rows[0]["x"] is None


# --------------------------------------------------------- where_*.json


def q_docs(where: dict) -> dict:
    return {
        "matches": [
            {"path": {"nodes": [{"name": "doc", "labels": ["Document"]}]}}
        ],
        "where": where,
    }


def test_where_starts_with(g):
    """WHERE doc.id STARTS WITH 'somePrefix'
    (Neo4jUtilsTest.java:452)."""
    out = compile_query(g, q_docs(load(NEO4J_UTILS, "where_starts_with"))).collect()
    assert [r["doc"]["node_id"] for r in out] == ["doc-2"]


def test_where_ends_with(g):
    """WHERE doc.id ENDS WITH 'someSuffix' (Neo4jUtilsTest.java:471)."""
    out = compile_query(g, q_docs(load(NEO4J_UTILS, "where_ends_with"))).collect()
    assert [r["doc"]["node_id"] for r in out] == ["doc-1"]


def test_where_not(g):
    """WHERE NOT (doc.id = 'someId') (Neo4jUtilsTest.java:434)."""
    out = compile_query(g, q_docs(load(NEO4J_UTILS, "where_not"))).collect()
    assert {r["doc"]["node_id"] for r in out} == {"doc-1", "doc-2"}


def test_where_nested_conditions(g):
    """WHERE (doc.path = 'some_path' AND (doc.id = 'some_id' OR
    doc.name = 'some_name' OR doc.name STARTS WITH 'some_prefix'))
    (Neo4jUtilsTest.java:389-395)."""
    out = compile_query(
        g, q_docs(load(NEO4J_UTILS, "where_nested_conditions"))
    ).collect()
    # doc-0: path matches and name 'other' fails all ors → excluded;
    # only a doc with path some_path AND an or-branch passes → none
    # here except if name matched; doc-0 name is 'other' → empty
    assert out == []
    # positive control: flip doc-0's name in a modified where
    fx = load(NEO4J_UTILS, "where_nested_conditions")
    fx["and"][1]["or"].append(
        {"startsWith": {"property": {"variable": "doc", "name": "name"},
                        "value": {"literal": "oth"}}}
    )
    out2 = compile_query(g, q_docs(fx)).collect()
    assert [r["doc"]["node_id"] for r in out2] == ["doc-0"]


def test_where_variable_properties(g):
    """WHERE person.docId = doc.id — property-to-property comparison
    across variables (Neo4jUtilsTest.java:413-417)."""
    fx = load(NEO4J_UTILS, "where_variable_properties")
    q = {
        "matches": [
            {"path": {"nodes": [{"name": "doc", "labels": ["Document"]}]}},
            {"path": {"nodes": [{"name": "person", "labels": ["NamedEntity"]}]}},
        ],
        "where": fx,
    }
    out = compile_query(g, q).collect()
    got = {(r["person"]["node_id"], r["doc"]["node_id"]) for r in out}
    assert got == {("ne-1", "doc-0")}


# ------------------------------------------------------ objects/*.json


def test_dump_query(g):
    """MATCH (doc:`Document`:`Important` {created: 'someDate'}) WHERE
    doc.path STARTS WITH 'some/path/prefix' ... (ObjectsTest.java:84)."""
    nodes, edges = compile_dump_query(g, load(OBJECTS, "dump_query"))
    ids = {r["node_id"] for r in nodes.collect()}
    # doc-1 matches; its APPEARS_IN/SENT neighbours come along
    assert ids == {"doc-1", "ne-1", "ne-2"}
    e = {(r["src"], r["dst"], r["type"]) for r in edges.collect()}
    assert e == {("ne-1", "doc-1", "APPEARS_IN"), ("ne-2", "doc-1", "SENT")}


def test_dump_query_empty_queries(g):
    """{"queries": []} → the default document dump compiles."""
    nodes, _ = compile_dump_query(g, load(OBJECTS, "dump_query_empty_queries"))
    assert {r["node_id"] for r in nodes.collect()} >= {"doc-0", "doc-1", "doc-2"}


def test_dump_query_without_queries(g):
    """{} → default dump (ObjectsTest.java:110-117)."""
    nodes, _ = compile_dump_query(g, load(OBJECTS, "dump_query_without_queries"))
    assert nodes.count() == 5  # 3 docs + both attached entities


def test_dump_query_without_matches(g):
    nodes, _ = compile_dump_query(g, load(OBJECTS, "dump_query_without_matches"))
    assert nodes.count() == 5


def test_dump_query_several_queries(g):
    with pytest.raises(
        DSLError,
        match="expected a single query matching documents to be specified",
    ):
        compile_dump_query(g, load(OBJECTS, "dump_query_several_queries"))
