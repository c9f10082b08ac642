"""DSL compiler semantics — modeled on the reference's fixture set
(src/test/resources/neo4j_utils/*.json, Neo4jUtilsTest.java) but
asserted against DataFrame results on a small known graph."""

import pytest

from datashare_extension_neo4j_spark.plans.dsl import (
    DSLError,
    GraphTables,
    compile_dump_query,
    compile_query,
)


@pytest.fixture(scope="module")
def g(spark):
    nodes = spark.createDataFrame(
        [
            ("doc-0", ["Document"], {"id": "doc-0", "path": "a/0", "contentType": "text/html"}),
            ("doc-1", ["Document"], {"id": "doc-1", "path": "a/1", "contentType": "message/rfc822"}),
            ("doc-2", ["Document", "Important"], {"id": "doc-2", "path": "b/2", "contentType": "text/html"}),
            ("ne-1", ["NamedEntity", "Person"], {"mentionNorm": "keanu reeves"}),
            ("ne-2", ["NamedEntity", "EMAIL"], {"mentionNorm": "dev@icij.org"}),
        ],
        "node_id string, labels array<string>, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("ne-1", "doc-0", "APPEARS_IN", {"mentionCount": "2"}),
            ("ne-1", "doc-2", "APPEARS_IN", {"mentionCount": "1"}),
            ("ne-2", "doc-1", "SENT", {"fields": "tika_metadata_message_from"}),
            ("doc-1", "doc-0", "HAS_PARENT", None),
        ],
        "src string, dst string, type string, props map<string,string>",
    )
    return GraphTables(nodes=nodes, edges=edges)


def q1(**kw):
    base = {
        "matches": [
            {"path": {"nodes": [{"name": "doc", "labels": ["Document"]}]}}
        ]
    }
    base.update(kw)
    return base


def test_single_node_match(g):
    out = compile_query(g, q1()).collect()
    assert {r["doc"]["node_id"] for r in out} == {"doc-0", "doc-1", "doc-2"}


def test_label_conjunction(g):
    q = {
        "matches": [
            {"path": {"nodes": [{"name": "d", "labels": ["Document", "Important"]}]}}
        ]
    }
    out = compile_query(g, q).collect()
    assert [r["d"]["node_id"] for r in out] == ["doc-2"]


def test_property_equality(g):
    q = {
        "matches": [
            {
                "path": {
                    "nodes": [
                        {
                            "name": "d",
                            "labels": ["Document"],
                            "properties": {"contentType": "message/rfc822"},
                        }
                    ]
                }
            }
        ]
    }
    assert [r["d"]["node_id"] for r in compile_query(g, q).collect()] == ["doc-1"]


def test_path_to_direction(g):
    # (person)-[rel:APPEARS_IN]->(doc): direction "to" = edge src is
    # the LEFT node (Neo4jUtils.java:793-804 relationshipTo)
    q = {
        "matches": [
            {
                "path": {
                    "nodes": [
                        {"name": "person", "labels": ["Person"]},
                        {"name": "doc", "labels": ["Document"]},
                    ],
                    "relationships": [
                        {"name": "rel", "direction": "to", "types": ["APPEARS_IN"]}
                    ],
                }
            }
        ]
    }
    out = compile_query(g, q).collect()
    assert {(r["person"]["node_id"], r["doc"]["node_id"]) for r in out} == {
        ("ne-1", "doc-0"),
        ("ne-1", "doc-2"),
    }


def test_path_between_direction(g):
    q = {
        "matches": [
            {
                "path": {
                    "nodes": [
                        {"name": "doc", "labels": ["Document"]},
                        {"name": "person", "labels": ["Person"]},
                    ],
                    "relationships": [
                        {"direction": "between", "types": ["APPEARS_IN"]}
                    ],
                }
            }
        ]
    }
    out = compile_query(g, q).collect()
    assert {(r["doc"]["node_id"], r["person"]["node_id"]) for r in out} == {
        ("doc-0", "ne-1"),
        ("doc-2", "ne-1"),
    }


def test_where_tree(g):
    q = q1(
        where={
            "and": [
                {
                    "or": [
                        {
                            "isEqualTo": {
                                "property": {"variable": "doc", "name": "id"},
                                "value": {"literal": "doc-1"},
                            }
                        },
                        {
                            "startsWith": {
                                "property": {"variable": "doc", "name": "path"},
                                "value": {"literal": "b/"},
                            }
                        },
                    ]
                },
                {
                    "not": {
                        "value": {
                            "isEqualTo": {
                                "property": {"variable": "doc", "name": "id"},
                                "value": {"literal": "doc-2"},
                            }
                        }
                    }
                },
            ]
        }
    )
    assert [r["doc"]["node_id"] for r in compile_query(g, q).collect()] == ["doc-1"]


def test_order_and_limit_capping(g):
    q = q1(
        orderBy=[{"property": {"variable": "doc", "name": "path"}, "direction": "desc"}],
        limit=2,
    )
    out = compile_query(g, q).collect()
    assert [r["doc"]["props"]["path"] for r in out] == ["b/2", "a/1"]
    # default cap applies when user limit exceeds it
    out = compile_query(g, q1(limit=99), default_limit=1).collect()
    assert len(out) == 1


def test_arity_errors(g):
    bad = {
        "matches": [
            {
                "path": {
                    "nodes": [{"name": "a"}, {"name": "b"}],
                    "relationships": [],
                }
            }
        ]
    }
    with pytest.raises(DSLError):
        compile_query(g, bad)
    with pytest.raises(DSLError):
        compile_query(g, {"matches": []})


def test_dump_default_query(g):
    nodes, edges = compile_dump_query(g, None)
    node_ids = {r["node_id"] for r in nodes.collect()}
    assert node_ids == {"doc-0", "doc-1", "doc-2", "ne-1", "ne-2"}
    edge_set = {(r["src"], r["dst"], r["type"]) for r in edges.collect()}
    # HAS_PARENT is not in the dump edge types
    assert edge_set == {
        ("ne-1", "doc-0", "APPEARS_IN"),
        ("ne-1", "doc-2", "APPEARS_IN"),
        ("ne-2", "doc-1", "SENT"),
    }


def test_dump_with_user_query_and_limit(g):
    dump = {
        "queries": [
            {
                "matches": [
                    {"path": {"nodes": [{"name": "doc", "labels": ["Document"]}]}}
                ],
                "where": {
                    "startsWith": {
                        "property": {"variable": "doc", "name": "path"},
                        "value": {"literal": "a/"},
                    }
                },
                "orderBy": [
                    {"property": {"variable": "doc", "name": "path"}, "direction": "asc"}
                ],
                "limit": 1,
            }
        ]
    }
    nodes, edges = compile_dump_query(g, dump)
    node_ids = {r["node_id"] for r in nodes.collect()}
    assert node_ids == {"doc-0", "ne-1"}
    assert {(r["src"], r["dst"]) for r in edges.collect()} == {("ne-1", "doc-0")}


def test_multi_key_order_by(g):
    """All orderBy keys must apply in ONE sort (successive .orderBy()
    calls would keep only the last key — the reference applies the full
    OrderBy list in a single statement, Neo4jUtils.java:236-244)."""
    q = q1(
        orderBy=[
            {"property": {"variable": "doc", "name": "contentType"},
             "direction": "asc"},
            {"property": {"variable": "doc", "name": "path"},
             "direction": "desc"},
        ],
        limit=3,
    )
    out = [r["doc"]["node_id"] for r in compile_query(g, q).collect()]
    # contentType asc puts message/rfc822 (doc-1) first; within
    # text/html, path desc puts b/2 (doc-2) before a/0 (doc-0).
    # Last-key-only ordering would give [doc-2, doc-1, doc-0].
    assert out == ["doc-1", "doc-2", "doc-0"]


def test_user_variable_with_anon_like_name_survives(g):
    """A user-chosen variable that LOOKS like a generated placeholder
    (_anonymized, _related) must not be dropped from the output."""
    q = {
        "matches": [
            {"path": {"nodes": [{"name": "_anonymized", "labels": ["Document"]}]}}
        ]
    }
    out = compile_query(g, q)
    assert out.columns == ["_anonymized"]
    assert out.count() == 3


def test_cycle_pattern(g):
    """Repeated node variable binds the SAME node: (a)-[:X]->(b)-[:Y]->(a).
    Graph has ne-1 -> doc-0 (APPEARS_IN) and doc-1 -> doc-0
    (HAS_PARENT); a 2-hop cycle a->b->a exists only where an edge pair
    returns to the start node — none here, so the cycle yields empty,
    while the open 2-hop path does not."""
    cyc = {
        "matches": [
            {
                "path": {
                    "nodes": [{"name": "a"}, {"name": "b"}, {"name": "a"}],
                    "relationships": [
                        {"direction": "to"},
                        {"direction": "to"},
                    ],
                }
            }
        ]
    }
    assert compile_query(g, cyc).count() == 0
    # sanity: the same shape with a distinct third variable matches
    # (ne-2 -> doc-1 -> doc-0)
    open_path = {
        "matches": [
            {
                "path": {
                    "nodes": [{"name": "a"}, {"name": "b"}, {"name": "c"}],
                    "relationships": [
                        {"direction": "to"},
                        {"direction": "to"},
                    ],
                }
            }
        ]
    }
    out = compile_query(g, open_path).collect()
    assert {(r["a"]["node_id"], r["b"]["node_id"], r["c"]["node_id"]) for r in out} == {
        ("ne-2", "doc-1", "doc-0")
    }


def test_cycle_pattern_positive(spark):
    """A genuine 2-cycle matches when the edge back exists."""
    from datashare_extension_neo4j_spark.plans.dsl import GraphTables

    nodes = spark.createDataFrame(
        [("n1", ["N"], None), ("n2", ["N"], None)],
        "node_id string, labels array<string>, props map<string,string>",
    )
    edges = spark.createDataFrame(
        [("n1", "n2", "L", None), ("n2", "n1", "L", None)],
        "src string, dst string, type string, props map<string,string>",
    )
    g2 = GraphTables(nodes=nodes, edges=edges)
    cyc = {
        "matches": [
            {
                "path": {
                    "nodes": [{"name": "a"}, {"name": "b"}, {"name": "a"}],
                    "relationships": [
                        {"direction": "to"},
                        {"direction": "to"},
                    ],
                }
            }
        ]
    }
    out = compile_query(g2, cyc).collect()
    assert {(r["a"]["node_id"], r["b"]["node_id"]) for r in out} == {
        ("n1", "n2"),
        ("n2", "n1"),
    }
