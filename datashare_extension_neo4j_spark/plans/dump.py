"""Graph dump serializers (S10): GraphML and cypher-shell text.

Matches the reference's apoc-based dump shapes
(neo4j-app/neo4j_app/core/neo4j/graphs.py:54-135; structure pinned by
tests/core/neo4j/test_graphs.py:59-155): GraphML with <key> decls per
observed property (+ node ``labels``, edge ``label``/``TYPE``), nodes
carrying ``labels`` data, edges carrying source/target/label; cypher
dump as :begin/CREATE/:commit batches.

Serialization streams partitions through ``toLocalIterator`` — memory
on the driver is one partition, not the graph. (A dump is a human-
sized export, capped by the 10k default limit — not a bulk path.)
"""

from __future__ import annotations

from typing import Iterable, TextIO
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame

_GRAPHML_OPEN = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns"'
    ' xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"'
    ' xsi:schemaLocation="http://graphml.graphdrawing.org/xmlns'
    ' http://graphml.graphdrawing.org/xmlns/1.0/graphml.xsd">\n'
)


def _node_prop_keys(nodes: DataFrame) -> list[str]:
    from pyspark.sql import functions as F

    rows = (
        nodes.select(F.explode(F.map_keys("props")).alias("k"))
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


def _edge_prop_keys(edges: DataFrame) -> list[str]:
    from pyspark.sql import functions as F

    rows = (
        edges.where(F.col("props").isNotNull())
        .select(F.explode(F.map_keys("props")).alias("k"))
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


def dump_graphml(nodes: DataFrame, edges: DataFrame, out: TextIO) -> int:
    """Write GraphML; returns element count."""
    n = 0
    out.write(_GRAPHML_OPEN)
    for k in _node_prop_keys(nodes):
        # keys derive from page metadata (attacker-controlled) — quote
        out.write(f'<key id={quoteattr(k)} for="node" attr.name={quoteattr(k)}/>\n')
    out.write('<key id="TYPE" for="node" attr.name="TYPE"/>\n')
    out.write('<key id="labels" for="node" attr.name="labels"/>\n')
    for k in _edge_prop_keys(edges):
        out.write(f'<key id={quoteattr(k)} for="edge" attr.name={quoteattr(k)}/>\n')
    out.write('<key id="label" for="edge" attr.name="label"/>\n')
    out.write('<key id="TYPE" for="edge" attr.name="TYPE"/>\n')
    out.write('<graph id="G" edgedefault="directed">\n')
    for row in nodes.toLocalIterator():
        labels = ":" + ":".join(row["labels"])
        out.write(f'<node id={quoteattr(str(row["node_id"]))} labels={quoteattr(labels)}>')
        out.write(f'<data key="labels">{escape(labels)}</data>')
        for k, v in sorted((row["props"] or {}).items()):
            if v is not None:
                out.write(f'<data key={quoteattr(k)}>{escape(str(v))}</data>')
        out.write("</node>\n")
        n += 1
    i = 0
    for row in edges.toLocalIterator():
        out.write(
            f'<edge id="e{i}" source={quoteattr(str(row["src"]))}'
            f' target={quoteattr(str(row["dst"]))} label={quoteattr(row["type"])}>'
        )
        out.write(f'<data key="label">{escape(row["type"])}</data>')
        for k, v in sorted((row["props"] or {}).items()):
            if v is not None:
                out.write(f'<data key={quoteattr(k)}>{escape(str(v))}</data>')
        out.write("</edge>\n")
        n += 1
        i += 1
    out.write("</graph>\n</graphml>\n")
    return n


def _cy_str(v) -> str:
    """Single-quoted Cypher string literal with escaping."""
    return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _cy_ident(name: str) -> str:
    """Backtick-quoted identifier (labels, rel types, property keys) —
    ids/labels derive from page urls and entity text, so they can carry
    any character."""
    return "`" + str(name).replace("`", "``") + "`"


def _cypher_props(props: dict | None, extra: dict | None = None) -> str:
    items = dict(extra or {})
    items.update({k: v for k, v in (props or {}).items() if v is not None})
    if not items:
        return ""
    body = ", ".join(
        f"{_cy_ident(k)}: {_cy_str(v)}" for k, v in sorted(items.items())
    )
    return " {" + body + "}"


def dump_cypher(
    nodes: DataFrame, edges: DataFrame, out: TextIO, batch_size: int = 1000
) -> int:
    """cypher-shell format: :begin / CREATE …; / :commit batches
    (export batch default 1000, reference config.py:67)."""

    def batches(it: Iterable[str]) -> int:
        count = 0
        buf: list[str] = []
        for stmt in it:
            buf.append(stmt)
            if len(buf) >= batch_size:
                out.write(":begin\n" + "\n".join(buf) + "\n:commit\n")
                count += len(buf)
                buf = []
        if buf:
            out.write(":begin\n" + "\n".join(buf) + "\n:commit\n")
            count += len(buf)
        return count

    def node_stmts():
        for row in nodes.toLocalIterator():
            labels = ":".join(_cy_ident(l) for l in row["labels"])
            props = _cypher_props(row["props"], {"_id": row["node_id"]})
            yield f"CREATE (:{labels}{props});"

    def edge_stmts():
        # node ids default to page urls — apostrophes/backslashes are
        # legal there, so interpolation must escape like any value
        for row in edges.toLocalIterator():
            props = _cypher_props(row["props"])
            yield (
                "MATCH (a {_id:%s}), (b {_id:%s}) CREATE (a)-[:%s%s]->(b);"
                % (
                    _cy_str(row["src"]),
                    _cy_str(row["dst"]),
                    _cy_ident(row["type"]),
                    props,
                )
            )

    n = batches(node_stmts())
    n += batches(edge_stmts())
    return n
