"""End-to-end: reference-parity corpus (pages HTML) → graph → byte-golden
CSV export. Expectations from the reference's golden tables
(tests/core/test_imports.py:312-360,404-475,500-656; distilled in
FIXTURES.md §6)."""

import csv
import json
from pathlib import Path

import pytest

from datashare_extension_neo4j_spark.fixtures import reference_pages
from datashare_extension_neo4j_spark.functions.hashing import make_entity_id
from datashare_extension_neo4j_spark.pipeline import build_graph
from datashare_extension_neo4j_spark.sinks.neo4j_csv import export_graph_csvs

N_DOCS = 20


@pytest.fixture(scope="module")
def graph(spark):
    pages = reference_pages(spark, n_docs=N_DOCS, n_noise=5)
    g = build_graph(pages, project="test_project")
    yield g
    g.unpersist()


def test_doc_nodes(graph):
    docs = {r["id"]: r.asDict() for r in graph.docs.collect()}
    # noise pages have no ds:id → their id is the url; the 20 real docs:
    real = {k: v for k, v in docs.items() if k.startswith("doc-")}
    assert len(real) == N_DOCS
    d0 = real["doc-0"]
    assert d0["rootDocument"] is None  # self-parent nulled
    assert d0["urlSuffix"] == "ds/test_project/doc-0/doc-0"
    assert d0["title"] == "dirname-0"
    assert d0["createdAt"] == "2022-04-08T11:41:34Z"
    assert d0["modifiedAt"] == "2022-04-08T11:41:34Z"
    d1 = real["doc-1"]
    assert d1["rootDocument"] == "doc-0"
    assert d1["urlSuffix"] == "ds/test_project/doc-1/doc-0"
    assert d1["contentLength"] == 1
    assert d1["extractionLevel"] == 1


def test_has_parent_edges(graph):
    edges = {(r["src"], r["dst"]) for r in graph.doc_roots.collect()}
    expected = {(f"doc-{i}", f"doc-{i - 1}") for i in range(1, N_DOCS)}
    assert edges == expected  # 19 edges, no self-loop for doc-0


def test_extracted_text_byte_identical(graph, spark):
    # the per-row invariant: re-running extraction yields identical bytes
    t1 = {r["id"]: r["text"] for r in graph.docs.select("id", "text").collect()}
    pages = reference_pages(spark, n_docs=N_DOCS, n_noise=5)
    g2 = build_graph(pages, cache=False)
    t2 = {r["id"]: r["text"] for r in g2.docs.select("id", "text").collect()}
    assert t1 == t2
    assert all(isinstance(v, str) and v for v in t1.values())


def test_entity_nodes(graph):
    ents = {
        (r["mentionNorm"], r["category"]): r.asDict()
        for r in graph.entities.collect()
    }
    # mentions 0..19 → norms mention-0..mention-6; i%3==0 → Location
    # (i in {0,3,6,9,12,15,18} → norms 0..6), others Person (norms 0..6
    # minus those with no non-mod-3 member: norm k has members 3k,3k+1,3k+2)
    expected_keys = set()
    for i in range(N_DOCS):
        cat = "Location" if i % 3 == 0 else "Person"
        expected_keys.add((f"mention-{i // 3}", cat))
    expected_keys.add(("dev@icij.org", "EMAIL"))
    assert set(ents) == expected_keys
    e = ents[("mention-0", "Location")]
    assert e["entityId"] == make_entity_id("mention-0", "Location")
    assert e["label"] == "NamedEntity|Location"


def test_appears_in_golden_doc0(graph):
    rows = {
        (r["mentionNorm"], r["category"]): r.asDict()
        for r in graph.appears_in.where("endId = 'doc-0'").collect()
    }
    # reference golden (test_imports.py:341-359)
    loc = rows[("mention-0", "Location")]
    assert loc["mentionIds"] == ["named-entity-0"]
    assert loc["mentionExtractors"] == ["core-nlp"]
    assert loc["offsets"] == [0]
    assert loc["mentionCount"] == 1
    per = rows[("mention-0", "Person")]
    assert per["mentionIds"] == ["named-entity-1", "named-entity-2"]
    assert per["mentionExtractors"] == ["core-nlp", "spacy"]
    assert per["offsets"] == [0, 1, 2]
    assert per["mentionCount"] == 2
    assert per["startId"] == make_entity_id("mention-0", "Person")
    assert per["type"] == "APPEARS_IN"


def test_email_edges(graph):
    rows = {(r["type"]): r.asDict() for r in graph.emails.collect()}
    assert set(rows) == {"SENT", "RECEIVED"}
    sent = rows["SENT"]
    assert sent["fields"] == ["tika_metadata_message_from"]
    assert sent["startId"] == make_entity_id("dev@icij.org", "EMAIL")
    assert sent["endId"] == f"doc-{N_DOCS - 1}"
    recv = rows["RECEIVED"]
    assert recv["fields"] == ["tika_metadata_message_to"]


def test_csv_export_bytes(graph, tmp_path):
    export_graph_csvs(
        docs=graph.docs.where("id like 'doc-%'"),
        doc_roots=graph.doc_roots,
        entities=graph.entities,
        appears_in=graph.appears_in,
        emails=graph.emails,
        export_dir=tmp_path,
    )
    headers = (tmp_path / "docs-header.csv").read_text()
    assert headers == (
        "id:ID(Document),dirname,contentType,contentLength:LONG,"
        "extractionDate:DATETIME,extractionLevel:LONG,path,title,urlSuffix,"
        "createdAt:DATETIME,modifiedAt:DATETIME,:LABEL\n"
    )
    docs_lines = (tmp_path / "docs.csv").read_text().splitlines()
    assert (
        "doc-0,dirname-0,content-type-0,0,2023-02-06T13:48:22.3866,0,"
        "dirname-0,dirname-0,ds/test_project/doc-0/doc-0,"
        "2022-04-08T11:41:34Z,2022-04-08T11:41:34Z,Document"
    ) in docs_lines
    assert len(docs_lines) == N_DOCS
    # doc-roots
    assert (tmp_path / "doc-roots-header.csv").read_text() == (
        ":START_ID(Document),:END_ID(Document)\n"
    )
    root_lines = (tmp_path / "doc-roots.csv").read_text().splitlines()
    assert "doc-1,doc-0" in root_lines and len(root_lines) == N_DOCS - 1
    # entities
    ent_lines = (tmp_path / "entities.csv").read_text().splitlines()
    eid = make_entity_id("mention-0", "Location")
    assert f"{eid},mention-0,NamedEntity|Location" in ent_lines
    # entity-docs golden line for (mention-0, Person, doc-0)
    rel_lines = (tmp_path / "entity-docs.csv").read_text().splitlines()
    pid = make_entity_id("mention-0", "Person")
    assert (
        f"core-nlp|spacy,en,named-entity-1|named-entity-2,0|1|2,{pid},doc-0,APPEARS_IN"
    ) in rel_lines
    # email-docs
    email_lines = (tmp_path / "email-docs.csv").read_text().splitlines()
    sid = make_entity_id("dev@icij.org", "EMAIL")
    assert f"tika_metadata_message_from,{sid},doc-19,SENT" in email_lines
    assert f"tika_metadata_message_to,{sid},doc-19,RECEIVED" in email_lines
    # metadata.json + bulk-import.sh exist and agree on counts
    md = json.loads((tmp_path / "metadata.json").read_text())
    assert md["nodes"][0]["nNodes"] == N_DOCS
    assert md["relationships"][0]["nRelationships"] == N_DOCS - 1
    assert (tmp_path / "bulk-import.sh").exists()
    # files parse as CSV with the right field count
    with (tmp_path / "docs.csv").open() as f:
        for row in csv.reader(f):
            assert len(row) == 12


def test_noise_pages_do_not_leak(graph):
    ids = [r["id"] for r in graph.docs.select("id").collect()]
    # noise pages parse (id = url) but carry no mentions/edges
    noise_ids = [i for i in ids if not i.startswith("doc-")]
    assert len(noise_ids) == 5
    m = graph.mentions.where(~graph.mentions.documentId.startswith("doc-")).count()
    assert m == 0


def test_distributed_export_matches_single(graph, tmp_path):
    """The executor-written multi-part package holds exactly the same
    CSV bytes as the driver-streamed single-file export (modulo row
    order), its metadata lists every part, and bulk-import.sh compiles
    a valid multi-part neo4j-admin command."""
    import subprocess

    from datashare_extension_neo4j_spark.sinks.neo4j_csv import (
        export_graph_csvs_distributed,
    )

    single = tmp_path / "single"
    multi = tmp_path / "multi"
    kw = dict(
        docs=graph.docs.where("id like 'doc-%'"),
        doc_roots=graph.doc_roots,
        entities=graph.entities,
        appears_in=graph.appears_in,
        emails=graph.emails,
    )
    export_graph_csvs(export_dir=single, **kw)
    meta = export_graph_csvs_distributed(export_dir=multi, **kw)

    for name in ["docs", "doc-roots", "entities", "entity-docs", "email-docs"]:
        want = sorted((single / f"{name}.csv").read_text().splitlines())
        got = sorted(
            line
            for p in (multi / name).glob("part-*")
            for line in p.read_text().splitlines()
        )
        assert got == want, f"{name} bytes diverge"
        # headers byte-identical
        assert (multi / f"{name}-header.csv").read_text() == (
            single / f"{name}-header.csv"
        ).read_text()

    # metadata counts match the single-file export's
    single_meta = json.loads((single / "metadata.json").read_text())
    assert [n["nNodes"] for n in meta["nodes"]] == [
        n["nNodes"] for n in single_meta["nodes"]
    ]
    assert all(len(n["nodePaths"]) >= 1 for n in meta["nodes"])

    # dry-run compiles one import command referencing every part
    out = subprocess.run(
        ["bash", "bulk-import.sh", "--dry-run"],
        cwd=multi,
        env={"NEO4J_HOME": "/opt/neo4j", "PATH": "/usr/bin:/bin"},
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    assert "neo4j-admin database import full" in out
    for p in meta["nodes"][0]["nodePaths"]:
        assert p in out
