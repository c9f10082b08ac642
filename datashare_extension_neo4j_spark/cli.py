"""spark-submit entry point.

    spark-submit --py-files dist/datashare_extension_neo4j_spark.zip \
        tools/submit_cli.py build --pages /data/pages --run-dir /data/run

or equivalently ``python -m datashare_extension_neo4j_spark.cli …``
locally. Subcommands:

  build           resumable pipeline: pages parquet → graph tables
                  (manifest-guarded stages, per-partition lineage)
  incremental     MERGE a new pages batch into an existing run-dir
  import-mentions MERGE an NE-only mention batch (parents must already
                  be imported; orphans dropped — reference semantics)
  export-csv      graph tables → neo4j-admin bulk CSV package
                  (--distributed: executor-written multi-part package)
  dump            DSL JSON (or default query) → graphml/cypher dump
  stats           recompute the project-statistics singleton
  dedup-assign    documents → near-dup keeper map parquet (the
                  corpus-filter consumable)
  decontaminate   documents → benchmark-contamination flags parquet
                  (--n 13 = the standard check)
  link            store mentions → scored entity-link parquet
                  (bigram-blocked candidates, jaccard × popularity
                  prior; --kb links against an external entity KB)
  cut-substrings  documents → substring-deduped corpus parquet
                  (Lee-et-al. repeated k-token spans cut from text)
  neardup-init    documents → persisted band-signature store (the
                  incremental near-dup baseline)
  neardup-increment  dedupe a NEW documents batch against the store
                  (suppressed docs reported, survivors' bands appended)
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(master: str | None):
    from .session import get_spark

    return get_spark(app_name="datashare_extension_neo4j_spark", master=master)


def cmd_build(args) -> int:
    from .manifest import run_pipeline

    spark = _spark(args.master)
    out = run_pipeline(
        spark,
        args.pages,
        args.run_dir,
        use_rule_ner=not args.no_ner,
        project=args.project,
        force=args.force,
        buckets=args.buckets,
    )
    print(json.dumps(out))
    return 0


def cmd_incremental(args) -> int:
    from .sinks.tables import incremental_import

    spark = _spark(args.master)
    pages = spark.read.parquet(args.pages)
    counters = incremental_import(
        spark, pages, args.run_dir, project=args.project
    )
    print(json.dumps(counters))
    return 0


def cmd_import_mentions(args) -> int:
    from .sinks.tables import incremental_import_mentions

    spark = _spark(args.master)
    mentions = spark.read.parquet(args.mentions)
    counters = incremental_import_mentions(spark, mentions, args.run_dir)
    print(json.dumps(counters))
    return 0


def cmd_export_csv(args) -> int:
    from .sinks.tables import _read_table
    from .sinks.neo4j_csv import (
        export_graph_csvs,
        export_graph_csvs_distributed,
    )

    spark = _spark(args.master)
    rd = args.run_dir
    kw = dict(
        docs=_read_table(spark, f"{rd}/docs"),
        doc_roots=_read_table(spark, f"{rd}/doc_roots"),
        entities=_read_table(spark, f"{rd}/entities"),
        appears_in=_read_table(spark, f"{rd}/appears_in"),
        emails=_read_table(spark, f"{rd}/emails"),
        export_dir=args.export_dir,
        db=args.db,
    )
    if args.distributed:
        md = export_graph_csvs_distributed(**kw)
    else:
        md = export_graph_csvs(as_tar=args.tar, **kw)
    print(json.dumps(md))
    return 0


def cmd_dump(args) -> int:
    from .graph import to_property_graph
    from .pipeline import GraphBuild
    from .plans.dsl import compile_dump_query, GraphTables
    from .plans.dump import dump_cypher, dump_graphml

    spark = _spark(args.master)
    rd = args.run_dir
    from .sinks.tables import _read_table

    g = GraphBuild(
        docs=_read_table(spark, f"{rd}/docs"),
        doc_roots=_read_table(spark, f"{rd}/doc_roots"),
        mentions=spark.read.parquet(f"{rd}/mentions"),
        entities=_read_table(spark, f"{rd}/entities"),
        appears_in=_read_table(spark, f"{rd}/appears_in"),
        emails=_read_table(spark, f"{rd}/emails"),
    )
    tables: GraphTables = to_property_graph(g)
    query = json.loads(args.query) if args.query else None
    nodes, edges = compile_dump_query(tables, query, default_limit=args.limit)
    with open(args.output, "w") as f:
        if args.format == "graphml":
            n = dump_graphml(nodes, edges, f)
        else:
            n = dump_cypher(nodes, edges, f)
    print(json.dumps({"elements": n, "path": args.output}))
    return 0


def cmd_stats(args) -> int:
    from .pipeline import GraphBuild
    from .stats import write_statistics

    spark = _spark(args.master)
    rd = args.run_dir
    from .sinks.tables import _read_table

    g = GraphBuild(
        docs=_read_table(spark, f"{rd}/docs"),
        doc_roots=_read_table(spark, f"{rd}/doc_roots"),
        mentions=spark.read.parquet(f"{rd}/mentions"),
        entities=_read_table(spark, f"{rd}/entities"),
        appears_in=_read_table(spark, f"{rd}/appears_in"),
        emails=_read_table(spark, f"{rd}/emails"),
    )
    stats = write_statistics(spark, g, f"{rd}/stats")
    print(json.dumps(stats))
    return 0


def cmd_migrate(args) -> int:
    """Bring a run dir to the current schema version (the reference
    runs its migration ladder at app startup; this is the drivable
    equivalent)."""
    from .migrations import apply_migrations

    spark = _spark(args.master)
    applied = apply_migrations(spark, args.run_dir)
    print(json.dumps({"applied": applied}))
    return 0


def cmd_verify_constraints(args) -> int:
    """Audit every stored table against its uniqueness key; exit 1
    with the violation message on corruption."""
    from .migrations import ConstraintViolation, verify_constraints

    spark = _spark(args.master)
    try:
        verify_constraints(spark, args.run_dir)
    except ConstraintViolation as e:
        print(json.dumps({"ok": False, "violation": str(e)}))
        return 1
    print(json.dumps({"ok": True}))
    return 0


def cmd_dedup_assign(args) -> int:
    """Batch corpus-filter consumable: every doc_id mapped to its
    near-dup keeper (MinHash-LSH pairs → connected components →
    min-id keeper) plus an ``isKept`` flag, written as parquet — the
    table a training pipeline joins against to drop duplicates."""
    from .queries import dedup_minhash_assign

    spark = _spark(args.master)
    out = dedup_minhash_assign(spark, args.sf_dir)
    out.write.mode("overwrite").parquet(args.out)
    kept = spark.read.parquet(args.out)
    n = kept.count()
    n_kept = kept.where("isKept").count()
    print(json.dumps({"rows": n, "kept": n_kept, "dropped": n - n_kept,
                      "out": args.out}))
    return 0


def cmd_decontaminate(args) -> int:
    """Batch benchmark-decontamination consumable: per-doc contaminated
    shingle counts/fraction + flag, written as parquet. ``--n`` sets
    the shingle width (13 = the standard web-scale check)."""
    from .queries import decontaminate_ngram

    spark = _spark(args.master)
    out = decontaminate_ngram(spark, args.sf_dir, n=args.n)
    out.write.mode("overwrite").parquet(args.out)
    flagged = spark.read.parquet(args.out)
    n = flagged.count()
    n_bad = flagged.where("isContaminated").count()
    print(json.dumps({"rows": n, "contaminated": n_bad, "n": args.n,
                      "out": args.out}))
    return 0


def cmd_link(args) -> int:
    """Scored entity-linking consumable: the store's mention table
    linked to its best-scored candidate entity (character-bigram
    blocked, jaccard × ln-df popularity prior — operators/linking.py),
    written as parquet. ``--kb`` points at an external entity KB
    parquet (entNorm, category, df) to resolve noisy surface forms
    against canonical entities; ``--kb-store`` derives the KB from the
    store's own APPEARS_IN table (one row per entity-doc pair, so the
    row count per entity IS its document frequency — the canonical
    popularity prior for linking later mention batches); default
    derives the entity set from the mention stream itself (exact
    surface forms self-link, the reference's exact-key behavior)."""
    from pyspark.sql import functions as F

    from .operators.linking import link_mentions

    spark = _spark(args.master)
    m = (
        spark.read.parquet(f"{args.run_dir}/mentions")
        .withColumnRenamed("id", "mention_id")
        .select("mention_id", "documentId", "mentionNorm", "category")
    )
    if args.kb_store:
        kb = (
            spark.read.parquet(f"{args.run_dir}/appears_in")
            .groupBy(F.col("mentionNorm").alias("entNorm"), "category")
            .agg(F.count("*").cast("long").alias("df"))
        )
    elif args.kb:
        kb = spark.read.parquet(args.kb)
    else:
        kb = None
    out = link_mentions(m, entities=kb)
    out.write.mode("overwrite").parquet(args.out)
    linked = spark.read.parquet(args.out)
    n = linked.count()
    n_nil = linked.where("linkedNorm is null").count()
    n_exact = linked.where("mentionNorm = linkedNorm").count()
    print(json.dumps({"rows": n, "exact": n_exact,
                      "fuzzy": n - n_exact - n_nil, "unlinked": n_nil,
                      "out": args.out}))
    return 0


def cmd_cut_substrings(args) -> int:
    """Batch substring-dedup consumable: every document with repeated
    k-token spans cut out (``--k`` sets the window width; ~50 is the
    Lee-et-al. standard, small k only for tiny-vocab corpora), written
    as parquet with per-doc removed-token counts."""
    from .queries import dedup_substring_apply

    from pyspark.sql import functions as F

    spark = _spark(args.master)
    out = dedup_substring_apply(spark, args.sf_dir, k=args.k)
    out.write.mode("overwrite").parquet(args.out)
    # one aggregate job over the written output, not three scans
    n, n_touched, removed = (
        spark.read.parquet(args.out)
        .agg(
            F.count("*"),
            F.sum((F.col("n_removed") > 0).cast("int")),
            F.sum("n_removed"),
        )
        .first()
    )
    print(json.dumps({"rows": n, "touched": int(n_touched or 0),
                      "tokens_removed": int(removed or 0), "k": args.k,
                      "out": args.out}))
    return 0


def cmd_neardup_init(args) -> int:
    """Create the near-dup band-signature store from an accepted
    corpus (documents parquet with doc_id + text)."""
    from .sinks.neardup import init_neardup_store

    spark = _spark(args.master)
    docs = spark.read.parquet(args.docs).select("doc_id", "text")
    n = init_neardup_store(spark, docs, args.store)
    print(json.dumps({"store": args.store, "band_rows": n}))
    return 0


def cmd_neardup_increment(args) -> int:
    """Dedupe a new documents batch against the persisted store;
    writes kept docs (and the suppression map) as parquet."""
    from .sinks.neardup import incremental_neardup

    spark = _spark(args.master)
    new_docs = spark.read.parquet(args.docs).select("doc_id", "text")
    res = incremental_neardup(spark, new_docs, args.store)
    res["kept"].write.mode("overwrite").parquet(f"{args.out}/kept")
    res["dups"].write.mode("overwrite").parquet(f"{args.out}/dups")
    print(
        json.dumps(
            {
                "new": res["n_new"],
                "suppressed": res["n_suppressed"],
                "stored_band_rows": res["n_stored_rows"],
                "out": args.out,
            }
        )
    )
    return 0


def cmd_curate(args) -> int:
    """End-to-end curation consumable: the per-document provenance
    table (stage verdicts, first failing stage, curated bit, token
    contribution) written as parquet, plus a JSON summary of the drop
    funnel and the surviving token budget."""
    from pyspark.sql import functions as F

    from .queries import curate_corpus

    spark = _spark(args.master)
    curate_corpus(spark, args.sf_dir).write.mode("overwrite").parquet(
        args.out
    )
    v = spark.read.parquet(args.out)
    funnel = {
        r["dropReason"] or "curated": r["n"]
        for r in v.groupBy("dropReason").agg(
            F.count("*").alias("n")
        ).collect()
    }
    tokens = v.agg(F.sum("curatedTokens")).first()[0]
    print(
        json.dumps(
            {
                "rows": v.count(),
                "funnel": funnel,
                "curated_tokens": int(tokens or 0),
                "out": args.out,
            },
            sort_keys=True,
        )
    )
    return 0


def cmd_scrub(args) -> int:
    """PII scrub consumable: redact emails/IPv4s/phones in a
    documents parquet (doc_id, text) with typed placeholders; writes
    the scrubbed table and reports staged per-rule counts (each rule
    counted on the text the redaction chain hands it, so counts equal
    placeholders written)."""
    from pyspark.sql import functions as F

    from .functions.pii import redact_pii, staged_pii_counts

    spark = _spark(args.master)
    docs = spark.read.parquet(args.docs)
    n_emails, n_ips, n_phones = staged_pii_counts(F.col("text"))
    scrubbed = docs.select(
        *[c for c in docs.columns if c != "text"],
        redact_pii(F.col("text")).alias("text"),
        n_emails.alias("_ne"),
        n_ips.alias("_ni"),
        n_phones.alias("_np"),
    )
    scrubbed.drop("_ne", "_ni", "_np").write.mode("overwrite").parquet(
        args.out
    )
    totals = scrubbed.agg(
        F.sum("_ne"), F.sum("_ni"), F.sum("_np")
    ).first()
    print(
        json.dumps(
            {
                "rows": docs.count(),
                "emails": int(totals[0] or 0),
                "ips": int(totals[1] or 0),
                "phones": int(totals[2] or 0),
                "out": args.out,
            }
        )
    )
    return 0


def cmd_relations(args) -> int:
    """Graph-analytics consumable: materialize the typed-relation
    family over a corpus — predicate-typed triples, lexicalized
    surface forms, per-entity triangle/clustering stats, and
    link-prediction candidates — as four parquet tables under one
    output dir, with a JSON row-count summary. The KG-enrichment
    bundle a downstream browser/trainer loads next to the node/edge
    tables."""
    from .operators.graph_algos import release_long_lived_checkpoints
    from .queries import (
        kg_link_prediction,
        kg_relation_surface,
        kg_triangle_count,
        kg_typed_relations,
    )

    spark = _spark(args.master)
    tables = {
        "typed_relations": kg_typed_relations,
        "relation_surface": kg_relation_surface,
        "triangle_stats": kg_triangle_count,
        "link_candidates": kg_link_prediction,
    }
    counts = {}
    for name, fn in tables.items():
        out = f"{args.out}/{name}"
        fn(spark, args.sf_dir).write.mode("overwrite").parquet(out)
        counts[name] = spark.read.parquet(out).count()
    released = release_long_lived_checkpoints(spark)
    print(
        json.dumps(
            {**counts, "released_ckpt_blocks": released, "out": args.out},
            sort_keys=True,
        )
    )
    return 0


def cmd_weblinks(args) -> int:
    """Webgraph consumable: materialize the hyperlink family over a
    corpus — the per-anchor link edge stream, host-level link graph,
    host PageRank (directed, dangling-aware), canonical-URL rollup,
    and anchor-text alias table — as five parquet tables under one
    output dir with a JSON row-count summary. The crawl-side bundle a
    frontier scheduler / entity linker loads next to the KG tables.

    Anchor extraction runs ONCE: downstream tables are derived from
    the link_edges parquet written first (at corpus scale the regexp
    extraction pass dominates — never repeat it per output table).
    Every stage is manifest-guarded (manifest.py lineage + counters):
    re-running the bundle over unchanged inputs skips completed
    stages, so a failed run resumes from the first stale table."""
    from pyspark.sql import functions as F

    from .manifest import Manifest
    from .operators.graph_algos import (
        pagerank_directed,
        release_long_lived_checkpoints,
    )
    from .operators.weblinks import (
        canonical_url,
        extract_links,
        host_graph,
        url_host,
    )
    from .queries import _link_pages

    spark = _spark(args.master)
    man = Manifest(args.out)
    docs_path = f"{args.sf_dir}/documents.parquet"
    counts = {}

    def stage(name, inputs, build):
        out = man.run_stage(
            name,
            inputs,
            f"{args.out}/{name}",
            lambda p: build().write.mode("overwrite").parquet(p),
        )
        # counts come from the manifest's footer-derived lineage —
        # exact, and a resumed run never re-scans skipped tables
        counts[name] = man.state["stages"][name]["rows_out"]
        return spark.read.parquet(out), out

    links, links_path = stage(
        "link_edges",
        [docs_path],
        lambda: extract_links(_link_pages(spark, args.sf_dir)),
    )
    hg, hg_path = stage(
        "host_graph", [links_path], lambda: host_graph(links)
    )
    pr, _pr_path = stage(
        "host_pagerank",
        [hg_path],
        lambda: pagerank_directed(
            hg, src="srcHost", dst="dstHost", weight="nLinks", digits=6
        ).select(F.col("node").alias("host"), F.col("rank").alias("pagerank")),
    )
    canon = links.select(
        canonical_url(F.col("dstUrl")).alias("url"),
        url_host(F.col("srcUrl")).alias("srcHost"),
        "anchorText",
    )
    stage(
        "url_canonical",
        [links_path],
        lambda: canon.groupBy("url").agg(
            F.count("*").cast("long").alias("nLinks"),
            F.countDistinct("srcHost").cast("long").alias("nSources"),
        ),
    )
    stage(
        "anchor_aliases",
        [links_path],
        lambda: canon.groupBy("url").agg(
            F.array_join(
                F.array_sort(F.collect_set("anchorText")), "|"
            ).alias("aliases"),
            F.countDistinct("anchorText").cast("long").alias("nForms"),
            F.count("*").cast("long").alias("nLinks"),
        ),
    )
    if getattr(args, "graphml", None):
        # host graph through the reference-shaped GraphML dump sink
        # (plans/dump.py — the same writer the KG dump uses): hosts as
        # :Host nodes carrying their pagerank, links as :LINKS_TO
        # edges carrying the aggregated counts
        from .plans.dump import dump_graphml

        nodes = pr.select(
            F.col("host").alias("node_id"),
            F.array(F.lit("Host")).alias("labels"),
            F.create_map(
                F.lit("pagerank"), F.col("pagerank").cast("string")
            ).alias("props"),
        )
        edges = hg.select(
            F.col("srcHost").alias("src"),
            F.col("dstHost").alias("dst"),
            F.lit("LINKS_TO").alias("type"),
            F.create_map(
                F.lit("nLinks"), F.col("nLinks").cast("string"),
                F.lit("nPages"), F.col("nPages").cast("string"),
            ).alias("props"),
        )
        with open(args.graphml, "w") as fh:
            counts["graphml_elements"] = dump_graphml(nodes, edges, fh)
    released = release_long_lived_checkpoints(spark)
    print(
        json.dumps(
            {**counts, "released_ckpt_blocks": released, "out": args.out},
            sort_keys=True,
        )
    )
    return 0


def cmd_weblinks_init(args) -> int:
    """Create the incremental host-graph ledger from an initial crawl
    batch (sinks/webgraph.py)."""
    from .operators.weblinks import extract_links, synth_link_pages
    from .sinks.webgraph import init_webgraph_store

    spark = _spark(args.master)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    if args.filter:
        docs = docs.where(args.filter)
    links = extract_links(synth_link_pages(docs))
    n = init_webgraph_store(
        spark, links, args.store, n_buckets=args.buckets
    )
    print(json.dumps({"ledger_rows": n, "store": args.store}))
    return 0


def cmd_weblinks_increment(args) -> int:
    """MERGE one crawl batch's host-pair partials into the ledger —
    partition-scoped, idempotent under retry of the same batch."""
    from .operators.weblinks import extract_links, synth_link_pages
    from .sinks.webgraph import merge_webgraph_batch, read_host_graph

    spark = _spark(args.master)
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    if args.filter:
        docs = docs.where(args.filter)
    links = extract_links(synth_link_pages(docs))
    out = merge_webgraph_batch(spark, args.store, links, args.batch_id)
    out["host_pairs_total"] = read_host_graph(spark, args.store).count()
    print(json.dumps(out, sort_keys=True))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datashare_extension_neo4j_spark")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--pages", required=True)
    b.add_argument("--run-dir", required=True)
    b.add_argument("--project", default="test_project")
    b.add_argument("--no-ner", action="store_true")
    b.add_argument("--force", action="store_true")
    b.add_argument(
        "--buckets", type=int, default=None,
        help="hash-partition graph tables on their merge key so "
        "incremental imports rewrite only touched partitions",
    )
    b.set_defaults(fn=cmd_build)

    inc = sub.add_parser("incremental")
    inc.add_argument("--pages", required=True)
    inc.add_argument("--run-dir", required=True)
    inc.add_argument("--project", default="test_project")
    inc.set_defaults(fn=cmd_incremental)

    im = sub.add_parser("import-mentions")
    im.add_argument("--mentions", required=True, help="mention parquet (MENTION_SCHEMA)")
    im.add_argument("--run-dir", required=True)
    im.set_defaults(fn=cmd_import_mentions)

    e = sub.add_parser("export-csv")
    e.add_argument("--run-dir", required=True)
    e.add_argument("--export-dir", required=True)
    e.add_argument("--db", default="neo4j")
    e.add_argument("--tar", action="store_true")
    e.add_argument("--distributed", action="store_true")
    e.set_defaults(fn=cmd_export_csv)

    d = sub.add_parser("dump")
    d.add_argument("--run-dir", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--format", choices=["graphml", "cypher-shell"], default="graphml")
    d.add_argument("--query", default=None, help="DSL JSON string")
    d.add_argument("--limit", type=int, default=10_000)
    d.set_defaults(fn=cmd_dump)

    mg = sub.add_parser("migrate")
    mg.add_argument("--run-dir", required=True)
    mg.set_defaults(fn=cmd_migrate)

    vc = sub.add_parser("verify-constraints")
    vc.add_argument("--run-dir", required=True)
    vc.set_defaults(fn=cmd_verify_constraints)

    s = sub.add_parser("stats")
    s.add_argument("--run-dir", required=True)
    s.set_defaults(fn=cmd_stats)

    da = sub.add_parser("dedup-assign")
    da.add_argument("--sf-dir", required=True,
                    help="dir containing documents.parquet")
    da.add_argument("--out", required=True)
    da.set_defaults(fn=cmd_dedup_assign)

    dc = sub.add_parser("decontaminate")
    dc.add_argument("--sf-dir", required=True,
                    help="dir containing documents.parquet")
    dc.add_argument("--out", required=True)
    dc.add_argument("--n", type=int, default=13,
                    help="shingle width (13 = standard benchmark check)")
    dc.set_defaults(fn=cmd_decontaminate)

    lk = sub.add_parser("link")
    lk.add_argument("--run-dir", required=True)
    lk.add_argument("--out", required=True)
    lk_kb = lk.add_mutually_exclusive_group()
    lk_kb.add_argument("--kb", default=None,
                       help="external KB parquet (entNorm, category, "
                       "df); default: entities self-derived from "
                       "mentions")
    lk_kb.add_argument("--kb-store", action="store_true",
                       help="derive the KB from the store's APPEARS_IN"
                       " table (df = per-entity doc count)")
    lk.set_defaults(fn=cmd_link)

    cs = sub.add_parser("cut-substrings")
    cs.add_argument("--sf-dir", required=True,
                    help="dir containing documents.parquet")
    cs.add_argument("--out", required=True)
    cs.add_argument("--k", type=int, default=50,
                    help="token window width (50 = Lee-et-al. standard)")
    cs.set_defaults(fn=cmd_cut_substrings)

    ni = sub.add_parser("neardup-init")
    ni.add_argument("--docs", required=True,
                    help="documents parquet (doc_id, text)")
    ni.add_argument("--store", required=True,
                    help="band-signature store path to create")
    ni.set_defaults(fn=cmd_neardup_init)

    nu = sub.add_parser("neardup-increment")
    nu.add_argument("--docs", required=True,
                    help="NEW documents parquet (doc_id, text)")
    nu.add_argument("--store", required=True)
    nu.add_argument("--out", required=True,
                    help="writes kept/ and dups/ parquet under here")
    nu.set_defaults(fn=cmd_neardup_increment)

    cu = sub.add_parser("curate")
    cu.add_argument("--sf-dir", required=True,
                    help="table directory holding documents.parquet")
    cu.add_argument("--out", required=True,
                    help="provenance-table parquet path")
    cu.set_defaults(fn=cmd_curate)

    sc = sub.add_parser("scrub")
    sc.add_argument("--docs", required=True,
                    help="documents parquet with a text column")
    sc.add_argument("--out", required=True,
                    help="scrubbed parquet path")
    sc.set_defaults(fn=cmd_scrub)

    rl = sub.add_parser("relations")
    rl.add_argument("--sf-dir", required=True,
                    help="table directory holding documents.parquet")
    rl.add_argument("--out", required=True,
                    help="output dir for the four relation tables")
    rl.set_defaults(fn=cmd_relations)

    wl = sub.add_parser("weblinks")
    wl.add_argument("--sf-dir", required=True,
                    help="table directory holding documents.parquet")
    wl.add_argument("--out", required=True,
                    help="output dir for the five webgraph tables")
    wl.add_argument("--graphml", default=None,
                    help="also dump the host graph as GraphML here")
    wl.set_defaults(fn=cmd_weblinks)

    wi = sub.add_parser("weblinks-init")
    wi.add_argument("--sf-dir", required=True)
    wi.add_argument("--store", required=True)
    wi.add_argument("--filter", default=None,
                    help="SQL predicate selecting the initial batch's docs")
    wi.add_argument("--buckets", type=int, default=8)
    wi.set_defaults(fn=cmd_weblinks_init)

    wn = sub.add_parser("weblinks-increment")
    wn.add_argument("--sf-dir", required=True)
    wn.add_argument("--store", required=True)
    wn.add_argument("--batch-id", required=True)
    wn.add_argument("--filter", default=None,
                    help="SQL predicate selecting this batch's docs")
    wn.set_defaults(fn=cmd_weblinks_increment)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
