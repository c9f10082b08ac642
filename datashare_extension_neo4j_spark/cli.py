"""spark-submit entry point.

    spark-submit --py-files dist/datashare_extension_neo4j_spark.zip \
        -m datashare_extension_neo4j_spark.cli -- \
        build --pages /data/pages --run-dir /data/run

or equivalently ``python -m datashare_extension_neo4j_spark.cli …``
locally. Subcommands:

  build        resumable pipeline: pages parquet → graph tables
               (manifest-guarded stages, per-partition lineage)
  export-csv   graph tables → neo4j-admin bulk CSV package
  dump         DSL JSON (or default query) → graphml/cypher dump
  stats        recompute the project-statistics singleton
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
    )
    print(json.dumps(out))
    return 0


def cmd_export_csv(args) -> int:
    from .pipeline import GraphBuild
    from .sinks.neo4j_csv import export_graph_csvs

    spark = _spark(args.master)
    rd = args.run_dir
    g = GraphBuild(
        docs=spark.read.parquet(f"{rd}/docs"),
        doc_roots=spark.read.parquet(f"{rd}/doc_roots"),
        mentions=spark.read.parquet(f"{rd}/mentions"),
        entities=spark.read.parquet(f"{rd}/entities"),
        appears_in=spark.read.parquet(f"{rd}/appears_in"),
        emails=spark.read.parquet(f"{rd}/emails"),
    )
    md = export_graph_csvs(
        docs=g.docs,
        doc_roots=g.doc_roots,
        entities=g.entities,
        appears_in=g.appears_in,
        emails=g.emails,
        export_dir=args.export_dir,
        db=args.db,
        as_tar=args.tar,
    )
    print(json.dumps(md))
    return 0


def cmd_dump(args) -> int:
    from .graph import to_property_graph
    from .pipeline import GraphBuild
    from .plans.dsl import compile_dump_query, GraphTables
    from .plans.dump import dump_cypher, dump_graphml

    spark = _spark(args.master)
    rd = args.run_dir
    g = GraphBuild(
        docs=spark.read.parquet(f"{rd}/docs"),
        doc_roots=spark.read.parquet(f"{rd}/doc_roots"),
        mentions=spark.read.parquet(f"{rd}/mentions"),
        entities=spark.read.parquet(f"{rd}/entities"),
        appears_in=spark.read.parquet(f"{rd}/appears_in"),
        emails=spark.read.parquet(f"{rd}/emails"),
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
    g = GraphBuild(
        docs=spark.read.parquet(f"{rd}/docs"),
        doc_roots=spark.read.parquet(f"{rd}/doc_roots"),
        mentions=spark.read.parquet(f"{rd}/mentions"),
        entities=spark.read.parquet(f"{rd}/entities"),
        appears_in=spark.read.parquet(f"{rd}/appears_in"),
        emails=spark.read.parquet(f"{rd}/emails"),
    )
    stats = write_statistics(spark, g, f"{rd}/stats")
    print(json.dumps(stats))
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
    b.set_defaults(fn=cmd_build)

    e = sub.add_parser("export-csv")
    e.add_argument("--run-dir", required=True)
    e.add_argument("--export-dir", required=True)
    e.add_argument("--db", default="neo4j")
    e.add_argument("--tar", action="store_true")
    e.set_defaults(fn=cmd_export_csv)

    d = sub.add_parser("dump")
    d.add_argument("--run-dir", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--format", choices=["graphml", "cypher-shell"], default="graphml")
    d.add_argument("--query", default=None, help="DSL JSON string")
    d.add_argument("--limit", type=int, default=10_000)
    d.set_defaults(fn=cmd_dump)

    s = sub.add_parser("stats")
    s.add_argument("--run-dir", required=True)
    s.set_defaults(fn=cmd_stats)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
