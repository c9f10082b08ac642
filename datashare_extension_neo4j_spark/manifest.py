"""Checkpoint manifest + idempotent resume (X5; BASELINE.json north
rule: "resumable from checkpoint with per-partition lineage +
metrics").

Each pipeline stage materializes to a parquet path and records a
manifest entry: input fingerprint (a snapshot pin — Iceberg
snapshot-id when available, else path + mtime), per-partition output
lineage (file, rows, bytes — from the parquet footers), row counters,
and wall time. The manifest is written atomically (tmp + rename). On
restart, a stage whose entry matches its input fingerprint and whose
output files still exist is skipped — mirroring the reference's
idempotent md5-keyed task identity (core/objects.py:118-144) done
properly for a DAG.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _input_fingerprint(path: str) -> dict:
    p = Path(path)
    if not p.exists():
        return {"path": path, "exists": False}
    if p.is_file():
        # single-file input (e.g. a bare documents.parquet): rglob
        # on a regular file yields nothing, which would make the
        # fingerprint a constant and staleness undetectable
        files = [str(p)]
    else:
        files = sorted(str(f) for f in p.rglob("*.parquet"))
    mtime = max((os.path.getmtime(f) for f in files), default=0)
    size = sum(os.path.getsize(f) for f in files)
    return {"path": path, "n_files": len(files), "bytes": size, "mtime": mtime}


def _output_lineage(path: str) -> list[dict]:
    """Per-partition (per-file) lineage from the written parquet."""
    try:
        import pyarrow.parquet as pq
    except Exception:
        return []
    out = []
    for f in sorted(Path(path).rglob("*.parquet")):
        try:
            md = pq.ParquetFile(f).metadata
            out.append(
                {
                    "file": f.name,
                    "rows": md.num_rows,
                    "bytes": f.stat().st_size,
                    "row_groups": md.num_row_groups,
                }
            )
        except Exception:
            out.append({"file": f.name, "bytes": f.stat().st_size})
    return out


class Manifest:
    def __init__(self, run_dir: str):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.run_dir / "manifest.json"
        self.state: dict = {"stages": {}}
        if self.path.exists():
            self.state = json.loads(self.path.read_text())

    def _flush(self) -> None:
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self.state, indent=2, sort_keys=True))
        tmp.replace(self.path)  # atomic on POSIX

    def is_complete(
        self, stage: str, inputs: list[str], config: dict | None = None
    ) -> bool:
        e = self.state["stages"].get(stage)
        if not e or e.get("status") != "complete":
            return False
        if not Path(e["output"]).exists():
            return False
        if e.get("config", {}) != (config or {}):
            # write configuration changed (e.g. --buckets) — the old
            # output has the wrong layout even if inputs are identical
            return False
        fps = [_input_fingerprint(p) for p in inputs]
        return fps == e.get("input_fingerprints")

    def run_stage(
        self,
        stage: str,
        inputs: list[str],
        output: str,
        fn,
        force: bool = False,
        config: dict | None = None,
    ) -> str:
        """Run fn(output_path) unless the stage is already complete for
        identical inputs AND write config. Returns the output path."""
        if not force and self.is_complete(stage, inputs, config):
            return output
        t0 = time.perf_counter()
        fn(output)
        lineage = _output_lineage(output)
        self.state["stages"][stage] = {
            "status": "complete",
            "output": output,
            "input_fingerprints": [_input_fingerprint(p) for p in inputs],
            "config": config or {},
            "partitions": lineage,
            "rows_out": sum(e.get("rows", 0) for e in lineage),
            "wall_s": round(time.perf_counter() - t0, 3),
            "completed_at": time.time(),
        }
        self._flush()
        return output


def run_pipeline(
    spark: SparkSession,
    pages_path: str,
    run_dir: str,
    use_rule_ner: bool = True,
    project: str = "test_project",
    force: bool = False,
    buckets: int | None = None,
) -> dict:
    """Resumable end-to-end run: pages parquet → parsed → graph tables.

    Every stage is a manifest-guarded parquet materialization; a
    restart after a crash re-runs only incomplete/stale stages.
    Returns {table: path}.

    ``buckets=N`` writes each graph table hash-partitioned on its merge
    key so later incremental imports rewrite only touched partitions
    (sinks/tables.py module docstring)."""
    from .operators.documents import doc_nodes, has_parent_edges
    from .operators.edges import appears_in_edges, email_edges
    from .operators.entities import entity_nodes
    from .operators.extract import parse_pages
    from .operators.ner import DEFAULT_GAZETTEER, annotated_mentions
    from .sinks.tables import TABLE_KEYS, write_bucketed_table

    # captured BEFORE Manifest creates the dir: a pre-existing manifest
    # means prior-run tables may be present (migration ladder must run
    # for real against them — see apply_migrations call below)
    fresh_run_dir = not (Path(run_dir) / "manifest.json").exists()
    m = Manifest(run_dir)
    out = lambda name: str(Path(run_dir) / name)  # noqa: E731

    def write(df: DataFrame, table: str | None = None):
        if buckets and table in TABLE_KEYS:
            return lambda path: write_bucketed_table(df, path, table, buckets)
        return lambda path: df.write.mode("overwrite").parquet(path)

    pages = spark.read.parquet(pages_path)
    parsed_path = m.run_stage(
        "parse",
        [pages_path],
        out("parsed"),
        write(
            parse_pages(
                pages,
                include_text=False,
                ner_gazetteer=DEFAULT_GAZETTEER if use_rule_ner else None,
            )
        ),
        force=force,
    )
    parsed = spark.read.parquet(parsed_path)
    docs = doc_nodes(parsed, project=project)
    docs_path = m.run_stage(
        "docs", [parsed_path], out("docs"), write(docs, "docs"),
        force=force, config={"buckets": buckets},
    )
    docs = spark.read.parquet(docs_path)
    m.run_stage(
        "doc_roots",
        [docs_path],
        out("doc_roots"),
        write(has_parent_edges(docs), "doc_roots"),
        force=force,
        config={"buckets": buckets},
    )
    mentions = annotated_mentions(parsed)
    mentions_path = m.run_stage(
        "mentions", [parsed_path], out("mentions"), write(mentions), force=force
    )
    mentions = spark.read.parquet(mentions_path)
    m.run_stage(
        "entities",
        [mentions_path],
        out("entities"),
        write(entity_nodes(mentions), "entities"),
        force=force,
        config={"buckets": buckets},
    )
    m.run_stage(
        "appears_in",
        [mentions_path],
        out("appears_in"),
        write(appears_in_edges(mentions), "appears_in"),
        force=force,
        config={"buckets": buckets},
    )
    m.run_stage(
        "emails",
        [mentions_path],
        out("emails"),
        write(email_edges(mentions), "emails"),
        force=force,
        config={"buckets": buckets},
    )
    # constraint/index manifest + migration ladder (reference runs its
    # migrations at startup). assume_current is ONLY valid for a run
    # dir this call created from scratch — an EXISTING dir may hold
    # tables built by older code whose pending data migrations must
    # actually execute, not be silently recorded as done.
    from .migrations import apply_migrations

    apply_migrations(spark, run_dir, assume_current=fresh_run_dir)
    return {
        name: out(name)
        for name in (
            "parsed",
            "docs",
            "doc_roots",
            "mentions",
            "entities",
            "appears_in",
            "emails",
        )
    }
