"""The fused path (NER + per-doc edge aggregation inside the parse
pass, zero edge shuffle) must produce exactly the same graph as the
unfused groupBy path."""

from pyspark.sql import functions as F

from datashare_extension_neo4j_spark.fixtures import reference_pages
from datashare_extension_neo4j_spark.pipeline import build_graph


def _canon_appears(df):
    return {
        (r["startId"], r["endId"]): (
            tuple(r["mentionIds"]),
            tuple(r["mentionExtractors"]),
            tuple(r["offsets"]),
            r["extractorLanguage"],
            r["mentionCount"],
        )
        for r in df.collect()
    }


def test_fused_equals_unfused(spark):
    pages = reference_pages(spark, n_docs=15, n_noise=3)
    plain = build_graph(pages, use_rule_ner=True, cache=False)
    fused = build_graph(
        pages, use_rule_ner=True, fuse_ner=True, include_text=False, cache=False
    )
    assert _canon_appears(plain.appears_in) == _canon_appears(fused.appears_in)
    em = lambda g: {  # noqa: E731
        (r["startId"], r["endId"], r["type"]): tuple(r["fields"])
        for r in g.emails.collect()
    }
    assert em(plain) == em(fused)
    ents = lambda g: {  # noqa: E731
        (r["mentionNorm"], r["category"]) for r in g.entities.collect()
    }
    assert ents(plain) == ents(fused)
    roots = lambda g: {(r["src"], r["dst"]) for r in g.doc_roots.collect()}  # noqa: E731
    assert roots(plain) == roots(fused)


def test_fused_plan_has_no_edge_shuffle(spark):
    pages = reference_pages(spark, n_docs=5)
    fused = build_graph(
        pages, use_rule_ner=True, fuse_ner=True, include_text=False, cache=False
    )
    plan = fused.appears_in._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
