"""Exact substring-span dedup (dedup_substring_spans): island-merge
semantics on synthetic corpora plus sf0.001 oracle parity.
"""

from __future__ import annotations

import duckdb


def _write_docs(spark, tmp_path, rows):
    path = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{path}/documents.parquet"
    )
    return path


def _spans(spark, sf):
    from datashare_extension_neo4j_spark.queries import (
        dedup_substring_spans,
    )

    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in dedup_substring_spans(spark, sf).collect()
    )


def test_cross_doc_shared_run_marks_merged_span(spark, tmp_path):
    """A 7-token run shared by two docs yields ONE merged span per doc
    covering exactly the shared tokens (overlapping windows merge)."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "u1 u2 s1 s2 s3 s4 s5 s6 s7 u3"),
            (2, "s1 s2 s3 s4 s5 s6 s7 v1 v2"),
        ],
    )
    assert _spans(spark, sf) == [(1, 2, 9, 7), (2, 0, 7, 7)]


def test_intra_doc_repeat_marks_both_occurrences(spark, tmp_path):
    """count(*)>=2 includes repeats WITHIN one document: a phrase
    occurring twice in the same doc marks two separate islands."""
    sf = _write_docs(
        spark, tmp_path, [(3, "a b c d e x a b c d e")]
    )
    assert _spans(spark, sf) == [(3, 0, 5, 5), (3, 6, 11, 5)]


def test_identical_docs_merge_to_one_full_span(spark, tmp_path):
    """Fully duplicated docs: every window duplicates, adjacent and
    overlapping windows collapse into one whole-doc span each."""
    text = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"
    sf = _write_docs(spark, tmp_path, [(4, text), (5, text)])
    assert _spans(spark, sf) == [(4, 0, 10, 10), (5, 0, 10, 10)]


def test_short_and_unique_docs_emit_nothing(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [(6, "q r s"), (7, "w1 w2 w3 w4 w5 w6"), (8, "z1 z2 z3 z4 z5")],
    )
    assert _spans(spark, sf) == []


def test_apply_cuts_marked_spans_keeps_rest(spark, tmp_path):
    from datashare_extension_neo4j_spark.queries import (
        dedup_substring_apply,
    )

    text = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "u1 u2 s1 s2 s3 s4 s5 s6 s7 u3"),
            (2, "s1 s2 s3 s4 s5 s6 s7 v1 v2"),
            (4, text),
            (5, text),
            (6, "q r s"),
        ],
    )
    out = {
        r["doc_id"]: (r["cleaned_text"], r["n_removed"])
        for r in dedup_substring_apply(spark, sf).collect()
    }
    assert out[1] == ("u1 u2 u3", 7)
    assert out[2] == ("v1 v2", 7)
    # fully-duplicated docs: everything cut (conservative both-copies
    # policy), empty cleaned text
    assert out[4] == ("", 10) and out[5] == ("", 10)
    # short doc with no shingles passes through untouched
    assert out[6] == ("q r s", 0)


def test_apply_null_text_matches_oracle(spark, tmp_path):
    """Null-text docs: both engines return a null cleaned_text and
    null n_removed (no silent ''-vs-NULL divergence)."""
    from datashare_extension_neo4j_spark.queries import (
        ORACLE_DEDUP_SUBSTRING_APPLY,
        dedup_substring_apply,
    )

    sf = _write_docs(
        spark, tmp_path, [(1, None), (2, "a b c d e f"), (3, "a b c d e f")]
    )
    got = sorted(
        (r["doc_id"], r["cleaned_text"], r["n_removed"])
        for r in dedup_substring_apply(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(ORACLE_DEDUP_SUBSTRING_APPLY).fetchall())
    )
    assert got == want
    assert got[0][1] is None and got[0][2] is None


def test_substring_spans_k50_standard_width(spark, tmp_path):
    """k is a real parameter: at the standard Lee-et-al. width (50) a
    60-token run shared by two long docs marks exactly the shared
    region (11 overlapping windows merge into one span per doc);
    everything else in the 200-token docs stays unmarked."""
    from datashare_extension_neo4j_spark.queries import (
        dedup_substring_spans,
    )

    shared = [f"s{i}" for i in range(60)]
    doc_a = [f"a{i}" for i in range(100)] + shared + [
        f"at{i}" for i in range(40)
    ]
    doc_b = [f"b{i}" for i in range(20)] + shared + [
        f"bt{i}" for i in range(120)
    ]
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, " ".join(doc_a)), (2, " ".join(doc_b))],
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in dedup_substring_spans(spark, sf, k=50).collect()
    )
    assert got == [(1, 100, 160, 60), (2, 20, 80, 60)]


def test_substring_spans_oracle_parity(spark):
    from datashare_extension_neo4j_spark.queries import (
        ORACLE_DEDUP_SUBSTRING_SPANS,
    )

    sf = "/root/testdata/sf0.001"
    got = _spans(spark, sf)
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(ORACLE_DEDUP_SUBSTRING_SPANS).fetchall())
    )
    assert got == want and len(got) > 0


def test_apply_many_span_doc_linear_segment_cut(spark, tmp_path):
    """A boilerplate-heavy doc with MANY disjoint spans (20 repeated
    5-token blocks separated by unique fillers) must cut every block
    and keep every filler — the segment-walk rewrite's worst case
    (old per-token exists was O(tokens x spans) here)."""
    from datashare_extension_neo4j_spark.queries import (
        dedup_substring_apply,
    )

    block = "a b c d e"
    parts = []
    for j in range(20):
        parts.append(block)
        parts.append(f"u{j}")
    sf = _write_docs(spark, tmp_path, [(1, " ".join(parts))])
    rows = {r["doc_id"]: r for r in dedup_substring_apply(spark, sf).collect()}
    assert rows[1]["cleaned_text"] == " ".join(f"u{j}" for j in range(20))
    assert rows[1]["n_removed"] == 100


def test_rolling_gram_width_guard():
    """Rotation-keyed positions cap the shingle width at 64 tokens —
    beyond that, equal tokens 64 apart in a window cancel
    structurally. Fail loudly, never hash weakly."""
    import pytest

    from datashare_extension_neo4j_spark.queries import _rolling_gram_cols

    with pytest.raises(ValueError, match=r"\[1, 64\]"):
        _rolling_gram_cols(None, 65)
    with pytest.raises(ValueError, match=r"\[1, 64\]"):
        _rolling_gram_cols(None, 0)
