"""Byte-parity of the JVM-side CSV formatter vs the reference's writer
config (Python csv excel dialect, QUOTE_MINIMAL, backslash doubling —
reference neo4j-app/neo4j_app/core/neo4j/__init__.py:96-130)."""

import csv
import io

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datashare_extension_neo4j_spark.functions.csvfmt import (
    neo4j_csv_line,
    neo4j_header_line,
)


def reference_csv_line(values):
    """Driver-side twin of the reference writer for one row."""
    buf = io.StringIO()
    w = csv.writer(
        buf,
        dialect="excel",
        doublequote=True,
        escapechar=None,
        quoting=csv.QUOTE_MINIMAL,
        lineterminator="\n",
    )
    formatted = []
    for v in values:
        if v is None:
            v = ""
        elif isinstance(v, str):
            v = v.replace("\\", "\\\\")
        formatted.append(v)
    w.writerow(formatted)
    return buf.getvalue()[:-1]


CASES = [
    ["plain", "x", "y"],
    ["with,comma", "b", ""],
    ['with"quote', "b", "c"],
    ["back\\slash", "b", "c"],
    ["multi\nline", "b", "c"],
    ["tricky\\,mix\"", None, "end"],
    ["", None, ""],
    ["carriage\rreturn", "b", "c"],
    ["unicode é漢字", "ümlaut", "ok"],
]


def test_csv_line_matches_reference_cases(spark):
    df = spark.createDataFrame(
        [(i, *row) for i, row in enumerate(CASES)],
        schema="i int, a string, b string, c string",
    )
    got = {
        r["i"]: r["line"]
        for r in df.select(
            "i", neo4j_csv_line([F.col("a"), F.col("b"), F.col("c")]).alias("line")
        ).collect()
    }
    for i, row in enumerate(CASES):
        assert got[i] == reference_csv_line(row), f"case {i}: {row!r}"


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
            ),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_csv_line_property(spark, values):
    df = spark.createDataFrame(
        [tuple(values)], schema=", ".join(f"c{i} string" for i in range(len(values)))
    )
    cols = [F.col(f"c{i}") for i in range(len(values))]
    got = df.select(neo4j_csv_line(cols).alias("line")).collect()[0]["line"]
    assert got == reference_csv_line(values)


def test_header_line():
    assert (
        neo4j_header_line(["a:ID", "b", ":LABEL"]) == "a:ID,b,:LABEL\n"
    )
