r"""neo4j-admin bulk CSV byte format as JVM-side column expressions.

Byte-compatible with the reference writer (reference
neo4j-app/neo4j_app/core/neo4j/__init__.py:96-130): Python csv excel
dialect, QUOTE_MINIMAL, doublequote=True, lineterminator ``\n``, with
``\`` pre-escaped to ``\\`` and ``None`` rendered as the empty string.

QUOTE_MINIMAL quotes a field iff it contains the delimiter ``,``, the
quotechar ``"``, ``\r`` or ``\n``; quoting doubles embedded quotes.
Everything here is built-in functions (whole-stage codegen) — no Python
in the hot path; ``df.select(neo4j_csv_line([...]))`` then
``write.text`` produces the byte-golden file body.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def neo4j_csv_cell(col: Column) -> Column:
    """Format one value as a neo4j-bulk CSV field (string column in)."""
    v = F.coalesce(col.cast("string"), F.lit(""))
    # neo4j escape: backslash doubled BEFORE csv quoting decisions
    v = F.replace(v, F.lit("\\"), F.lit("\\\\"))
    # Python csv quotes on delimiter, quotechar, or lineterminator chars;
    # the reference sets lineterminator="\n", so a bare "\r" is NOT quoted.
    needs_quote = v.contains(",") | v.contains('"') | v.contains("\n")
    quoted = F.concat(F.lit('"'), F.replace(v, F.lit('"'), F.lit('""')), F.lit('"'))
    return F.when(needs_quote, quoted).otherwise(v)


def neo4j_csv_line(cols: list[Column]) -> Column:
    """One CSV record (no trailing newline — text writer adds \n)."""
    line = F.concat_ws(",", *[neo4j_csv_cell(c) for c in cols])
    if len(cols) == 1:
        # csv module quirk: a row of ONE empty field is written as ""
        # (distinguishes it from an empty row)
        line = F.when(line == "", F.lit('""')).otherwise(line)
    return line


def neo4j_header_line(header: list[str]) -> str:
    """Driver-side header line (headers live in separate files)."""
    import csv
    import io

    buf = io.StringIO()
    w = csv.writer(buf, dialect="excel", lineterminator="\n")
    w.writerow(header)
    return buf.getvalue()
