from .hashing import entity_id, entity_id_exact  # noqa: F401
from .csvfmt import neo4j_csv_cell, neo4j_csv_line, neo4j_header_line  # noqa: F401
from .text import (  # noqa: F401
    default_title,
    doc_title,
    meta_coalesce,
    rfc2047_decode_udf,
)
