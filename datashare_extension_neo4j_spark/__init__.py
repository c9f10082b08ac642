"""datashare_extension_neo4j_spark — a PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
ICIJ/datashare-extension-neo4j, rebuilt from scratch on DataFrames.

Reference semantics (file:line citations into /root/reference) are
re-expressed Spark-first: declarative DataFrame plans, Arrow-batched
pandas UDFs for the extraction hot path, salted two-level aggregation
for degree-heavy entities, and neo4j-bulk-compatible CSV export.
"""

__version__ = "0.1.0"
