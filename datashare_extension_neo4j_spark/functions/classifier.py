"""Model-based quality filtering — the classifier curation step
(FineWeb-Edu / DCLM style): score every document with a linear model
over hashed token features and keep docs above threshold. LLM-pipeline
extension beyond the reference surface.

Scale shape: feature hashing makes the model a FIXED-width vector, so
scoring is in-row — hash each token to a bucket, sum the bucket
weights, one pass, ZERO shuffle at any corpus size. A trained model
rides either (a) in-plan, when weights are a pure function of the
bucket hash (the deterministic stand-in used by the registry entry and
its oracle), or (b) as a broadcast weight table joined against the
exploded token stream (``score_with_weight_table`` — the production
path for weights learned offline; the weight table is vocab-bounded,
i.e. 2^20-ish rows, always broadcastable).

Cross-engine exactness: weights are INTEGERS derived from md5 hex
(Spark ``conv(hex, 16, 10)`` ≡ DuckDB ``CAST('0x'||hex AS BIGINT)``),
summed as longs — no float accumulation order to diverge — and the
single final division is rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# weight = md5-derived int in [-2^15, 2^15); the divisor normalizes the
# per-token mean back to [-0.5, 0.5)
WEIGHT_SCALE = 65536


def _toks(text: Column) -> Column:
    """Whitespace tokens, empty fields dropped; null text reads as
    the empty document (the classifier has no length opinion — length
    gates belong to the heuristic quality ops)."""
    return F.filter(
        F.split(F.coalesce(text, F.lit("")), " "), lambda t: t != ""
    )


def token_bucket(tok: Column) -> Column:
    """Feature-hash bucket for one token: hex chars 9-12 of
    md5(token) — 16 bits, same bytes both engines."""
    return F.substring(F.md5(tok), 9, 4)


def bucket_weight(bucket: Column) -> Column:
    """Deterministic integer weight for one bucket: the bucket hex as
    an int in [0, 65536), centered at zero. Stands in for a trained
    embedding-bucket weight; a pure function of the bucket, so
    colliding tokens agree by construction."""
    return F.conv(bucket, 16, 10).cast("long") - WEIGHT_SCALE // 2


def token_weight(tok: Column) -> Column:
    return bucket_weight(token_bucket(tok))


def quality_score_cols(text: Column) -> list[Column]:
    """In-row linear-model scoring columns for one text column:
    nTokens, integer weight sum, normalized 6dp score, pass flag.
    Null text scores like the empty document (0 tokens, score 0,
    passes) — identical in the weight-table path and the oracle."""
    toks = _toks(text)
    n = F.size(toks)
    ssum = F.aggregate(
        F.transform(toks, token_weight),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = F.when(
        n > 0, F.round(ssum / (n * F.lit(float(WEIGHT_SCALE))), 6)
    ).otherwise(F.lit(0.0))
    return [
        n.cast("long").alias("nTokens"),
        ssum.alias("scoreSum"),
        score.alias("qualityScore"),
        (score >= 0).alias("passes"),
    ]


def score_with_weight_table(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The trained-model path: per-token bucket weights come from a
    ``(bucket string, weight long)`` table learned offline. Tokens
    explode, the vocab-bounded weight table broadcasts (map-side
    join; unknown buckets weigh 0), and one per-doc sum aggregates —
    a single doc-keyed shuffle.

    Returns (id_col, nTokens, scoreSum, qualityScore, passes) — the
    same schema as the in-plan scorer, so the two are swappable; with
    the md5-derived weight table they are EQUAL (tested)."""
    exploded = docs.select(
        F.col(id_col), F.explode(_toks(F.col(text_col))).alias("tok")
    ).withColumn("bucket", token_bucket(F.col("tok")))
    per_doc = (
        exploded.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("nTokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0).cast("long")))
            .cast("long")
            .alias("scoreSum"),
        )
    )
    score = F.round(
        F.col("scoreSum") / (F.col("nTokens") * F.lit(float(WEIGHT_SCALE))),
        6,
    )
    # docs with no tokens never explode a row — restore them at 0
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("nTokens", F.lit(0).cast("long")).alias("nTokens"),
            F.coalesce("scoreSum", F.lit(0).cast("long")).alias("scoreSum"),
            F.coalesce(score, F.lit(0.0)).alias("qualityScore"),
            F.coalesce(score >= 0, F.lit(True)).alias("passes"),
        )
    )


def md5_weight_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The md5-derived weights materialized as a real (bucket, weight)
    table over the corpus vocabulary — what ``score_with_weight_table``
    consumes in tests to prove equality with the in-plan scorer."""
    return (
        docs.select(F.explode(_toks(F.col(text_col))).alias("tok"))
        .select(token_bucket(F.col("tok")).alias("bucket"))
        .distinct()
        .select("bucket", bucket_weight(F.col("bucket")).alias("weight"))
    )
