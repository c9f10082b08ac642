"""Similarity search over embedding columns (array<float>).

Two paths:
  * ``cosine_topk`` — brute-force baseline: broadcast the (small)
    query side, JVM-side dot products via zip_with/aggregate, window
    rank. Exact; O(Q·N).
  * ``lsh_ann_topk`` — the scale path: random-hyperplane LSH. Each
    vector gets a b-bit signature (sign of dot with b fixed
    deterministic hyperplanes); candidates = same bucket in any of
    ``tables`` independent signatures; exact cosine re-rank inside
    buckets. Bucket join replaces the cross join, so cost follows
    bucket occupancy, not N² — at 10^12 rows the signatures/buckets
    shard by hash like any other key.

All dot products are pure column expressions (whole-stage codegen);
planes are tiny literals baked into the plan (hash-derived, seeded —
no RNG at execution time).
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Null (not NaN) for zero-norm vectors: 0.0/0.0 is NaN, and Spark
    sorts NaN ABOVE every real number, so an unguarded zero vector
    (e.g. an embedding for empty content) would outrank every true
    neighbor under desc ordering; nulls sort last instead."""
    na2, nb2 = dot(a, a), dot(b, b)
    return F.when(
        (na2 > 0) & (nb2 > 0), dot(a, b) / (F.sqrt(na2) * F.sqrt(nb2))
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: queries(qid, qv) × vectors, ranked by cosine."""
    pairs = vectors.crossJoin(F.broadcast(queries)).where(
        F.col(id_col) != F.col("qid")
    )
    scored = pairs.select(
        "qid",
        F.col(id_col).alias("nid"),
        cosine(F.col("qv"), F.col(vec_col)).alias("cos"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _planes(dim: int, bits: int, table: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hash-derived hyperplanes (no RNG)."""
    planes = []
    for b in range(bits):
        vec = []
        i = 0
        while len(vec) < dim:
            h = hashlib.sha256(f"{seed}:{table}:{b}:{i}".encode()).digest()
            for j in range(0, 32, 2):
                if len(vec) >= dim:
                    break
                vec.append(struct.unpack(">h", h[j : j + 2])[0] / 32768.0)
            i += 1
        planes.append(vec)
    return planes


def lsh_signature(
    vec: Column, dim: int, bits: int = 12, table: int = 0
) -> Column:
    """b-bit random-hyperplane signature as an int column."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(_planes(dim, bits, table)):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, p) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig + (bit * F.lit(2**i)).cast("long")
    return sig


def ivf_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: k-means coarse quantizer (pyspark.ml, seeded) →
    every vector assigned to its nearest centroid list; queries probe
    the ``n_probe`` nearest lists and re-rank candidates exactly.
    The list assignment shards by centroid id like any other key, so
    candidate generation is a bucket join — the IVF scale path."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = vectors.select(array_to_vector(F.col(vec_col)).alias("features"))
    km = KMeans(k=n_lists, seed=seed, maxIter=10).fit(train)
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())
    ]

    def nearest_lists(vec: Column, n: int) -> Column:
        """ids of the n closest centroids (exact distances — centroid
        count is tiny, baked as literals into the plan)."""
        dists = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            vec,
                            F.array(*[F.lit(x) for x in c]),
                            lambda a, b: (a.cast("double") - b)
                            * (a.cast("double") - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    F.lit(i).alias("list_id"),
                )
                for i, c in centroids
            ]
        )
        return F.slice(F.array_sort(dists), 1, n)

    v = vectors.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nv"),
        F.element_at(nearest_lists(F.col(vec_col), 1), 1)
        .getField("list_id")
        .alias("list_id"),
    )
    q = queries.select(
        "qid",
        "qv",
        F.explode(
            F.transform(
                nearest_lists(F.col("qv"), n_probe), lambda s: s.getField("list_id")
            )
        ).alias("list_id"),
    )
    cand = v.join(F.broadcast(q), "list_id").where(F.col("nid") != F.col("qid"))
    scored = cand.select(
        "qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    bits: int = 10,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact re-rank."""
    v = vectors.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nv"),
        *[
            lsh_signature(F.col(vec_col), dim, bits, t).alias(f"sig{t}")
            for t in range(tables)
        ],
    )
    q = queries.select(
        "qid",
        "qv",
        *[
            lsh_signature(F.col("qv"), dim, bits, t).alias(f"qsig{t}")
            for t in range(tables)
        ],
    )
    v_buckets = v.select(
        "nid",
        "nv",
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"sig{t}").alias("s")) for t in range(tables)])
        ).alias("b"),
    ).select("nid", "nv", F.col("b.t").alias("t"), F.col("b.s").alias("s"))
    q_buckets = q.select(
        "qid",
        "qv",
        F.explode(
            F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"qsig{t}").alias("s")) for t in range(tables)])
        ).alias("b"),
    ).select("qid", "qv", F.col("b.t").alias("t"), F.col("b.s").alias("s"))
    cand = (
        v_buckets.join(F.broadcast(q_buckets), ["t", "s"])
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "qv", "nid", "nv")
        .dropDuplicates(["qid", "nid"])
    )
    scored = cand.select(
        "qid", "nid", cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
