"""Similarity search over embedding columns (array<float>).

Beyond-reference surface: approximate-nearest-neighbor primitives for a
training-data pipeline. Two tiers:

- ``brute_force_topk``: exact cosine top-k. The query set is broadcast
  (it is small by construction); the corpus side streams — no shuffle
  of the corpus at all, the only shuffle is the final per-query top-k
  aggregation. This is the correctness baseline and is already the
  right shape for "few queries x huge corpus" at 100 TB.
- ``lsh_topk``: random-hyperplane LSH bucketing; only bucket-colliding
  candidates are scored. The hyperplanes are generated deterministically
  on the driver (seeded) and shipped as literals, so plans are stable
  and reproducible. The scale path when the query set is large.

Dot products/norms are computed with higher-order functions
(zip_with + aggregate) — JVM-side, no Python UDF in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_mas_spark.colutils import qcol


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos, rank).

    Self-matches (same id) are excluded. Queries are broadcast; ties
    break deterministically on neighbor id."""
    query_id_col = query_id_col or id_col
    q = queries.select(
        qcol(query_id_col).alias("query_id"), qcol(vec_col).alias("__qvec__")
    )
    c = corpus.select(
        qcol(id_col).alias("neighbor_id"), qcol(vec_col).alias("__cvec__")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qvec__"), F.col("__cvec__")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(num_planes, dim)).round(6).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-concatenation bucket id for random-hyperplane LSH."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(float(v)) for v in plane])) >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH
    bucket. Recall is tunable via num_planes (fewer planes = bigger
    buckets = higher recall, more compute)."""
    if dim is None:
        first = corpus.select(F.size(qcol(vec_col))).first()
        dim = first[0]
    planes = _hyperplanes(dim, num_planes, seed)
    c = corpus.select(
        qcol(id_col).alias("neighbor_id"),
        qcol(vec_col).alias("__cvec__"),
        lsh_bucket(qcol(vec_col), planes).alias("__bucket__"),
    )
    q = queries.select(
        qcol(id_col).alias("query_id"),
        qcol(vec_col).alias("__qvec__"),
        lsh_bucket(qcol(vec_col), planes).alias("__bucket__"),
    )
    scored = (
        c.join(F.broadcast(q), on="__bucket__")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("__qvec__"), F.col("__cvec__")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold, optionally blocked on an
    equality column (label/cluster) to keep the join sub-quadratic."""
    base = df.select(
        qcol(id_col).alias("doc_id"),
        qcol(vec_col).alias("vec"),
        *( [qcol(block_col).alias("block")] if block_col else [F.lit(1).alias("block")] ),
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            cosine(F.col("a.vec"), F.col("b.vec")).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
