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
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: score only candidates that share an LSH bucket
    with the query in at least one of ``num_tables`` independent hash
    tables (OR-amplification — a single table's recall collapses on
    high-dimensional data; multiple tables trade compute for recall).
    Recall tuning: more tables OR fewer planes => bigger candidate sets.
    """
    if dim is None:
        first = corpus.select(F.size(qcol(vec_col))).first()
        dim = first[0]
    tables = [
        _hyperplanes(dim, num_planes, seed + 101 * t) for t in range(num_tables)
    ]

    def buckets(vec: Column) -> Column:
        # Table index prefixes the bit pattern so buckets from different
        # tables never collide with each other.
        return F.array(
            *[
                F.concat(F.lit(f"{t}:"), lsh_bucket(vec, tables[t]))
                for t in range(num_tables)
            ]
        )

    c = corpus.select(
        qcol(id_col).alias("neighbor_id"),
        qcol(vec_col).alias("__cvec__"),
        F.explode(buckets(qcol(vec_col))).alias("__bucket__"),
    )
    q = queries.select(
        qcol(id_col).alias("query_id"),
        qcol(vec_col).alias("__qvec__"),
        F.explode(buckets(qcol(vec_col))).alias("__bucket__"),
    )
    scored = (
        c.join(F.broadcast(q), on="__bucket__")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # A pair colliding in several tables must be scored once.
        .dropDuplicates(["query_id", "neighbor_id"])
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


def _centroid_lit(c: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in c])


def _best_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the max-cosine centroid (deterministic: first wins ties)."""
    sims = F.array(*[cosine(vec, _centroid_lit(c)) for c in centroids])
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the scale path when both
    corpus and query set are large.

    Plan shape (100 TB-ready): centroids are seeded deterministically
    from the ``n_centroids`` lowest-id vectors, refined by
    ``refine_iters`` rounds of distributed k-means (posexplode ->
    groupBy(cluster, dim) mean — one shuffle of n_rows x dim scalars,
    result collected at n_centroids x dim values, i.e. driver-tiny);
    the corpus is then bucketed by nearest centroid (map-side literal
    argmax, no shuffle) and each query probes its ``n_probe`` closest
    buckets. Only bucket-colliding candidates are scored; recall is
    tunable via n_probe. All vector math is JVM-side higher-order
    functions — no Python UDF anywhere."""
    c0 = corpus.select(qcol(id_col).alias("id"), qcol(vec_col).alias("v"))
    centroids = [
        [float(x) for x in r["v"]]
        for r in c0.orderBy("id").limit(n_centroids).collect()
    ]
    for _ in range(refine_iters):
        assigned = c0.select(
            _best_centroid(F.col("v"), centroids).alias("c"),
            F.posexplode(F.col("v")).alias("pos", "x"),
        )
        means = (
            assigned.groupBy("c", "pos").agg(F.avg("x").alias("m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r["c"], {})[r["pos"]] = r["m"]
        centroids = [
            [by_c[i][p] for p in sorted(by_c[i])] if i in by_c else centroids[i]
            for i in range(len(centroids))
        ]

    c = corpus.select(
        qcol(id_col).alias("neighbor_id"),
        qcol(vec_col).alias("__cvec__"),
        _best_centroid(qcol(vec_col), centroids).alias("__bucket__"),
    )
    # Each query's n_probe closest buckets: sort (negated-sim, idx)
    # structs ascending, slice, explode.
    sims = F.array(
        *[
            F.struct(
                (-cosine(qcol(vec_col), _centroid_lit(cv))).alias("negsim"),
                F.lit(i).alias("idx"),
            )
            for i, cv in enumerate(centroids)
        ]
    )
    q = queries.select(
        qcol(id_col).alias("query_id"),
        qcol(vec_col).alias("__qvec__"),
        F.explode(
            F.transform(
                F.slice(F.array_sort(sims), 1, n_probe), lambda s: s["idx"]
            )
        ).alias("__bucket__"),
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
