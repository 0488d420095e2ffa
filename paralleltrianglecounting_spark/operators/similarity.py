"""Similarity search over the ``embeddings`` table (vec_id,
embedding: array<float>, label).

- ``cosine_topk``       exact brute-force top-k for a query set — the
                        correctness baseline, JVM-side ``zip_with`` +
                        ``aggregate`` (no Python in the loop);
- ``lsh_ann_topk``      random-hyperplane LSH-bucketed approximate
                        variant — the scale path: candidates only meet
                        inside a bucket, so the join is |Q|·bucket_size
                        instead of |Q|·N. Hyperplanes are hash-derived
                        (deterministic, no RNG state to ship);
- ``embedding_near_duplicates`` cosine ≥ τ pairs within a blocking key.

At 100 TB the brute-force path is a broadcast of the (small) query set
against a full scan — linear, embarrassingly parallel, no shuffle; the
LSH path adds one shuffle on the bucket key. Both keep the arithmetic
in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn(col, F.col(col).cast("array<double>"))


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    n_queries: int = 20,
) -> DataFrame:
    """[query_id, neighbor_id, cos_r, rank]: exact top-k cosine
    neighbors for each query vector (default: the first ``n_queries``
    vec_ids). Deterministic ordering: score desc, neighbor id asc.
    """
    emb = _as_double(embeddings).select("vec_id", "embedding")
    if query_ids is not None:
        qfilter = F.col("vec_id").isin(query_ids)
    else:
        qfilter = F.col("vec_id") < n_queries
    q = emb.where(qfilter).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = F.broadcast(q).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb"))
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cos_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_r", "rank")
    )


N_HYPERPLANES = 8


def _hyperplane_bucket(emb: Column, dim: int, planes: int = N_HYPERPLANES) -> Column:
    """LSH bucket id: sign pattern of ``planes`` deterministic
    pseudo-random hyperplanes. Plane p's component j is ±1 from
    xxhash64(p, j) — reproducible everywhere, no RNG to broadcast."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j, p=p: F.when(
                        F.pmod(F.xxhash64(F.lit(p), j), F.lit(2)) == 0, F.lit(1.0)
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    dim: int = 64,
    planes: int = N_HYPERPLANES,
) -> DataFrame:
    """[query_id, neighbor_id, cos_r, rank]: approximate top-k — exact
    cosine, but only among vectors sharing the query's LSH bucket.
    Recall measured in tests against ``cosine_topk``."""
    emb = _as_double(embeddings).select(
        "vec_id", "embedding", _hyperplane_bucket(F.col("embedding"), dim, planes).alias("bucket")
    )
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    pairs = F.broadcast(q).join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("n_emb"),
            "bucket",
        ),
        "bucket",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cos_r"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_r", "rank")
    )


def embedding_near_duplicates(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """[vec_a, vec_b, cos_r]: embedding-cosine near-duplicate pairs,
    blocked by the ``label`` column (cluster id) to bound the pair
    explosion — the embedding analog of n-gram-Jaccard blocking."""
    emb = _as_double(embeddings)
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("cos_r"),
        )
        .where(F.col("cos_r") >= threshold)
    )
