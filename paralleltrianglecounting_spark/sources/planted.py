"""Planted-triangle synthetic graph generator — SURVEY.md §2.1 S4.

Same semantics as the reference generator
(``graph_generator/generate_graph.py:5-33``): sample 3 distinct vertex
ids per planted triangle, emit the 3 canonical edges, dedup globally.
But distributed and *hash-deterministic*: the reference uses Python
``random`` on one core; here every vertex id is a pure function of
(seed, triangle index) via ``xxhash64``, so any partitioning/ordering
yields the identical edge set — no driver-side RNG, no collect.

Distinctness of the 3 corners is by construction (offset tricks), not
rejection sampling: b ≠ a by a 1..n-1 offset; c is drawn from n-2
slots and shifted past both a and b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def planted_triangles(
    spark: SparkSession, num_nodes: int, num_triangles: int, seed: int = 42
) -> DataFrame:
    """Canonical edge table [src, dst] of ``num_triangles`` planted
    triangles over ids ``0..num_nodes-1`` (plus any accidental triangles
    formed by edge sharing, exactly as in the reference)."""
    if num_nodes < 3:
        raise ValueError("need at least 3 vertices to plant a triangle")
    t = spark.range(num_triangles)
    h = lambda k: F.abs(F.xxhash64(F.lit(seed), F.lit(k), F.col("id")))  # noqa: E731
    df = t.withColumn("a", h(1) % num_nodes)
    df = df.withColumn("b", (F.col("a") + 1 + h(2) % (num_nodes - 1)) % num_nodes)
    lo = F.least("a", "b")
    hi = F.greatest("a", "b")
    c0 = h(3) % (num_nodes - 2)
    c1 = F.when(c0 >= lo, c0 + 1).otherwise(c0)
    c2 = F.when(c1 >= hi, c1 + 1).otherwise(c1)
    df = df.select("a", "b", c2.alias("c"))
    edges = df.select(
        F.explode(
            F.array(
                F.struct(F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")),
                F.struct(F.least("b", "c").alias("src"), F.greatest("b", "c").alias("dst")),
                F.struct(F.least("a", "c").alias("src"), F.greatest("a", "c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return edges.distinct()
