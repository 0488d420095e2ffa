"""Deterministic corpus sampling — the dataset-assembly operators a
training pipeline runs after filtering/dedup: hash-bucketed
train/val/test splits and per-stratum balanced downsampling.

Everything here is hash-deterministic (the engine-portable ``hash56``
from :mod:`.text`), so the same document lands in the same split/sample
on every run, at every parallelism, on any engine — the property that
makes a 100 TB split reproducible without materializing an assignment
table. No randomness, no UDFs, no collect.

Scale shapes:
- ``dataset_split``: one per-row expression — linear, no shuffle.
- ``balanced_sample``: one count-per-stratum hash agg (map-side
  combinable), a broadcast scalar (the min stratum size), and one
  window partitioned by stratum (never single-partition). The sort
  inside each stratum partition is the unavoidable cost of exact
  k-per-stratum semantics; for approximate balance at extreme scale,
  use ``dataset_split``-style thresholding per stratum instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import hash56

__all__ = ["dataset_split", "balanced_sample"]


def dataset_split(
    docs: DataFrame,
    weights: tuple[int, int, int] = (80, 10, 10),
    salt: str = "split",
) -> DataFrame:
    """[doc_id, bucket, split]: deterministic train/val/test assignment.

    ``bucket = hash56(salt || ':' || doc_id) % 100``; the first
    ``weights[0]`` buckets are ``train``, the next ``weights[1]`` are
    ``val``, the rest ``test``. Changing ``salt`` re-rolls the split;
    adding documents never reassigns existing ones — the standard
    stable-split contract for incremental corpus builds.
    """
    if sum(weights) != 100:
        raise ValueError(f"weights must sum to 100, got {weights}")
    bucket = hash56(
        F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))
    ) % 100
    split = (
        F.when(bucket < weights[0], F.lit("train"))
        .when(bucket < weights[0] + weights[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        "doc_id", bucket.cast("long").alias("bucket"), split.alias("split")
    )


def balanced_sample(
    docs: DataFrame, strata: str = "lang", salt: str = "balance"
) -> DataFrame:
    """[doc_id, strata-col]: downsample every stratum to the size of the
    smallest stratum — the language-balancing pass of a multilingual
    corpus build. Which documents survive is hash-deterministic: each
    stratum keeps its ``m`` lowest ``(hash56, doc_id)`` rows, where
    ``m`` is the global minimum stratum size.
    """
    h = hash56(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string")))
    min_size = (
        docs.groupBy(strata)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("min_n"))
    )
    w = Window.partitionBy(strata).orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", strata)
        .withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(min_size))
        .where(F.col("_rk") <= F.col("min_n"))
        .select("doc_id", strata)
    )
