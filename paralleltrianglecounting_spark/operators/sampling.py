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

__all__ = [
    "dataset_split",
    "balanced_sample",
    "mixture_weights",
    "pps_sample",
    "sequence_packing",
]


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


def mixture_weights(docs: DataFrame, alpha: float = 0.7) -> DataFrame:
    """[source, n_docs, n_tokens, weight_r]: temperature-scaled data-
    mixing weights per source — w_s = n_tokens_s^α / Σ_t n_tokens_t^α,
    the standard multinomial sampling distribution for multi-source
    pretraining (α < 1 upsamples small/low-resource sources relative
    to proportional sampling; α = 1 is proportional, α = 0 uniform —
    the exponent family used for multilingual/multi-corpus mixing).

    Cross-engine exactness: token counts are integers; pow and the
    final divide are written in the same association order as the
    oracle and rounded to 6 dp. 100 TB shape: ONE map-side-combined
    hash agg over (source) — the per-source table is tiny — then a
    scalar total broadcast back; the corpus is scanned once, pruned
    to (source, text)."""
    from .text import tokens

    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
    )
    tot = per.agg(
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("_z")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("_z"),
            6,
        ).alias("weight_r"),
    )


PACK_SHARDS = 8
PACK_CONTEXT = 256


def sequence_packing(
    docs: DataFrame,
    context_len: int = PACK_CONTEXT,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """[doc_id, shard, n_tokens, start_block, end_block]: concat-and-
    chunk sequence packing — the GPT-style pretraining step that
    concatenates the token stream and cuts it into fixed
    ``context_len`` blocks. Documents are assigned to ``n_shards``
    independent packing shards (doc_id mod n_shards — deterministic,
    append-stable) and packed within each shard in doc_id order;
    start/end_block are the first/last block the doc's tokens land in.
    (A zero-token doc degenerates to the block containing the current
    shard boundary — end_block = start_block − 1 exactly when the
    boundary sits on a block edge; consumers should treat n_tokens = 0
    rows as occupying nothing.)

    Distributed shape: real pipelines pack per output worker, never
    globally — a single global running sum would serialize the corpus
    through one partition. Here each shard's running sum is one window
    partitioned by shard (n_shards-way parallel); at 100 TB n_shards
    is the writer parallelism knob and the per-shard sort is the
    unavoidable cost of stable packing. All-integer output keeps the
    gate hash-exact."""
    from .text import tokens

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("shard"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    cum = base.withColumn("_cum", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((F.col("_cum") - F.col("n_tokens")) / context_len).alias(
            "start_block"
        ),
        F.floor((F.col("_cum") - 1) / context_len).alias("end_block"),
    )


def pps_sample(
    docs: DataFrame,
    target_n: int = 100,
    salt: str = "pps",
) -> DataFrame:
    """[doc_id, n_tokens]: deterministic probability-proportional-to-
    size (PPS) Bernoulli sample — each document kept with probability
    ``target_n * n_tokens / total_tokens``, so the expected sample size
    is ``target_n`` and inclusion probability follows token mass: the
    sampler behind corpus mixing that ``mixture_weights`` only *plans*
    (a source's share of the sample follows its share of tokens).

    All-integer and hash-deterministic — no floats, no RNG: keep doc d
    iff ``hash32(d) < (target_n * w_d * 2^32) div W`` where
    ``hash32 = hash56(salt:doc_id) mod 2^32`` and ``W = Σ w``. The
    threshold's floor division biases each inclusion probability down
    by < 2^-32 — negligible against any real target — and every
    quantity stays in int64 provided ``target_n * w_d < 2^31`` per
    document (a per-DOC bound, independent of corpus size: at
    target_n=100 a document may hold ~21 M tokens; ANSI mode raises
    loudly past it). The population total W may reach 2^63 tokens.

    Scale shape at 100 TB: one token-count aggregate (map-side
    combinable) to a 1-row broadcast, then a per-row integer compare —
    linear, one scan, no shuffle of the corpus. Expected-size Bernoulli
    (not exact-k): exact-k PPS needs a global weighted order; the
    Bernoulli form is the standard distributed choice (Poisson
    sampling) and re-samples identically on append only for unchanged
    rows."""
    from .text import tokens

    if target_n <= 0:
        raise ValueError("target_n must be positive")
    w = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    tot = w.agg(F.sum("n_tokens").alias("_tot"))
    h32 = hash56(F.concat(F.lit(f"{salt}:"), F.col("doc_id"))) % F.lit(
        4294967296
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .where(
            h32
            < F.expr(f"({target_n} * n_tokens * 4294967296) div _tot")
        )
        .select("doc_id", "n_tokens")
    )
