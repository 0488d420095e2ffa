"""Explicit skew mitigation: deterministic salted equi-joins for hub keys.

Why this exists (north_star: "salted joins for high-degree skew
vertices"): AQE's skew-join splitting only repairs *shuffle partition*
skew after a sort-merge join has already planned; it cannot help when a
single join key (a hub vertex — the graph analog of a ``README.md`` path
shared by millions of repos) concentrates 10^8 probe rows on one task.
The reference hit the same wall in CPU form: its OpenMP build shows *no*
speedup at any thread count (test/parallel_edge_it_openmp_test/
graph_10k/*.png — 1.7s at 2 threads and 2.0s at 16) because contiguous
chunks of skewed per-edge work starve all but a few threads. Salting is
the shuffle-level fix: spread the hub's probe rows over ``n_salts``
tasks and replicate the (tiny) build side to meet them.

Mechanics — equivalent to a plain inner equi-join, bit-for-bit in rows:

- ``large`` gets a salt in ``[0, n_salts)`` per row, derived with
  ``xxhash64`` from the row's own columns (deterministic — no ``rand()``,
  so retried/recomputed tasks salt identically; determinism is a repo
  invariant, SURVEY.md §7 "hard parts" #5). Non-hot rows keep salt 0.
- ``small`` is replicated ``n_salts`` ways for hot keys (explode of a
  ``sequence``), kept single for the rest.
- join on ``(key, _salt)``. Every large row holds exactly one salt and
  finds every small row for its key at that salt, so the multiset of
  output rows equals the unsalted join's (verified in tests/test_skew.py
  for multi-row small sides too).

Cost model: replication adds ``|hot| * n_salts`` build rows — hot sets
are by definition tiny (degree > threshold can hold for at most
2|E|/threshold vertices), so the overhead is bounded and the hub's probe
fan-out drops by n_salts×.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hot_keys_by_count", "hot_vertices_by_degree", "salted_join"]


def hot_keys_by_count(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys of ``df`` occurring more than ``threshold`` times — the
    operational definition of a hub on the probe side of a join.

    One hash aggregate (partial+final) over the key column only; the
    result is at most ``rows(df)/threshold`` keys, broadcastable by
    construction.
    """
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > threshold)
        .select(key)
    )


def hot_vertices_by_degree(
    degrees_df: DataFrame, threshold: int, key: str = "vertex"
) -> DataFrame:
    """Hub vertices straight from a precomputed degree table
    ([vertex, degree] — operators/degrees.py), avoiding a second scan of
    the edge table when degrees are already cached."""
    return degrees_df.where(F.col("degree") > threshold).select(
        F.col(key).alias("vertex")
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    hot: DataFrame,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join ``large ⋈ small`` on ``key``, skew-spread over
    ``n_salts`` shuffle keys for the keys listed in ``hot``.

    ``hot`` must be a one-column DataFrame of hot key values (from
    ``hot_keys_by_count`` / ``hot_vertices_by_degree``); it is broadcast
    to both sides. Output columns and row multiset are identical to
    ``large.join(small, key)``; only the physical key distribution
    changes.
    """
    if n_salts < 2:
        return large.join(small, key)

    hot_marked = F.broadcast(
        hot.select(F.col(hot.columns[0]).alias(key)).withColumn("_hot", F.lit(True))
    )

    # Probe side: deterministic salt from the row's full content; cold
    # rows collapse to salt 0 so they meet the un-replicated small rows.
    large_salted = (
        large.join(hot_marked, key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts)),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )

    # Build side: hot keys fan out to every salt, cold keys stay single.
    small_salted = (
        small.join(hot_marked, key, "left")
        .withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col("_hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(n_salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("_hot")
    )

    return large_salted.join(small_salted, [key, "_salt"]).drop("_salt")
