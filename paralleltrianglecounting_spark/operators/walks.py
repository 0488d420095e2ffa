"""Deterministic random-walk corpus generation (DeepWalk / node2vec
p=q=1 style) — the link-graph training-data operator: walks become the
"sentences" an embedding trainer consumes.

True RNG walks are irreproducible across runs/engines, so the walk is
*hash-driven*: at step ``k`` from vertex ``v``, the walk moves to the
neighbor ``u`` minimizing ``(hash56(salt:walk:k:u), u)``. For a
non-adversarial graph this is a uniform-ish draw per (walk, step) —
exactly the determinism trick the MinHash/LSH gates use — and it makes
the walk corpus value-exact testable against an ANSI-SQL oracle and
byte-stable at any parallelism.

Plan shape at 100 TB:
- the bidirected adjacency is built once, hash-partitioned on vertex,
  and persisted; every step's join reuses that exchange (the pagerank
  superstep topology pattern — the |E|-row side never re-shuffles);
- each step is ONE equi-join (frontier × adjacency) plus a JVM-side
  ``array_min`` over ``transform(neighbors, struct(hash, u))`` — the
  argmin never explodes the neighbor list into rows;
- frontier size is constant (= number of walks), so per-step cost is a
  walk-count-sized shuffle probing the partitioned adjacency;
- hub vertices cost O(deg) *inside one array expression* per visiting
  walk; the orientation trick does not apply (walks need full
  adjacency), so extremely skewed graphs pay the hub's array scan —
  bounded by one row's array, never a row blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .adjacency import adjacency
from .text import hash56

__all__ = ["random_walks"]


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    seed_mod: int = 16,
    salt: str = "walk",
) -> DataFrame:
    """[walk_id, step, v]: one walk per seed vertex (non-isolated
    vertices with ``id % seed_mod == 0``), ``walk_len`` steps, step 0
    being the seed itself — ``(walk_len + 1)`` rows per walk.

    The walk never halts early: the adjacency is bidirected, so every
    reachable vertex has ≥ 1 neighbor.

    The walk prefix rides along as ONE array column and is exploded
    once at the end — never a union of per-step branches (Spark
    re-evaluates union children, so a union of chained steps would
    recompute step k's whole prefix O(walk_len) times). Lineage depth
    is ``walk_len`` joins; at production walk lengths (40-80), insert
    a checkpoint every ~20 steps via the superstep runner.
    """
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    adj = adjacency(edges)
    n_part = edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
    adj = adj.repartition(int(n_part), "vertex").persist()

    seeds = adj.select(F.col("vertex").alias("walk_id")).where(
        F.col("vertex") % seed_mod == 0
    )
    cur = seeds.select(
        "walk_id",
        F.array(F.col("walk_id")).alias("path"),
        F.col("walk_id").alias("v"),
    )
    for k in range(1, walk_len + 1):
        prefix = F.concat(
            F.lit(f"{salt}:"),
            F.col("walk_id").cast("string"),
            F.lit(f":{k}:"),
        )
        pick = F.array_min(
            F.transform(
                F.col("neighbors"),
                lambda u: F.struct(
                    hash56(F.concat(prefix, u.cast("string"))).alias("h"),
                    u.alias("u"),
                ),
            )
        )["u"]
        cur = (
            cur.join(adj, cur["v"] == adj["vertex"])
            .select(
                "walk_id",
                F.concat(F.col("path"), F.array(pick)).alias("path"),
                pick.alias("v"),
            )
        )
    return cur.select(
        "walk_id", F.posexplode(F.col("path")).alias("step", "v")
    )
