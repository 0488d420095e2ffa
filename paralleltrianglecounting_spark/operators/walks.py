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


def biased_walks(
    edges: DataFrame,
    walk_len: int = 4,
    seed_mod: int = 16,
    return_copies: int = 1,
    inout_copies: int = 1,
    base_copies: int = 2,
    salt: str = "n2v",
) -> DataFrame:
    """[walk_id, step, v]: node2vec-style SECOND-ORDER biased walks,
    exactly weighted and fully deterministic.

    node2vec biases the next hop by where the walk came from: weight
    1/p to return to the previous vertex, 1 to stay in the previous
    vertex's neighborhood (a "BFS-ish" move), 1/q to wander outward.
    RNG-weighted choice is irreproducible, so this uses the
    integer-copy min-hash trick: give candidate ``u`` an integer copy
    count ``w(u)`` (``return_copies`` if u is the previous vertex,
    ``base_copies`` if u neighbors it, else ``inout_copies``) and pick
    the candidate owning the minimum of ``w(u)`` independent hashes.
    P(u wins) = w(u)/Σw EXACTLY (the minimum of the pooled hashes is
    uniform over the pool), with no floating point anywhere — the same
    determinism class as the MinHash gates, so the walk corpus is
    value-exact testable against an ANSI-SQL oracle. (p, q) map to
    copy counts by scaling {1/p, 1, 1/q} to integers.

    Plan per step: the frontier joins the persisted adjacency TWICE
    (current vertex's neighbors to enumerate candidates, previous
    vertex's neighbors to classify them) — both equi-joins against the
    same cached, pre-partitioned table; the weighted argmin is one
    nested JVM transform (neighbors × copies) per row, never a row
    explosion. Step 1 has no previous vertex and draws uniformly.
    """
    if walk_len < 0:
        raise ValueError(f"walk_len must be >= 0, got {walk_len}")
    for name, c in (
        ("return_copies", return_copies),
        ("inout_copies", inout_copies),
        ("base_copies", base_copies),
    ):
        if not isinstance(c, int) or c < 1:
            raise ValueError(f"{name} must be a positive int, got {c!r}")
    adj = adjacency(edges)
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    adj = adj.repartition(n_part, "vertex").persist()
    prev_adj = adj.select(
        F.col("vertex").alias("_pv"), F.col("neighbors").alias("_pnbrs")
    )

    seeds = adj.select(F.col("vertex").alias("walk_id")).where(
        F.col("vertex") % seed_mod == 0
    )
    cur = seeds.select(
        "walk_id",
        F.array(F.col("walk_id")).alias("path"),
        F.col("walk_id").alias("v"),
        F.lit(None).cast("long").alias("prev"),
    )

    def min_copy_hash(u, k: int, copies) -> F.Column:
        # min over `copies` independent hashes of (walk, step, u, copy)
        return F.array_min(
            F.transform(
                F.sequence(F.lit(1), copies),
                lambda j: hash56(
                    F.concat(
                        F.lit(f"{salt}:"),
                        F.col("walk_id").cast("string"),
                        F.lit(f":{k}:"),
                        u.cast("string"),
                        F.lit(":"),
                        j.cast("string"),
                    )
                ),
            )
        )

    for k in range(1, walk_len + 1):
        copies_of = lambda u: (
            F.when(u == F.col("prev"), F.lit(return_copies))
            .when(
                F.array_contains(
                    F.coalesce(F.col("_pnbrs"), F.array().cast("array<long>")), u
                ),
                F.lit(base_copies),
            )
            .otherwise(F.lit(inout_copies))
        )
        uniform = F.col("prev").isNull()
        pick = F.array_min(
            F.transform(
                F.col("neighbors"),
                lambda u: F.struct(
                    F.when(uniform, min_copy_hash(u, k, F.lit(1)))
                    .otherwise(min_copy_hash(u, k, copies_of(u)))
                    .alias("h"),
                    u.alias("u"),
                ),
            )
        )["u"]
        cur = (
            cur.join(adj, cur["v"] == adj["vertex"])
            .join(prev_adj, cur["prev"] == F.col("_pv"), "left")
            .select(
                "walk_id",
                F.concat(F.col("path"), F.array(pick)).alias("path"),
                pick.alias("v"),
                F.col("v").alias("prev"),
            )
        )
    return cur.select(
        "walk_id", F.posexplode(F.col("path")).alias("step", "v")
    )
