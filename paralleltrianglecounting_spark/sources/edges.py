"""Canonical edge tables from co-occurrence self-joins.

The production data model (BASELINE.json ``input_hint``): an Iceberg/
parquet table of source-code repositories ``(repo, path, commit, lang,
content)``; the link graph has an edge between two repos that share a
path (or commit). This module generalizes that to *any* (container,
entity) pair — two entities are linked iff they co-occur in a container
— and mirrors the reference generator's edge semantics exactly:
canonical ``(min, max)`` + global dedup
(``graph_generator/generate_graph.py:22-31``).

Scale notes (the part that matters at 100 TB):
- the self-join shuffles both sides on the container key once; Spark's
  partial aggregation dedups pairs map-side before the final distinct;
- a *hub* container with k members emits k² pairs. ``max_container_size``
  drops containers above a threshold (the standard cap for bipartite
  projections — e.g. a path like ``README.md`` shared by every repo
  carries no link signal and would alone produce ~|repos|² edges);
- the distinct() on (src, dst) is a hash aggregate whose key space is
  the edge set itself — AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize_edges",
    "cooccurrence_edges",
    "weighted_cooccurrence_edges",
    "weighted_part_graph",
    "part_graph",
    "supplier_graph",
    "order_chain_graph",
    "order_chain_digraph",
    "bidirected",
    "replicated",
]


def canonicalize_edges(df: DataFrame, u: str = "src", v: str = "dst") -> DataFrame:
    """Normalize an arbitrary pair table to the canonical undirected edge
    set: ``src < dst``, no self-loops, no duplicates.

    Equivalent of the reference's undirected-equality edge set
    (``sequential_edge_it/seq_edge_it_v1.cpp:26-40``).
    """
    return (
        df.where(F.col(u) != F.col(v))
        .select(
            F.least(F.col(u), F.col(v)).cast("long").alias("src"),
            F.greatest(F.col(u), F.col(v)).cast("long").alias("dst"),
        )
        .distinct()
    )


def cooccurrence_edges(
    df: DataFrame,
    container: str,
    entity: str,
    max_container_size: int | None = None,
) -> DataFrame:
    """Edges between distinct entities sharing a container.

    Plan: (optional hub filter) → self-join on the container key with the
    strict ``a.entity < b.entity`` predicate (each unordered pair emitted
    once per shared container — upper-triangle selection, the relational
    form of the reference's ``j > i`` harvest,
    ``sequential_edge_it/seq_edge_it_v1.cpp:123-128``) → distinct.

    The join is an equi-join on ``container``: Catalyst picks SMJ or
    shuffled-hash; both sides are the same table so the shuffle is
    reused. With ``max_container_size`` set, the filter is computed with
    one extra aggregation and applied *before* the join — at scale this
    is the difference between |E| and |repos|² rows.
    """
    pairs = df.select(
        F.col(container).alias("_c"), F.col(entity).cast("long").alias("_e")
    ).distinct()
    if max_container_size is not None:
        sizes = pairs.groupBy("_c").agg(F.count("*").alias("_n"))
        keep = sizes.where(F.col("_n") <= max_container_size).select("_c")
        pairs = pairs.join(F.broadcast(keep), "_c")
    a = pairs.alias("a")
    b = pairs.alias("b")
    return (
        a.join(b, (F.col("a._c") == F.col("b._c")) & (F.col("a._e") < F.col("b._e")))
        .select(F.col("a._e").alias("src"), F.col("b._e").alias("dst"))
        .distinct()
    )


def weighted_cooccurrence_edges(
    df: DataFrame,
    container: str,
    entity: str,
    max_container_size: int | None = None,
) -> DataFrame:
    """[src, dst, weight]: the weighted projection — ``weight`` = number
    of containers the pair shares (repos sharing 3 paths get weight 3).
    Same plan as :func:`cooccurrence_edges` with the final ``distinct``
    replaced by a (src, dst) count agg — identical shuffle shape, one
    extra aggregate column. Canonical ``src < dst``, no self-loops.
    """
    pairs = df.select(
        F.col(container).alias("_c"), F.col(entity).cast("long").alias("_e")
    ).distinct()
    if max_container_size is not None:
        sizes = pairs.groupBy("_c").agg(F.count("*").alias("_n"))
        keep = sizes.where(F.col("_n") <= max_container_size).select("_c")
        pairs = pairs.join(F.broadcast(keep), "_c")
    a = pairs.alias("a")
    b = pairs.alias("b")
    return (
        a.join(b, (F.col("a._c") == F.col("b._c")) & (F.col("a._e") < F.col("b._e")))
        .groupBy(
            F.col("a._e").alias("src"), F.col("b._e").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def weighted_part_graph(spark, sf_dir: str) -> DataFrame:
    """Weighted twin of :func:`part_graph`: weight = shared-order count."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    return weighted_cooccurrence_edges(li, "l_orderkey", "l_partkey")


def part_graph(spark, sf_dir: str, max_container_size: int | None = None) -> DataFrame:
    """The engine's canonical benchmark graph: parts co-occurring in an
    order (testdata's analog of repos sharing a path). ~2k vertices /
    116k edges at sf0.01; ~20k vertices at sf0.1."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey")
    return cooccurrence_edges(li, "l_orderkey", "l_partkey", max_container_size)


def supplier_graph(spark, sf_dir: str) -> DataFrame:
    """Smaller/denser variant: suppliers co-occurring in an order."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    return cooccurrence_edges(li, "l_orderkey", "l_suppkey")


def order_chain_graph(spark, sf_dir: str) -> DataFrame:
    """Sparse DEEP graph: consecutive orders of the same customer, in
    (o_orderdate, o_orderkey) succession — a disjoint union of paths,
    one per customer (median length ~10 orders at every sf). The
    structural opposite of the dense co-occurrence graphs: eccentricity
    ~path length instead of 2, so multi-round frontier algorithms (BFS)
    are exercised over many supersteps instead of saturating in one.

    Plan shape: one window (lead over customer partitions — shuffles on
    o_custkey once, partitions are single-customer sized so no skew) →
    canonicalize. At 100 TB the window is the textbook sessionization
    scan: linear, one shuffle, no self-join."""
    from pyspark.sql.window import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = o.select(
        F.col("o_orderkey").alias("a"),
        F.lead("o_orderkey").over(w).alias("b"),
    ).where(F.col("b").isNotNull())
    return canonicalize_edges(nxt, "a", "b")


def order_chain_digraph(spark, sf_dir: str) -> DataFrame:
    """DIRECTED twin of :func:`order_chain_graph`: src = earlier order,
    dst = its customer's next order in (o_orderdate, o_orderkey)
    succession — a disjoint union of directed paths, acyclic by
    construction (time moves forward). The engine's canonical DAG for
    layering/topological operators; same one-window plan shape."""
    from pyspark.sql.window import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            F.col("o_orderkey").cast("long").alias("src"),
            F.lead("o_orderkey").over(w).cast("long").alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )


def order_cycle_digraph(
    spark, sf_dir: str, min_cycle: int = 12
) -> DataFrame:
    """:func:`order_chain_digraph` plus a cycle-closing back edge
    (last order → first order, in the same (o_orderdate, o_orderkey)
    succession) for every customer with at least ``min_cycle`` orders —
    the engine's canonical digraph with NONTRIVIAL strongly connected
    components. Structure by construction:

    - customers with ≥ ``min_cycle`` orders: the whole chain closes
      into one directed cycle → one SCC per such customer, id = the
      customer's minimum order key (cycle length 12-25 at every sf, so
      SCC coloring needs ~cycle-length directed hops);
    - customers with 2..``min_cycle``-1 orders: pure directed paths →
      every vertex its own singleton SCC (consumed by the trim phase,
      up to ~min_cycle-1 trim hops);
    - single-order customers contribute no edges (and no vertices).

    That split (≈1/3 of customers over the threshold at the default 12)
    gives every phase of the FW-BW coloring decomposition real work,
    and the SCC answer has an INDEPENDENT closed form — per customer,
    min(orderkey) if n ≥ min_cycle else the vertex itself — so the
    DuckDB gate oracle never has to replay the iteration.

    Plan shape: the chain window and the first/last aggregate both key
    on o_custkey — one shuffle each over the orders scan, no self-join,
    back-edge side is |customers| rows. Linear at 100 TB."""
    from pyspark.sql.window import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chain = o.select(
        F.col("o_orderkey").cast("long").alias("src"),
        F.lead("o_orderkey").over(w).cast("long").alias("dst"),
    ).where(F.col("dst").isNotNull())
    pos = F.struct("o_orderdate", "o_orderkey")
    back = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(pos).alias("first"),
            F.max(pos).alias("last"),
        )
        .where(F.col("n") >= min_cycle)
        .select(
            F.col("last.o_orderkey").cast("long").alias("src"),
            F.col("first.o_orderkey").cast("long").alias("dst"),
        )
    )
    return chain.unionByName(back)


def order_bowtie_digraph(
    spark, sf_dir: str, min_cycle: int = 12, head: int = 3, tail: int = 3
) -> DataFrame:
    """:func:`order_chain_digraph` plus a back edge closing only the
    MIDDLE of the chain — position ``n - tail`` → position
    ``head + 1`` (same (o_orderdate, o_orderkey) succession) for every
    customer with at least ``min_cycle`` orders — the bowtie gate
    graph. Structure by construction, per cycle customer:

    - positions ``head+1 .. n-tail`` form one directed cycle (the SCC,
      length ``n - head - tail`` ≥ ``min_cycle - head - tail``);
    - positions ``1 .. head`` are a path INTO the cycle (IN side);
    - positions ``n-tail+1 .. n`` are a path OUT of it (OUT side);
    - path customers (2..min_cycle-1 orders) stay pure chains.

    So the Broder census relative to the LARGEST such cycle has an
    INDEPENDENT closed form — row_number + count windows, no iteration
    — which is what the ``bowtie_structure`` gate oracle uses."""
    from pyspark.sql.window import Window

    if head < 1 or tail < 1 or min_cycle <= head + tail + 1:
        raise ValueError(
            "order_bowtie_digraph: need head, tail >= 1 and "
            "min_cycle > head + tail + 1"
        )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    pos = o.select(
        F.col("o_orderkey").cast("long").alias("v"),
        F.col("o_custkey").alias("c"),
        F.row_number().over(w).alias("p"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n"),
    )
    chain = o.select(
        F.col("o_orderkey").cast("long").alias("src"),
        F.lead("o_orderkey").over(w).cast("long").alias("dst"),
    ).where(F.col("dst").isNotNull())
    cyc = pos.where(F.col("n") >= min_cycle)
    back = (
        cyc.where(F.col("p") == F.col("n") - F.lit(tail))
        .select("c", F.col("v").alias("src"))
        .join(
            cyc.where(F.col("p") == F.lit(head + 1)).select(
                "c", F.col("v").alias("dst")
            ),
            "c",
        )
        .select("src", "dst")
    )
    return chain.unionByName(back)


def replicated(edges: DataFrame, copies: int, offset: int = 1 << 32) -> DataFrame:
    """Disjoint union of ``copies`` isomorphic copies of the graph,
    vertex ids shifted by ``k * offset`` per copy — the deterministic
    scale-up used by the scaling bench (tools/scaling.py) to make the
    compute part of a job dominate its fixed per-query cost at sandbox
    scale. Every per-copy invariant (triangle count, component sizes,
    degree histogram) multiplies by exactly ``copies``; ids must be
    below ``offset`` (true for all testdata graphs; production xxhash64
    ids would replicate by hashing (id, copy) instead)."""
    spark = edges.sparkSession
    copy_ids = spark.range(copies).select(F.col("id").alias("_copy"))
    return edges.crossJoin(copy_ids).select(
        (F.col("src") + F.col("_copy") * F.lit(offset)).alias("src"),
        (F.col("dst") + F.col("_copy") * F.lit(offset)).alias("dst"),
    )


def bidirected(edges: DataFrame) -> DataFrame:
    """Both directions of each canonical edge — the adjacency-map view
    (``utils/utils.cpp:58-59`` inserts u→v and v→u)."""
    return edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
