"""Quotient (super-)graph: collapse a graph through a vertex→group
mapping — the host-graph aggregation of web analytics (page graph →
host graph, the standard first reduction of any web-scale link corpus)
and the attribute-rollup step of entity graphs (part → brand,
repo → org, page → site).

Distinct from ``coarsen_graph`` (operators/matching.py), which derives
its grouping FROM the graph (a maximal matching); here the grouping is
an EXTERNAL attribute table, so the operator is a pure relational
composition: two mapping joins + one canonicalize + one count/sum
aggregate.

Scale shape at 100 TB: the mapping join is the whole story. A host map
for a trillion-edge page graph is ~1e8 rows — small enough to
broadcast; an arbitrary entity→group table shuffles both sides on the
vertex key (the edge table pre-partitioned on src re-uses its layout
for the first join). The aggregate is map-side combinable: intra-group
edge mass collapses before the exchange, which is exactly why host
graphs are computed this way — the output is |groups|² at worst and
usually tiny.

Semantics:
- vertices missing from the mapping keep their own id as group when
  ``keep_unmapped=True`` (id-collision-safe only if group ids and
  vertex ids share a namespace deliberately), else their edges are
  dropped;
- intra-group edges surface as self-loops (src_group == dst_group)
  with their exact collapsed weight — callers that don't want them
  filter one predicate; dropping them silently would hide the mass a
  group absorbs, the number host-graph analyses actually read;
- output is canonical (src_group <= dst_group), parallel collapsed
  edges sum into ``weight``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quotient_graph"]


def quotient_graph(
    edges: DataFrame,
    mapping: DataFrame,
    weight_col: str | None = None,
    keep_unmapped: bool = False,
    broadcast_mapping: bool = True,
) -> DataFrame:
    """[src_group, dst_group, weight] — the quotient multigraph of
    ``edges`` (src, dst[, weight_col]) under ``mapping``
    (vertex, group). ``weight`` is the count of collapsed edges, or
    the sum of ``weight_col`` when given. Self-loops (intra-group
    mass) are emitted; filter ``src_group != dst_group`` to drop."""
    m = mapping.select("vertex", "group")
    if broadcast_mapping:
        m = F.broadcast(m)
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    joined = (
        edges.select(
            F.col("src"), F.col("dst"), w.alias("_w")
        )
        .join(
            m.withColumnsRenamed({"vertex": "src", "group": "_gs"}),
            "src",
            "left",
        )
        .join(
            m.withColumnsRenamed({"vertex": "dst", "group": "_gd"}),
            "dst",
            "left",
        )
    )
    if keep_unmapped:
        gs = F.coalesce("_gs", F.col("src"))
        gd = F.coalesce("_gd", F.col("dst"))
    else:
        joined = joined.where(
            F.col("_gs").isNotNull() & F.col("_gd").isNotNull()
        )
        gs, gd = F.col("_gs"), F.col("_gd")
    return (
        joined.select(
            F.least(gs, gd).alias("src_group"),
            F.greatest(gs, gd).alias("dst_group"),
            "_w",
        )
        .groupBy("src_group", "dst_group")
        .agg(F.sum("_w").alias("weight"))
    )
