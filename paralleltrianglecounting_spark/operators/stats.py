"""Grouped numeric statistics — the OLAP side of the engine: exact
grouped quantiles (with the sketch variant as the scale path) and
rollup subtotal cubes.

Exactness contract: quantiles interpolate linearly over the sorted
group (Spark ``percentile`` ≡ DuckDB ``quantile_cont`` on DOUBLE —
verified, both give (n-1)·q positional interpolation); monetary sums
are aggregated in DECIMAL so they are order-independent and the gate
is hash-exact (a double sum's value depends on partition order —
never gate a raw double sum).

Scale shapes:
- ``group_quantiles`` exact: one hash-partitioned sort-based aggregate
  per group — the group's values must gather to one task (the exact-
  quantile fundamental). That is fine for bounded group counts
  (event types, languages); for high-cardinality groups or monster
  groups, ``approx=True`` switches to ``approx_percentile`` (t-digest
  style sketch, mergeable map-side, bounded error) — the 100 TB path.
- ``rollup_totals``: grouping-sets expansion — Spark computes all
  rollup levels in one pass with partial aggregation; output is
  (levels+1) × group cardinality, tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["group_quantiles", "rollup_totals"]

DEFAULT_QS = (0.25, 0.5, 0.75)


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = DEFAULT_QS,
    approx: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """[group, n, q_<p>... ]: per-group linear-interpolated quantiles
    (exact), or t-digest approximations with ``approx=True``."""
    fn = F.approx_percentile if approx else F.percentile
    aggs = [F.count(F.lit(1)).alias("n")]
    for q in qs:
        col = (
            fn(F.col(value_col), F.lit(q), F.lit(accuracy))
            if approx
            else fn(F.col(value_col), F.lit(q))
        )
        name = f"q{str(q).replace('0.', '')}_r"
        aggs.append(F.round(col, 6).alias(name))
    return df.groupBy(group_col).agg(*aggs)


def rollup_totals(
    orders: DataFrame,
    dims: tuple[str, str] = ("o_orderstatus", "o_orderpriority"),
    amount: str = "o_totalprice",
) -> DataFrame:
    """[dim1, dim2, n_orders, total_r]: ROLLUP subtotals over two
    dimensions — grand total, per-dim1, and per-(dim1, dim2) rows, the
    NULL-keyed subtotal convention shared by Spark and ANSI SQL. The
    amount is summed in DECIMAL(18,2): exact, associative, order-free —
    the only way a monetary sum gates hash-exact across engines."""
    dec = F.sum(F.col(amount).cast("decimal(18,2)"))
    return (
        orders.rollup(*dims)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(dec.cast("double"), 2).alias("total_r"),
        )
    )
