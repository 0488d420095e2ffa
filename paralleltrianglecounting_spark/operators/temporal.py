"""Temporal joins — the time-series join family (as-of join, interval
join) that event/clickstream analytics needs and plain equi-joins
cannot express.

Reference scope note: the reference engine
(RiccardoRevalor/ParallelTriangleCounting) has no temporal operators;
these extend the engine's event-analytics surface (sessionize,
event_funnel, event_transitions in operators/stats.py) with the two
classic temporal join shapes, built Spark-first:

- ``asof_join``: for each left row, the single most recent right row
  with ``right_ts <= left_ts`` on the same key ("attribution" /
  "last-tick" join). NOT implemented as a per-row range probe or a
  windowed range join: both sides are unioned with a side tag and a
  single per-key window carries the latest right-side values forward
  with ``last(..., ignorenulls=True)``. One shuffle on the key, one
  sort — the same cost as one window function, independent of how
  many right rows precede each left row. This is the standard
  scalable as-of plan (a naive ``left.ts >= right.ts`` theta-join is
  O(|L|·|R|) per key and explodes on active keys).
- ``interval_join``: match point rows (key, ts) to interval rows
  (key, start, end) with ``start <= ts <= end``. With a key whose
  per-key cardinality is bounded, a keyed equi-join plus the range
  predicate is the right plan; for heavy keys (or no key) the
  ``bucket_s`` path applies the classic range-bucketing rewrite:
  intervals explode to the coarse time buckets they overlap, points
  compute their single bucket, and the join runs on (key, bucket)
  with the exact predicate re-checked after — each point meets an
  interval through exactly one bucket (the point's own), so the
  rewrite needs no duplicate elimination and the join fan-out is
  bounded by intervals-per-bucket, never intervals-per-key.

Portability contract (for the correctness gates): timestamps are
compared in exact integer microseconds (Spark ``unix_micros`` ≡ DuckDB
``epoch_us``) — never fractional-second doubles — and every window
order is a TOTAL order (ts_us, side tag, event id), the
event_transitions lesson.

Scale shapes at 100 TB:
- as-of: one hash exchange of |L|+|R| rows on the key + one in-
  partition sort; state per task is one row of carried values. Skewed
  keys follow the sessionization bound (one user's history must sort
  in one task — bounded by per-user activity, not corpus size).
- interval bucketed: Σ over intervals of ceil(len/bucket_s)+1 exploded
  rows; choosing bucket_s ≈ median interval length keeps the blowup
  ≤ 2× while bounding per-bucket fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "interval_join",
    "purchase_attribution",
    "temporal_pair_counts",
]

def _us(col):
    """Exact integer microseconds since the epoch — the portable
    comparison domain (Spark ``unix_micros`` ≡ DuckDB ``epoch_us``).
    Parquet timestamps load as TIMESTAMP_NTZ; with the session pinned
    to UTC (session.py) the cast to TIMESTAMP is instant-preserving
    and matches DuckDB's UTC reading of the same naive value."""
    return F.unix_micros(F.col(col).cast("timestamp"))



def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    left_id: str = "event_id",
    right_id: str = "event_id",
    strict: bool = False,
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """For each row of ``left``, attach the single closest row of
    ``right`` on the same ``on`` key: the most recent at-or-before
    (``direction="backward"``, the default) or the earliest
    at-or-after (``direction="forward"``); ``strict=True`` excludes
    equal timestamps. ``tolerance_s`` bounds the match gap (a match
    farther than the tolerance reverts to no-match) — the
    pandas ``merge_asof`` surface, distributed. Left rows with no
    match keep NULL right columns (left-outer as-of semantics).

    Output: every ``left`` column, plus ``asof_<right_id>``,
    ``asof_ts_us`` and ``asof_<c>`` for each c in ``right_cols``, plus
    ``<left_ts>_us`` (the left timestamp in exact integer
    microseconds — the comparison domain).

    Tie semantics are pinned by the union tag: at equal timestamps the
    right row is visible to the left row unless ``strict``; among
    several right rows at the winning timestamp the highest
    ``right_id`` is carried (the id finishes the total order). The
    forward direction is the backward machinery on the NEGATED
    microsecond axis — one implementation, both directions, identical
    tie rules mirrored.

    Contract: ``left_id``/``right_id`` must be integral columns (they
    finish the total sort order and the right id is carried as LONG;
    under ANSI mode a non-numeric id column raises rather than
    silently nulling).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    sign = 1 if direction == "backward" else -1
    r_tag, l_tag = (0, 1) if not strict else (1, 0)
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("_k"),
        (F.lit(sign) * _us(left_ts)).alias("_sort_us"),
        F.lit(l_tag).alias("_tag"),
        F.col(left_id).alias("_oid"),
        _us(left_ts).alias("_true_us"),
        F.struct(*lcols).alias("_l"),
        F.lit(None).cast("long").alias("_rid"),
        F.lit(None).cast("long").alias("_rts_us"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in right_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        (F.lit(sign) * _us(right_ts)).alias("_sort_us"),
        F.lit(r_tag).alias("_tag"),
        F.col(right_id).alias("_oid"),
        _us(right_ts).alias("_true_us"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.col(right_id).cast("long").alias("_rid"),
        _us(right_ts).alias("_rts_us"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_sort_us", "_tag", "_oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_tag",
        "_l",
        "_true_us",
        F.last("_rid", ignorenulls=True).over(w).alias("asof_rid"),
        F.last("_rts_us", ignorenulls=True).over(w).alias("asof_ts_us"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    in_tol = F.lit(True)
    if tolerance_s is not None:
        gap = F.lit(sign) * (F.col("_true_us") - F.col("asof_ts_us"))
        in_tol = gap <= int(tolerance_s) * 1_000_000
    out = carried.where(F.col("_tag") == l_tag).select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        F.col("_true_us").alias(f"{left_ts}_us"),
        F.when(in_tol, F.col("asof_rid")).alias(f"asof_{right_id}"),
        F.when(in_tol, F.col("asof_ts_us")).alias("asof_ts_us"),
        *[
            F.when(in_tol, F.col(f"asof_{c}")).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_s: int | None = None,
) -> DataFrame:
    """Inner-join point rows to the interval rows containing them:
    same ``on`` key and ``start <= ts <= end`` (both ends inclusive —
    the session_window convention pinned by the sessionization gate).

    Output: every ``points`` column plus every non-key ``intervals``
    column. A point inside k overlapping intervals emits k rows.

    ``bucket_s=None``: keyed equi-join + range predicate (right when
    per-key interval counts are bounded — Catalyst pushes the
    predicate into the join). ``bucket_s=N``: the range-bucketing
    rewrite — intervals explode to each N-second bucket they overlap,
    points join on (key, their single bucket), predicate re-checked.
    A (point, interval) pair can only meet in the point's own bucket,
    so the rewrite is duplicate-free by construction.
    """
    icols = [c for c in intervals.columns if c != on]
    if bucket_s is None:
        p = points.alias("p")
        i = intervals.alias("i")
        return p.join(
            i,
            (F.col(f"p.{on}") == F.col(f"i.{on}"))
            & (_us(f"p.{point_ts}")
               >= _us(f"i.{start_col}"))
            & (_us(f"p.{point_ts}")
               <= _us(f"i.{end_col}")),
            "inner",
        ).select("p.*", *[F.col(f"i.{c}") for c in icols])
    b_us = int(bucket_s) * 1_000_000
    # Bucket ids use exact integer division (`div`, the stats.py
    # discipline) — double division + cast('long') is exact only while
    # |µs| < 2^53 and would let the two sides of the join round a
    # boundary timestamp differently once past it. `div` truncates
    # toward zero, which keeps the rewrite sound: trunc is monotonic,
    # so a point in [start, end] still lands inside
    # sequence(start div b, end div b).
    i_b = intervals.select(
        F.col(on).alias("_ik"),
        *[F.col(c) for c in icols],
        _us(start_col).alias("_s_us"),
        _us(end_col).alias("_e_us"),
    ).select(
        "_ik",
        *icols,
        F.explode(
            F.sequence(
                F.expr(f"_s_us div {b_us}"),
                F.expr(f"_e_us div {b_us}"),
            )
        ).alias("_bucket"),
    )
    p_b = points.withColumn("_pt_us", _us(point_ts)).withColumn(
        "_bucket", F.expr(f"_pt_us div {b_us}")
    ).drop("_pt_us")
    joined = p_b.join(
        i_b,
        (p_b[on] == i_b["_ik"]) & (p_b["_bucket"] == i_b["_bucket"]),
        "inner",
    )
    return joined.where(
        (_us(point_ts) >= _us(start_col))
        & (_us(point_ts) <= _us(end_col))
    ).select(*[F.col(c) for c in points.columns], *[F.col(c) for c in icols])


def purchase_attribution(events: DataFrame) -> DataFrame:
    """Last-touch attribution: every 'purchase' event joined as-of to
    the same user's most recent 'click' at-or-before the purchase —
    THE canonical as-of join of clickstream analytics. Output (one row
    per purchase):

      [purchase_id, user_id, purchase_ts_us, click_id, click_ts_us,
       gap_us, click_value, matched]

    Unmatched purchases (no prior click) keep the row with sentinel
    -1 ids / 0 gap / 0.0 value and matched = 0, so the result is a
    total function of the purchase set and hash-gateable (NULLs would
    break the value-hash row sort).
    """
    purchases = events.where(F.col("event_type") == "purchase")
    clicks = events.where(F.col("event_type") == "click")
    j = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=("value",),
    )
    matched = F.col("asof_event_id").isNotNull()
    return j.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        F.coalesce("asof_event_id", F.lit(-1)).alias("click_id"),
        F.coalesce("asof_ts_us", F.lit(-1)).alias("click_ts_us"),
        F.coalesce(
            F.col("ts_us") - F.col("asof_ts_us"), F.lit(0)
        ).alias("gap_us"),
        F.coalesce("asof_value", F.lit(0.0)).alias("click_value"),
        matched.cast("int").alias("matched"),
    )


def temporal_pair_counts(
    events: DataFrame,
    delta_s: int = 600,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """[src_type, dst_type, n] — δ-temporal 2-event motif counts
    (Paranjape et al., WSDM 2017 family): for every ordered pair of
    events of ONE key with ``0 < t2 − t1 <= delta_s``, count by the
    (earlier type, later type) pair. ALL pairs inside the window — the
    deliberate contrast to ``event_transitions``, which counts only
    CONSECUTIVE pairs: motif counts see through interleaving (a view
    between click and purchase does not hide the click→purchase
    signal).

    The quadratic-looking predicate runs as the banded range join:
    the earlier side replicates to its own δ-bucket and the next
    (every partner within δ lives in one of those two), the later
    side stays at its single bucket, the join is a plain equi-join on
    (key, bucket) and the exact window predicate is re-checked. Each
    qualifying pair meets exactly once — the later event's bucket is
    unique, and the earlier event's two replicas carry distinct
    buckets — so no dedup. Join fan-out is bounded by events-per-
    (key, δ-bucket), never events-per-key: one hot user costs work
    proportional to their activity density × δ, not activity².

    Strictly-after semantics (t2 > t1): equal-timestamp pairs are
    excluded in both directions — an unordered pair has no earlier
    member, and counting it either way would be an engine lottery.
    """
    if delta_s <= 0:
        raise ValueError("delta_s must be positive")
    d_us = int(delta_s) * 1_000_000
    base = events.select(
        F.col(key_col).alias("_k"),
        F.col(type_col).alias("_ty"),
        _us(ts_col).alias("_t"),
    )
    early = base.select(
        "_k",
        F.col("_ty").alias("src_type"),
        F.col("_t").alias("_t1"),
        F.explode(
            # integer `div`, not double division: exact at any µs
            # magnitude, and trunc-consistent bucket ids on both sides
            # keep the "partner lives in bucket b or b+1" coverage
            # (boundaries are >= d_us apart, so a window of d_us
            # crosses at most one).
            F.array(
                F.expr(f"_t div {d_us}"),
                F.expr(f"_t div {d_us}") + 1,
            )
        ).alias("_b"),
    )
    late = base.select(
        "_k",
        F.col("_ty").alias("dst_type"),
        F.col("_t").alias("_t2"),
        F.expr(f"_t div {d_us}").alias("_b"),
    )
    pairs = early.join(late, ["_k", "_b"]).where(
        (F.col("_t2") > F.col("_t1")) & (F.col("_t2") - F.col("_t1") <= d_us)
    )
    return pairs.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n")
    )
