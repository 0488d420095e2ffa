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

__all__ = [
    "event_funnel",
    "event_transitions",
    "group_quantiles",
    "ohlc_bars",
    "rollup_totals",
    "sessionize",
    "sliding_window_counts",
    "time_weighted_avg",
]


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """[src_type, dst_type, n] — per-user consecutive event-type
    transition counts: the empirical Markov transition multigraph of a
    clickstream (funnel mining, next-action prediction features, bot
    detection via improbable transitions). Successor order is
    (ts, event_id, *tiebreak_cols) per user — the succession must be a
    TOTAL order or the count table is engine-dependent (each engine
    breaks window ties its own way), so callers whose (ts, id) pair
    is not unique per user pass enough ``tiebreak_cols`` to finish the
    order (the sessionize lesson; rows identical across ALL order
    columns stay harmless — swapping identical rows produces the same
    transition multiset).

    Scale shape at 100 TB: one per-user window (shuffle on the user
    key — skew follows user activity, the sessionization bound) + one
    map-side-combinable hash agg down to |types|² rows. The output is
    a weighted digraph ready for the digraph operators (reciprocity,
    directed_pagerank over types, condensation)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col, *tiebreak_cols)
    nxt = events.select(
        F.col(type_col).alias("src_type"),
        F.lead(type_col).over(w).alias("dst_type"),
    ).where(F.col("dst_type").isNotNull())
    return nxt.groupBy("src_type", "dst_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """[key, window_start, n_events, sum_value_r]: overlapping
    (sliding) time windows — each event lands in window/slide windows
    (2 for the 1h/30min default). Built on Spark's ``window()``
    expression, whose starts are epoch-aligned multiples of the slide;
    the batch form here is the backfill twin of the streaming sliding
    aggregation (same expression under ``readStream``).

    Plan: the window expression EXPANDS each row into its covering
    windows (an explode, factor window/slide) and one hash agg — linear
    with a small constant, partial aggregation shrinking the stream
    map-side. The value sum is rounded to 4 dp for the gate (double
    sums at this group size are stable well past 4 dp)."""
    w = F.window(F.col(ts_col), window, slide)
    return (
        events.groupBy(key_col, w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value_r"),
        )
        .select(
            key_col,
            F.col("w.start").alias("window_start"),
            "n_events",
            "sum_value_r",
        )
    )

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


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """[user_id, session_id, session_start, session_end, n_events]:
    gap-based sessionization — a new session starts whenever a user is
    idle longer than ``gap_minutes``. The classic two-window form:
    ``lag`` marks session boundaries, a running sum over the boundary
    flags numbers the sessions (both windows partitioned per user —
    never a global sort), then one hash agg per (user, session).

    Session ids are 1-based per user in time order — deterministic and
    engine-portable (ties on ts within one user break by the event
    order, which both engines resolve identically only when ts is
    unique per user; the events fixture's ts is unique per user at all
    tiers, and real pipelines should add a tiebreak column to the sort
    if theirs is not).

    Scale shape at 100 TB: two per-user windows + one hash agg — the
    shuffle key is the user id, so skew follows user activity; a
    monster user costs one task's sort of their events, the standard
    sessionization bound. The streaming analog is a session window with
    watermarked state; this is the batch/backfill twin.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    # exact integer microseconds (unix_micros ≡ DuckDB epoch_us), the
    # temporal.py portability discipline: unix_timestamp() truncates to
    # whole seconds, so a real gap of 1800.4 s could floor to exactly
    # 1800 and silently NOT split while any fractional-second engine
    # splits — caught by the generated-tier sweep (gap 1800.456951 s,
    # sf0.02, user 122)
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            > gap_us
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    marked = events.select(
        user_col, ts_col, new_sess.alias("_new")
    ).withColumn(
        "session_id",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return marked.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


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


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """[step_idx, step_type, users_reached] — the ordered funnel: a
    user reaches step k iff they performed steps[k] STRICTLY AFTER the
    earliest time they reached step k-1 (earliest-completion semantics
    — the standard product-analytics funnel; strictly-after means a
    same-timestamp pair never counts as ordered, identical in both
    engines), and, when ``within_seconds`` is set, within that many
    seconds of it (the conversion-window form — without it a
    long-lived user eventually "converts" by accident and the funnel
    degenerates to activity counting). users_reached is monotonically
    non-increasing by construction.

    Plan shape at 100 TB: step 0 is one type-filtered min(ts) hash agg
    (the type predicate pushes to the scan); each later step is one
    type-filtered scan joined to the previous step's per-user frontier
    on the user key — k passes over the events source, each pruned to
    one event type, with per-user state of exactly one timestamp. The
    k single-row counts union into one k-row result; no windows, no
    per-user event sorting."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    levels = [cur]
    for s in steps[1:]:
        ordered = F.col(ts_col) > F.col("_t")
        if within_seconds is not None:
            # exact integer µs, not unix_timestamp's whole-second floor
            # (same boundary hazard as sessionize — see its comment)
            ordered = ordered & (
                F.unix_micros(F.col(ts_col).cast("timestamp"))
                - F.unix_micros(F.col("_t").cast("timestamp"))
                <= F.lit(int(within_seconds) * 1_000_000)
            )
        nxt = (
            events.where(F.col(type_col) == s)
            .join(cur, user_col)
            .where(ordered)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        levels.append(nxt)
        cur = nxt
    out = None
    for idx, (s, lv) in enumerate(zip(steps, levels)):
        row = lv.agg(
            F.lit(idx).cast("int").alias("step_idx"),
            F.lit(s).alias("step_type"),
            F.count(F.lit(1)).alias("users_reached"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    epoch: str = "2024-01-01",
    bucket_days: int = 7,
) -> DataFrame:
    """[cohort, offset, active_users, cohort_size, retention_r] — the
    classic retention triangle: users are cohorted by the bucket of
    their FIRST event and counted distinct in every bucket they
    reappear in; ``retention_r = active_users / cohort_size`` (offset
    0 is 1.0 by construction — the sanity row). Product analytics'
    one non-negotiable query; the growth-accounting primitive for any
    engagement dataset.

    Engine portability: buckets are pure integer arithmetic —
    ``datediff(event_day, epoch) div bucket_days`` — never
    ``date_trunc('week')``, whose week-start convention is an engine
    lottery. ``epoch`` pins the bucket grid explicitly and must not
    postdate the data (integer div truncates toward zero, so negative
    day indexes would fold buckets −(b−1)..b−1 together).

    Plan shape at 100 TB: the raw stream collapses to distinct
    (user, bucket) FIRST — one hash agg, the only pass over raw
    events — then a per-user min-bucket agg over that collapsed
    table, one equi-join on user_id (both sides user-bucket sized,
    not event-stream sized), and a final (cohort, offset) hash agg.
    Skew follows user activity but a monster user is already one row
    per bucket before any join."""
    ub = (
        events.select(
            F.col(user_col).alias("_u"),
            F.expr(
                f"CAST(datediff(to_date({ts_col}), DATE '{epoch}') AS BIGINT)"
                f" div {bucket_days}"
            ).alias("_b"),
        )
        .distinct()
    )
    firsts = ub.groupBy("_u").agg(F.min("_b").alias("_cohort"))
    sizes = firsts.groupBy("_cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    tri = (
        ub.join(firsts, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort"),
            (F.col("_b") - F.col("_cohort")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    return (
        tri.join(sizes.withColumnRenamed("_cohort", "cohort"), "cohort")
        .select(
            "cohort",
            "offset",
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 6).alias(
                "retention_r"
            ),
        )
        .orderBy("cohort", "offset")
    )


def ohlc_bars(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """[key, bar_start, open, high, low, close, n]: candlestick (OHLC)
    aggregation of an irregular value stream into fixed time buckets —
    the classic time-series downsampling primitive (metrics rollup,
    market bars). open/close are the first/last observation in the bar
    under the TOTAL order (ts, id) — id finishes the order because
    nothing guarantees unique timestamps within a (key, bar) group,
    and a non-total order makes open/close an engine lottery (the
    event_transitions lesson). Implemented with two row_number windows
    (asc/desc) rather than min_by/arg_min: both engines define window
    ordering identically, while composite-key arg_min tie semantics
    are not a portable contract.

    Scale shape at 100 TB: one shuffle on (key, bar) for the windows +
    one hash agg on the same key — the windows and the aggregate share
    the exchange. Bars are bounded (keys × time range), the output is
    tiny."""
    from pyspark.sql import Window

    bar = F.date_trunc(bucket, F.col(ts_col)).alias("bar_start")
    base = events.select(
        F.col(key_col).alias("key"), bar, ts_col, id_col, value_col
    )
    w_asc = Window.partitionBy("key", "bar_start").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    w_desc = Window.partitionBy("key", "bar_start").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    ranked = base.select(
        "key",
        "bar_start",
        value_col,
        F.row_number().over(w_asc).alias("_rn_a"),
        F.row_number().over(w_desc).alias("_rn_d"),
    )
    return ranked.groupBy("key", "bar_start").agg(
        F.max(F.when(F.col("_rn_a") == 1, F.col(value_col))).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max(F.when(F.col("_rn_d") == 1, F.col(value_col))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    cents: int = 100,
) -> DataFrame:
    """[key, twa_num, twa_den_s, twa_r]: exact time-weighted average of
    an irregularly sampled value stream per key — each observation
    holds until the next one (piecewise-constant / last-obs-carried-
    forward), so the mean weights each value by its holding time, not
    its sample count: the TWAP/metrics primitive a plain avg() gets
    wrong whenever sampling density correlates with level.

    Exactness contract: a raw double Σ value·Δt is partition-order-
    dependent and can never gate hash-exact, so the weighted sum is
    computed in INTEGER arithmetic — values fixed-pointed at
    ``cents`` resolution (round() is half-away-from-zero in both
    engines), holding times in whole seconds (integer div of the µs
    gap) — and the output carries the exact integer numerator and
    denominator alongside the 6-dp ratio (ONE division — bit-identical
    across engines given identical integers). The last observation per
    key has no successor and is excluded (standard TWAP-over-window
    semantics). int64 headroom: |num| ≤ Σ |v|·cents·Δt_s — at 1e6
    rows/key, |v| ≤ 1e6, year-long gaps it stays under 2^62; ANSI
    mode raises loudly past it.

    Scale shape: one per-key window (lead) + one hash agg sharing the
    same exchange; output is |keys| rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    stepped = events.select(
        F.col(key_col).alias("key"),
        F.round(F.col(value_col) * cents).cast("long").alias("_cv"),
        ts_us.alias("_t"),
        F.lead(ts_us).over(w).alias("_t_next"),
    ).where(F.col("_t_next").isNotNull())
    dt_s = F.expr("(_t_next - _t) div 1000000")
    return (
        stepped.groupBy("key")
        .agg(
            F.sum(F.col("_cv") * dt_s).alias("twa_num"),
            F.sum(dt_s).alias("twa_den_s"),
        )
        .select(
            "key",
            "twa_num",
            "twa_den_s",
            F.round(
                F.col("twa_num") / F.col("twa_den_s") / cents, 6
            ).alias("twa_r"),
        )
    )
