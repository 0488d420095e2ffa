"""Temporal join family (operators/temporal.py): hand cases, a pure-
Python as-of twin on random event streams, keyed-vs-bucketed interval
join identity, and the attribution gate semantics."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from paralleltrianglecounting_spark.operators.temporal import (
    asof_join,
    interval_join,
    purchase_attribution,
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=s)


_EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, _ts(s), u, t, v) for (i, s, u, t, v) in rows], _EV_SCHEMA
    )


def test_asof_hand_case(spark):
    # user 1: click@10 (v=1.5), purchase@20, click@30, purchase@25
    # user 2: purchase@5 with no prior click
    ev = _events(
        spark,
        [
            (0, 10.0, 1, "click", 1.5),
            (1, 20.0, 1, "purchase", 9.0),
            (2, 30.0, 1, "click", 2.5),
            (3, 25.0, 1, "purchase", 7.0),
            (4, 5.0, 2, "purchase", 3.0),
        ],
    )
    got = {
        r["purchase_id"]: r
        for r in purchase_attribution(ev).collect()
    }
    assert got[1]["click_id"] == 0 and got[1]["gap_us"] == 10_000_000
    assert got[3]["click_id"] == 0  # click@30 is after purchase@25
    assert got[4]["matched"] == 0
    assert got[4]["click_id"] == -1 and got[4]["click_value"] == 0.0
    assert got[1]["click_value"] == 1.5


def test_asof_equal_ts_inclusive_vs_strict(spark):
    clicks = _events(spark, [(0, 10.0, 1, "click", 1.0)])
    purchases = _events(spark, [(1, 10.0, 1, "purchase", 2.0)])
    inc = asof_join(purchases, clicks, on="user_id").collect()[0]
    assert inc["asof_event_id"] == 0  # equal-ts right row IS visible
    st = asof_join(purchases, clicks, on="user_id", strict=True).collect()[0]
    assert st["asof_event_id"] is None  # strict: equal ts excluded


def test_asof_python_twin_random(spark):
    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(6):
        for _ in range(rng.randint(3, 25)):
            rows.append(
                (
                    eid,
                    float(rng.randint(0, 500)) + eid * 1e-3,  # unique ts
                    u,
                    rng.choice(["click", "purchase", "view"]),
                    round(rng.uniform(0, 10), 2),
                )
            )
            eid += 1
    ev = _events(spark, rows)
    got = {
        r["purchase_id"]: (r["click_id"], r["gap_us"])
        for r in purchase_attribution(ev).collect()
    }
    # twin: latest click at-or-before, per user
    want = {}
    for i, s, u, t, v in rows:
        if t != "purchase":
            continue
        best = None
        for j, s2, u2, t2, _ in rows:
            if u2 == u and t2 == "click" and s2 <= s:
                if best is None or s2 > best[1]:
                    best = (j, s2)
        if best is None:
            want[i] = (-1, 0)
        else:
            us = int(round(s * 1e6)) - int(round(best[1] * 1e6))
            want[i] = (best[0], us)
    assert got == want


def test_interval_join_keyed_and_bucketed_identical(spark):
    rng = random.Random(11)
    ivals = []
    for k, u in enumerate(range(5)):
        for i in range(4):
            s = rng.randint(0, 900)
            ivals.append((u, _ts(float(s)), _ts(float(s + rng.randint(0, 300)))))
    intervals = spark.createDataFrame(ivals, ["user_id", "start", "end"]) \
        .withColumn("iid", F.monotonically_increasing_id())
    pts = _events(
        spark,
        [
            (i, float(rng.randint(0, 1200)), rng.randint(0, 4), "view", 0.0)
            for i in range(200)
        ],
    )
    keyed = interval_join(pts, intervals, on="user_id")
    bucketed = interval_join(pts, intervals, on="user_id", bucket_s=60)
    k = sorted(tuple(r) for r in keyed.select("event_id", "iid").collect())
    b = sorted(tuple(r) for r in bucketed.select("event_id", "iid").collect())
    assert k == b and len(k) > 0


def test_interval_join_inclusive_ends_and_overlap(spark):
    intervals = spark.createDataFrame(
        [(1, _ts(10.0), _ts(20.0), 100), (1, _ts(15.0), _ts(30.0), 101)],
        ["user_id", "start", "end", "iid"],
    )
    pts = _events(
        spark,
        [
            (0, 10.0, 1, "view", 0.0),  # == start: in
            (1, 20.0, 1, "view", 0.0),  # == end: in (inclusive)
            (2, 17.0, 1, "view", 0.0),  # in BOTH intervals
            (3, 30.000001, 1, "view", 0.0),  # 1 us past end: out
        ],
    )
    for bucket in (None, 7):
        got = sorted(
            tuple(r)
            for r in interval_join(
                pts, intervals, on="user_id", bucket_s=bucket
            ).select("event_id", "iid").collect()
        )
        assert got == [(0, 100), (1, 100), (1, 101), (2, 100), (2, 101)]


def test_asof_carries_latest_of_many(spark):
    # many clicks before one purchase: the LATEST must win
    rows = [(i, float(i), 1, "click", float(i)) for i in range(10)]
    rows.append((99, 50.0, 1, "purchase", 0.0))
    ev = _events(spark, rows)
    r = purchase_attribution(ev).collect()[0]
    assert r["click_id"] == 9 and r["click_value"] == 9.0


def test_ohlc_bars_hand_case(spark):
    from paralleltrianglecounting_spark.operators.stats import ohlc_bars

    ev = _events(
        spark,
        [
            # one hour bucket, key "click": open=5 (first), close=2 (last)
            (0, 100.0, 1, "click", 5.0),
            (1, 200.0, 1, "click", 9.0),
            (2, 300.0, 1, "click", 1.0),
            (3, 400.0, 1, "click", 2.0),
            # next hour
            (4, 3700.0, 1, "click", 7.0),
            # tie on ts within a bar: id breaks it (id 5 is open, 6 close)
            (5, 50.0, 1, "view", 4.0),
            (6, 50.0, 1, "view", 3.0),
        ],
    )
    got = {
        (r["key"], r["bar_start"].hour): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in ohlc_bars(ev).collect()
    }
    assert got[("click", 0)] == (5.0, 9.0, 1.0, 2.0, 4)
    assert got[("click", 1)] == (7.0, 7.0, 7.0, 7.0, 1)
    assert got[("view", 0)] == (4.0, 4.0, 3.0, 3.0, 2)


def test_time_weighted_avg_hand_case(spark):
    from paralleltrianglecounting_spark.operators.stats import (
        time_weighted_avg,
    )

    # value 10 held 30 s, value 20 held 10 s -> twa = (300+200)/40 = 12.5
    ev = _events(
        spark,
        [
            (0, 0.0, 1, "click", 10.0),
            (1, 30.0, 1, "click", 20.0),
            (2, 40.0, 1, "click", 99.0),  # last obs: excluded
        ],
    )
    r = time_weighted_avg(ev).collect()[0]
    assert r["twa_num"] == 1000 * 30 + 2000 * 10
    assert r["twa_den_s"] == 40
    assert abs(r["twa_r"] - 12.5) < 1e-9


def test_time_weighted_avg_vs_sampling_biased_mean(spark):
    """The motivating case: dense sampling at a high level drags the
    plain mean up, while the TWA stays put."""
    from paralleltrianglecounting_spark.operators.stats import (
        time_weighted_avg,
    )

    rows = [(0, 0.0, 1, "click", 1.0)]
    # level jumps to 100 for ONE second, sampled 50 times
    rows += [
        (1 + i, 1000.0 + i * 0.02, 1, "click", 100.0) for i in range(50)
    ]
    rows.append((99, 1001.0, 1, "click", 1.0))
    rows.append((100, 2000.0, 1, "click", 1.0))
    ev = _events(spark, rows)
    r = time_weighted_avg(ev).collect()[0]
    assert r["twa_r"] < 2.0  # plain mean would be ~95


def test_time_weighted_avg_single_obs_key_absent(spark):
    from paralleltrianglecounting_spark.operators.stats import (
        time_weighted_avg,
    )

    ev = _events(spark, [(0, 0.0, 1, "solo", 5.0)])
    assert time_weighted_avg(ev).count() == 0


def test_temporal_pair_counts_brute_twin(spark):
    from paralleltrianglecounting_spark.operators.temporal import (
        temporal_pair_counts,
    )

    rng = random.Random(23)
    rows = []
    eid = 0
    for u in range(5):
        for _ in range(40):
            rows.append(
                (
                    eid,
                    float(rng.randint(0, 3000)),
                    u,
                    rng.choice(["a", "b", "c"]),
                    0.0,
                )
            )
            eid += 1
    ev = _events(spark, rows)
    for delta in (60, 500):
        got = {
            (r["src_type"], r["dst_type"]): r["n"]
            for r in temporal_pair_counts(ev, delta_s=delta).collect()
        }
        want: dict = {}
        for i, t1, u1, ty1, _ in rows:
            for j, t2, u2, ty2, _ in rows:
                if u1 == u2 and t1 < t2 <= t1 + delta:
                    want[(ty1, ty2)] = want.get((ty1, ty2), 0) + 1
        assert got == want and sum(want.values()) > 0


def test_temporal_pair_counts_window_edges(spark):
    from paralleltrianglecounting_spark.operators.temporal import (
        temporal_pair_counts,
    )

    ev = _events(
        spark,
        [
            (0, 0.0, 1, "a", 0.0),
            (1, 10.0, 1, "b", 0.0),  # dt == delta: IN
            (2, 10.000001, 1, "c", 0.0),  # 1 us past: a->c OUT
            (3, 0.0, 1, "d", 0.0),  # equal ts with a: neither direction
        ],
    )
    got = {
        (r["src_type"], r["dst_type"]): r["n"]
        for r in temporal_pair_counts(ev, delta_s=10).collect()
    }
    # dt == delta inclusive; 1 µs past excluded; equal-ts pairs (a,d)
    # excluded in BOTH directions; d->c is also 1 µs past the window
    assert got == {("a", "b"): 1, ("d", "b"): 1, ("b", "c"): 1}


def test_asof_forward_direction(spark):
    from paralleltrianglecounting_spark.operators.temporal import asof_join

    clicks = _events(spark, [(0, 10.0, 1, "click", 1.0)])
    purchases = _events(
        spark,
        [(1, 5.0, 1, "purchase", 5.0), (2, 20.0, 1, "purchase", 7.0),
         (3, 50.0, 1, "purchase", 9.0)],
    )
    r = asof_join(
        clicks, purchases, on="user_id", direction="forward",
        right_cols=("value",),
    ).collect()[0]
    # earliest at-or-after 10.0 is purchase@20, not @5 or @50
    assert r["asof_event_id"] == 2 and r["asof_value"] == 7.0


def test_asof_forward_equal_ts_and_strict(spark):
    from paralleltrianglecounting_spark.operators.temporal import asof_join

    clicks = _events(spark, [(0, 10.0, 1, "click", 1.0)])
    purchases = _events(spark, [(1, 10.0, 1, "purchase", 2.0)])
    inc = asof_join(
        clicks, purchases, on="user_id", direction="forward"
    ).collect()[0]
    assert inc["asof_event_id"] == 1
    st = asof_join(
        clicks, purchases, on="user_id", direction="forward", strict=True
    ).collect()[0]
    assert st["asof_event_id"] is None


def test_asof_tolerance_reverts_to_no_match(spark):
    from paralleltrianglecounting_spark.operators.temporal import asof_join

    clicks = _events(spark, [(0, 100.0, 1, "click", 1.0)])
    purchases = _events(spark, [(1, 10.0, 1, "purchase", 2.0)])
    # backward gap is 90 s: inside 100 s tolerance, outside 60 s
    ok = asof_join(
        clicks, purchases, on="user_id", tolerance_s=100
    ).collect()[0]
    assert ok["asof_event_id"] == 1
    far = asof_join(
        clicks, purchases, on="user_id", tolerance_s=60
    ).collect()[0]
    assert far["asof_event_id"] is None and far["asof_ts_us"] is None


def test_asof_forward_python_twin(spark):
    from paralleltrianglecounting_spark.operators.temporal import asof_join

    rng = random.Random(31)
    rows = []
    eid = 0
    for u in range(4):
        for _ in range(rng.randint(5, 20)):
            rows.append(
                (eid, float(rng.randint(0, 300)) + eid * 1e-3, u,
                 rng.choice(["click", "purchase"]), 0.0)
            )
            eid += 1
    ev = _events(spark, rows)
    clicks = ev.where("event_type = 'click'")
    purchases = ev.where("event_type = 'purchase'")
    got = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(
            clicks, purchases, on="user_id", direction="forward"
        ).collect()
    }
    want = {}
    for i, s, u, t, _ in rows:
        if t != "click":
            continue
        cands = [
            (s2, j) for j, s2, u2, t2, _ in rows
            if u2 == u and t2 == "purchase" and s2 >= s
        ]
        want[i] = min(cands)[1] if cands else None
    assert got == want


def test_asof_bad_direction_raises(spark):
    import pytest as _pytest

    from paralleltrianglecounting_spark.operators.temporal import asof_join

    ev = _events(spark, [(0, 0.0, 1, "click", 0.0)])
    with _pytest.raises(ValueError):
        asof_join(ev, ev, on="user_id", direction="sideways")


def test_bucketed_paths_exact_for_pre_epoch_timestamps(spark):
    """Pre-1970 timestamps give negative epoch-microseconds; the bucket
    ids must be computed with integer arithmetic consistently on both
    sides of each bucketed join (ADVICE r04 #1). Keyed-vs-bucketed
    interval join identity and a brute-force pair-count twin, entirely
    in the negative range."""
    old = dt.datetime(1960, 1, 1)

    def ots(s):
        return old + dt.timedelta(seconds=s)

    rng = random.Random(7)
    ivals = []
    for u in range(3):
        for _ in range(5):
            s = rng.randint(0, 900)
            ivals.append((u, ots(float(s)), ots(float(s + rng.randint(0, 200)))))
    intervals = spark.createDataFrame(
        ivals, ["user_id", "start", "end"]
    ).withColumn("iid", F.monotonically_increasing_id())
    pts = spark.createDataFrame(
        [
            (i, ots(float(rng.randint(0, 1100))), rng.randint(0, 2), "view", 0.0)
            for i in range(150)
        ],
        _EV_SCHEMA,
    )
    keyed = interval_join(pts, intervals, on="user_id")
    bucketed = interval_join(pts, intervals, on="user_id", bucket_s=60)
    k = sorted(tuple(r) for r in keyed.select("event_id", "iid").collect())
    b = sorted(tuple(r) for r in bucketed.select("event_id", "iid").collect())
    assert k == b and len(k) > 0

    from paralleltrianglecounting_spark.operators.temporal import (
        temporal_pair_counts,
    )

    rows = []
    for i in range(120):
        rows.append(
            (i, float(rng.randint(0, 400)), rng.randint(0, 2),
             rng.choice(["a", "b", "c"]), 0.0)
        )
    ev = spark.createDataFrame(
        [(i, ots(s), u, t, v) for (i, s, u, t, v) in rows], _EV_SCHEMA
    )
    delta = 30
    got = sorted(
        (r["src_type"], r["dst_type"], r["n"])
        for r in temporal_pair_counts(ev, delta_s=delta).collect()
    )
    brute: dict[tuple[str, str], int] = {}
    for i, s1, u1, t1, _ in rows:
        for j, s2, u2, t2, _ in rows:
            if u1 == u2 and 0 < s2 - s1 <= delta:
                brute[(t1, t2)] = brute.get((t1, t2), 0) + 1
    want = sorted((a, b2, n) for (a, b2), n in brute.items())
    assert got == want and len(got) > 0
