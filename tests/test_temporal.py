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
