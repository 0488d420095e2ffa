"""Retention cohorts: Python twin + semantics fixtures."""

from __future__ import annotations

import datetime as dt
import random
from collections import defaultdict

from paralleltrianglecounting_spark.operators.stats import retention_cohorts

EPOCH = dt.date(2024, 1, 1)


def _twin(rows, bucket_days=7):
    ub = {(u, (d - EPOCH).days // bucket_days) for u, d in rows}
    first = {}
    for u, b in ub:
        first[u] = min(first.get(u, b), b)
    sizes = defaultdict(int)
    for u in first:
        sizes[first[u]] += 1
    tri = defaultdict(int)
    for u, b in ub:
        tri[(first[u], b - first[u])] += 1
    return {
        (c, o): (n, sizes[c], round(n / sizes[c], 6)) for (c, o), n in tri.items()
    }


def _run(spark, rows, bucket_days=7):
    df = spark.createDataFrame(
        [(u, dt.datetime.combine(d, dt.time(3, 14))) for u, d in rows],
        "user_id long, ts timestamp",
    )
    return {
        (r["cohort"], r["offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention_r"],
        )
        for r in retention_cohorts(df, bucket_days=bucket_days).collect()
    }


def test_matches_twin_random(spark):
    rng = random.Random(0x4E)
    rows = [
        (rng.randint(1, 25), EPOCH + dt.timedelta(days=rng.randint(0, 59)))
        for _ in range(400)
    ]
    assert _run(spark, rows) == _twin(rows)


def test_offset_zero_is_full_cohort(spark):
    rng = random.Random(1)
    rows = [
        (rng.randint(1, 10), EPOCH + dt.timedelta(days=rng.randint(0, 30)))
        for _ in range(100)
    ]
    got = _run(spark, rows)
    for (c, o), (active, size, r) in got.items():
        if o == 0:
            assert active == size and r == 1.0


def test_hand_case(spark):
    rows = [
        (1, EPOCH),  # cohort 0
        (1, EPOCH + dt.timedelta(days=8)),  # week 1 -> offset 1
        (2, EPOCH + dt.timedelta(days=2)),  # cohort 0, never returns
        (3, EPOCH + dt.timedelta(days=7)),  # cohort 1
        (3, EPOCH + dt.timedelta(days=21)),  # offset 2
    ]
    got = _run(spark, rows)
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (1, 2, 0.5),
        (1, 0): (1, 1, 1.0),
        (1, 2): (1, 1, 1.0),
    }


def test_bucket_days_knob(spark):
    rows = [(1, EPOCH), (1, EPOCH + dt.timedelta(days=3))]
    # daily buckets: two rows (offsets 0 and 3); weekly: one row
    assert set(_run(spark, rows, bucket_days=1)) == {(0, 0), (0, 3)}
    assert set(_run(spark, rows, bucket_days=7)) == {(0, 0)}
