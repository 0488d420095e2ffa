"""Streaming sessionization: stream==batch on the real fixture, plus
the session_window-vs-lag boundary semantics pin (they differ only at
a consecutive gap of EXACTLY the session gap, which the fixture
verifiably lacks)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from paralleltrianglecounting_spark.operators.stats import sessionize


def test_stream_equals_batch(spark):
    import __spark_entry__ as m

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in m.queries()["user_sessions_stream"](spark, sf_dir).collect()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = sorted(
        (r.user_id, r.session_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(ev).collect()
    )
    assert got == want and len(got) > 0


def test_exact_gap_boundary_semantics(spark):
    # two events exactly 30 min apart MERGE under BOTH forms — the
    # batch lag form splits strictly-greater-than gap, and
    # session_window's merge test is inclusive of the window end
    # (verified here, not assumed from the half-open-interval docs):
    # the twins agree even at the boundary. One second past the gap
    # splits under both.
    def n_sessions(rows):
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        sw = ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes")
        ).agg(F.count(F.lit(1)).alias("n"))
        return sessionize(ev).count(), sw.count()

    at_gap = [
        (1, datetime(2024, 1, 1, 10, 0, 0)),
        (1, datetime(2024, 1, 1, 10, 30, 0)),
    ]
    assert n_sessions(at_gap) == (1, 1)
    past_gap = [
        (1, datetime(2024, 1, 1, 10, 0, 0)),
        (1, datetime(2024, 1, 1, 10, 30, 1)),
    ]
    assert n_sessions(past_gap) == (2, 2)
