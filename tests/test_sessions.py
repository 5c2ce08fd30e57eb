"""Sessionization: gap semantics vs hand-computed sessions, numeric and
timestamp ts columns, stats aggregation, and the one-shuffle plan."""

import datetime as dt

from pyspark.sql import functions as F

from puddsketch_spark.ops.sessions import session_stats, sessionize


def test_sessionize_numeric_gaps(spark):
    df = spark.createDataFrame(
        [
            ("u1", 0), ("u1", 10), ("u1", 100), ("u1", 105), ("u1", 300),
            ("u2", 50),
        ],
        "user_id string, ts long",
    )
    out = sessionize(df, ts_col="ts", by=["user_id"], gap=F.lit(30))
    got = {(r.user_id, r.ts): r.session_seq for r in out.collect()}
    assert got == {
        ("u1", 0): 0, ("u1", 10): 0,       # gap 10 <= 30
        ("u1", 100): 1, ("u1", 105): 1,    # gap 90 > 30 starts session 1
        ("u1", 300): 2,                    # gap 195 > 30
        ("u2", 50): 0,
    }


def test_sessionize_timestamp_and_stats(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("u", t0), ("u", t0 + dt.timedelta(minutes=10)),
        ("u", t0 + dt.timedelta(minutes=90)),  # > 30 min gap -> new session
        ("u", t0 + dt.timedelta(minutes=95)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    stats = {
        r.session_seq: (r.n_events, r.dur_us)
        for r in session_stats(df, by=["user_id"], gap="INTERVAL 30 MINUTES").collect()
    }
    assert stats == {0: (2, 600_000_000), 1: (2, 300_000_000)}


def test_sessionize_gap_boundary_inclusive(spark):
    """Exactly-gap spacing stays in the SAME session (> gap splits)."""
    df = spark.createDataFrame(
        [("u", 0), ("u", 30), ("u", 61)], "user_id string, ts long"
    )
    out = sessionize(df, ts_col="ts", by=["user_id"], gap=F.lit(30))
    got = {r.ts: r.session_seq for r in out.collect()}
    assert got == {0: 0, 30: 0, 61: 1}


def test_sessionize_single_shuffle_plan(spark):
    df = spark.createDataFrame([("u", 1)], "user_id string, ts long")
    out = session_stats(df, ts_col="ts", by=["user_id"], gap=F.lit(30))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
