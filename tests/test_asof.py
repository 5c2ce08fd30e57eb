"""As-of join operator: semantics vs hand-computed matches, DuckDB native
ASOF JOIN cross-check, forward/tolerance variants, struct-consistency (a
match is one right ROW, never a column mix), and the single-shuffle plan."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from puddsketch_spark.ops.asof import asof_join


def _toy(spark):
    trades = spark.createDataFrame(
        [
            ("A", 3, "t1"), ("A", 8, "t2"), ("A", 10, "t3"),
            ("B", 1, "t4"), ("B", 7, "t5"),
            ("C", 5, "t6"),  # no quotes for C at all
        ],
        "sym string, ts long, trade_id string",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 2, 100.0), ("A", 3, 101.0), ("A", 9, 102.0),
            ("B", 4, 50.0),
        ],
        "sym string, ts long, px double",
    )
    return trades, quotes


def test_asof_backward_semantics(spark):
    trades, quotes = _toy(spark)
    out = asof_join(trades, quotes, on="ts", by=["sym"])
    got = {r.trade_id: (r.ts_r, r.px) for r in out.collect()}
    assert got == {
        "t1": (3, 101.0),   # inclusive: equal ts matches
        "t2": (3, 101.0),
        "t3": (9, 102.0),
        "t4": (None, None),  # before first quote
        "t5": (4, 50.0),
        "t6": (None, None),  # keyless group
    }
    assert out.count() == trades.count()  # left join: every left row kept


def test_asof_forward_and_tolerance(spark):
    trades, quotes = _toy(spark)
    fwd = asof_join(trades, quotes, on="ts", by=["sym"], direction="forward")
    got = {r.trade_id: r.ts_r for r in fwd.collect()}
    assert got == {"t1": 3, "t2": 9, "t3": None, "t4": 4, "t5": None, "t6": None}

    tol = asof_join(trades, quotes, on="ts", by=["sym"], tolerance=2)
    got = {r.trade_id: r.ts_r for r in tol.collect()}
    # t2 (ts=8): nearest prior quote ts=3, gap 5 > 2 -> nulled
    assert got == {"t1": 3, "t2": None, "t3": 9, "t4": None, "t5": None, "t6": None}


def test_asof_match_is_one_row_not_column_mix(spark):
    """Right rows with NULL payload fields must not be column-wise patched
    by older rows — the struct pack guarantees row consistency."""
    left = spark.createDataFrame([("k", 10, "l1")], "g string, ts long, lid string")
    right = spark.createDataFrame(
        [("k", 1, 1.0, "full"), ("k", 5, None, "sparse")],
        "g string, ts long, a double, b string",
    )
    r = asof_join(left, right, on="ts", by=["g"]).first()
    assert (r.ts_r, r.a, r.b) == (5, None, "sparse")  # a stays NULL from ts=5 row


def test_asof_vs_duckdb_native(spark):
    """Randomized cross-check against DuckDB's built-in ASOF JOIN."""
    rng = np.random.default_rng(17)
    n_l, n_r = 400, 300
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_l),
            "t": rng.integers(0, 1000, n_l),
            "lid": np.arange(n_l),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_r),
            "t": rng.integers(0, 1000, n_r),
            "val": np.round(rng.normal(0, 1, n_r), 6),
        }
    )
    # unique (k,t) on the right so "which right row" is unambiguous
    rpdf = rpdf.drop_duplicates(["k", "t"])
    out = asof_join(
        spark.createDataFrame(lpdf.astype({"k": "int64", "t": "int64", "lid": "int64"})),
        spark.createDataFrame(rpdf.astype({"k": "int64", "t": "int64"})),
        on="t",
        by=["k"],
    )
    got = {r.lid: (r.t_r, r.val) for r in out.collect()}

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    exp_rows = con.sql(
        "SELECT l.lid, r.t, r.val FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.t >= r.t"
    ).fetchall()
    exp = {lid: (t, val) for lid, t, val in exp_rows}
    assert got == exp


def test_asof_single_shuffle_plan(spark):
    """The physical plan must contain exactly ONE exchange (the by-key hash
    partitioning feeding the window sort) — no range-join blowup, no extra
    repartition."""
    trades, quotes = _toy(spark)
    out = asof_join(trades, quotes, on="ts", by=["sym"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # local-relation inputs: every Exchange in the plan belongs to the
    # operator itself
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_asof_null_left_time_never_matches(spark):
    """A left row with NULL `on` must get NULL right columns in BOTH
    directions (r4 advice: desc default nulls-last ordering handed
    NULL-time rows the running last() struct in forward mode)."""
    left = spark.createDataFrame(
        [("k", None, "lnull"), ("k", 6, "lmid")], "g string, ts long, lid string"
    )
    right = spark.createDataFrame(
        [("k", 2, 1.0), ("k", 9, 2.0)], "g string, ts long, px double"
    )
    for direction, mid_px in (("backward", 1.0), ("forward", 2.0)):
        got = {
            r.lid: r.px
            for r in asof_join(
                left, right, on="ts", by=["g"], direction=direction
            ).collect()
        }
        assert got == {"lnull": None, "lmid": mid_px}, direction


def test_asof_keyless_warns(spark):
    """by=() collapses to one global window partition; callers must hear
    about it."""
    left = spark.createDataFrame([(10, "l1")], "ts long, lid string")
    right = spark.createDataFrame([(5, 1.0)], "ts long, px double")
    with pytest.warns(UserWarning, match="SINGLE-PARTITION"):
        asof_join(left, right, on="ts")


def test_asof_bad_direction_raises(spark):
    trades, quotes = _toy(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="ts", by=["sym"], direction="nearest")


def test_asof_global_and_composite_keys(spark):
    """by=() joins globally; two by-columns partition independently."""
    left = spark.createDataFrame(
        [(10, "l1"), (3, "l2")], "ts long, lid string"
    )
    right = spark.createDataFrame([(5, 1.0), (9, 2.0)], "ts long, px double")
    got = {r.lid: r.px for r in asof_join(left, right, on="ts").collect()}
    assert got == {"l1": 2.0, "l2": None}

    left2 = spark.createDataFrame(
        [("a", "x", 10, "l1"), ("a", "y", 10, "l2"), ("b", "x", 10, "l3")],
        "g1 string, g2 string, ts long, lid string",
    )
    right2 = spark.createDataFrame(
        [("a", "x", 4, 1.0), ("a", "y", 5, 2.0), ("b", "z", 6, 3.0)],
        "g1 string, g2 string, ts long, px double",
    )
    got = {
        r.lid: r.px
        for r in asof_join(left2, right2, on="ts", by=["g1", "g2"]).collect()
    }
    assert got == {"l1": 1.0, "l2": 2.0, "l3": None}
