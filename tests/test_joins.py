"""Bloom runtime-filtered join: result equality with the plain join (zero
false negatives), measured probe thinning near selectivity+fpr, and the
shuffle-free probe plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from puddsketch_spark.ops.joins import bloom_filtered_join, bloom_key_filter, bloom_probe


def _tables(spark, n_fact=20_000, n_keys=2_000, n_dim=50, seed=3):
    rng = np.random.default_rng(seed)
    fact = spark.createDataFrame(
        [(int(k), float(v)) for k, v in zip(
            rng.integers(0, n_keys, n_fact), rng.normal(0, 1, n_fact).round(6))],
        "k long, v double",
    )
    dim_keys = rng.choice(n_keys, n_dim, replace=False)
    dim = spark.createDataFrame(
        [(int(k), f"d{k}") for k in dim_keys], "k long, name string"
    )
    return fact, dim


def test_bloom_join_equals_plain_join(spark):
    fact, dim = _tables(spark)
    plain = sorted(fact.join(dim, "k").collect())
    filtered = sorted(bloom_filtered_join(fact, dim, "k", fpr=0.01).collect())
    assert filtered == plain and len(plain) > 0


def test_bloom_probe_thins_to_selectivity_plus_fpr(spark):
    fact, dim = _tables(spark)
    filt = bloom_key_filter(dim, "k", fpr=0.01)
    survived = bloom_probe(fact, "k", filt).count()
    true_matches = fact.join(dim.select("k"), "k", "left_semi").count()
    n = fact.count()
    # no false negatives; false positives bounded well above the 1% target
    assert survived >= true_matches
    assert survived - true_matches <= 0.05 * n, (survived, true_matches, n)


def test_bloom_probe_string_keys_and_plan(spark):
    fact = spark.createDataFrame(
        [(f"u{j % 100:03d}", j) for j in range(5_000)], "k string, v long"
    )
    dim = spark.createDataFrame([(f"u{j:03d}",) for j in range(10)], "k string")
    filt = bloom_key_filter(dim, "k", fpr=0.001)
    probed = bloom_probe(fact, "k", filt)
    assert probed.count() == 500  # 10 of 100 key values, exact (tiny fpr)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # map-side only


def test_bloom_join_rejects_outer(spark):
    fact, dim = _tables(spark)
    with pytest.raises(ValueError, match="inner/semi"):
        bloom_filtered_join(fact, dim, "k", how="left")


def test_range_join_vs_duckdb_between(spark):
    """Randomized cross-check of the bucketed range join against a plain
    DuckDB BETWEEN join (overlapping intervals, multi-match, by-key)."""
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(23)
    pts = pd.DataFrame({
        "g": rng.integers(0, 4, 500),
        "v": np.round(rng.uniform(0, 100, 500), 3),
        "pid": np.arange(500),
    })
    starts = np.round(rng.uniform(0, 95, 80), 3)
    ivs = pd.DataFrame({
        "g": rng.integers(0, 4, 80),
        "start": starts,
        "end": np.round(starts + rng.uniform(0.5, 20, 80), 3),
        "iid": np.arange(80),
    })
    from puddsketch_spark.ops.joins import range_join

    out = range_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        point_col="v", by=["g"],
    )
    got = sorted((r.pid, r.iid) for r in out.collect())
    con = duckdb.connect()
    con.register("p", pts)
    con.register("i", ivs)
    exp = sorted(con.sql(
        "SELECT pid, iid FROM p JOIN i ON p.g = i.g AND p.v >= i.start AND p.v < i.end"
    ).fetchall())
    assert got == exp and len(exp) > 100


def test_range_join_left_and_bucket_widths(spark):
    from puddsketch_spark.ops.joins import range_join

    pts = spark.createDataFrame([(5.0, 1), (50.0, 2)], "v double, pid long")
    ivs = spark.createDataFrame([(0.0, 10.0, 7)], "start double, end double, iid long")
    for w in (None, 1.0, 100.0):  # auto, fine, coarse grids agree
        out = {r.pid: r.iid for r in
               range_join(pts, ivs, "v", bucket_width=w, how="left").collect()}
        assert out == {1: 7, 2: None}
    # exclusive end
    edge = spark.createDataFrame([(10.0, 3)], "v double, pid long")
    assert range_join(edge, ivs, "v").count() == 0


def test_range_join_left_null_payload_no_duplicates(spark):
    """Review regression: a matched point row carrying a NULL column must
    not ALSO reappear as unmatched (null-safe anti join)."""
    from puddsketch_spark.ops.joins import range_join

    pts = spark.createDataFrame(
        [(10.0, 1, None), (50.0, 2, "x")], "v double, pid long, note string"
    )
    ivs = spark.createDataFrame([(0.0, 20.0, 7)], "start double, end double, iid long")
    out = range_join(pts, ivs, "v", how="left").collect()
    assert len(out) == 2
    got = {r.pid: r.iid for r in out}
    assert got == {1: 7, 2: None}


def test_bloom_probe_decimal_keys_and_unsupported_dtype(spark):
    """Review regression: decimal keys hash float64 on BOTH fill and probe
    (no silent false negatives); timestamp keys are refused loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from puddsketch_spark.ops.joins import bloom_filtered_join, bloom_key_filter, bloom_probe

    fact = spark.createDataFrame(
        [(j % 50,) for j in range(2_000)], "k long"
    ).select(F.col("k").cast("decimal(18,2)").alias("k"))
    dim = spark.createDataFrame([(j,) for j in range(10)], "k long").select(
        F.col("k").cast("decimal(18,2)").alias("k")
    )
    plain = fact.join(dim, "k").count()
    filtered = bloom_filtered_join(fact, dim, "k", fpr=0.001).count()
    assert filtered == plain == 400

    ts_fact = spark.createDataFrame([("2024-01-01",)], "t string").select(
        F.col("t").cast("timestamp").alias("t")
    )
    with _pytest.raises(ValueError, match="unsupported key dtype"):
        bloom_probe(ts_fact, "t", bloom_key_filter(ts_fact, "t"))


def test_bloom_join_multi_column_key(spark):
    """Two-column keys compose through xxhash64 on both scans: the filtered
    join is row-identical to the plain join, and the semi flavor agrees."""
    rng = np.random.default_rng(41)
    fact = spark.createDataFrame(
        [(int(a), f"s{int(b)}", float(v)) for a, b, v in zip(
            rng.integers(0, 40, 8_000), rng.integers(0, 25, 8_000),
            rng.normal(0, 1, 8_000).round(6))],
        "k1 long, k2 string, v double",
    )
    dim = spark.createDataFrame(
        [(int(a), f"s{int(b)}", f"d{j}") for j, (a, b) in enumerate(zip(
            rng.integers(0, 40, 30), rng.integers(0, 25, 30)))],
        "k1 long, k2 string, name string",
    ).dropDuplicates(["k1", "k2"])
    plain = sorted(fact.join(dim, ["k1", "k2"]).collect())
    filtered = sorted(
        bloom_filtered_join(fact, dim, ["k1", "k2"], fpr=0.01).collect())
    assert filtered == plain and len(plain) > 0
    semi = bloom_filtered_join(fact, dim, ["k1", "k2"], how="left_semi")
    assert semi.count() == fact.join(dim, ["k1", "k2"], "left_semi").count()


def test_bloom_join_dim_key_arity_mismatch_raises(spark):
    fact, dim = _tables(spark)
    with pytest.raises(ValueError, match="one column per fact key"):
        bloom_filtered_join(fact, dim, ["k"], dim_key=["k", "name"])


def test_range_join_left_single_join_plan_and_two_col_by(spark):
    """how='left' must plan as ONE join over the grid (no distinct, no
    anti-join second pass over the points — r4 review item 5), and a
    two-column by key matches DuckDB."""
    import duckdb
    import pandas as pd

    from puddsketch_spark.ops.joins import range_join

    rng = np.random.default_rng(43)
    pts = pd.DataFrame({
        "g1": rng.integers(0, 3, 300), "g2": rng.integers(0, 2, 300),
        "v": np.round(rng.uniform(0, 60, 300), 3), "pid": np.arange(300),
    })
    starts = np.round(rng.uniform(0, 55, 40), 3)
    ivs = pd.DataFrame({
        "g1": rng.integers(0, 3, 40), "g2": rng.integers(0, 2, 40),
        "start": starts, "end": np.round(starts + rng.uniform(1, 15, 40), 3),
        "iid": np.arange(40),
    })
    out = range_join(
        spark.createDataFrame(pts), spark.createDataFrame(ivs),
        point_col="v", by=["g1", "g2"], how="left",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan and "Union" not in plan, plan
    n_joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") \
        + plan.count("BroadcastHashJoin")
    assert n_joins == 1, plan
    got = sorted((r.pid, r.iid) for r in out.collect())
    con = duckdb.connect()
    con.register("p", pts)
    con.register("i", ivs)
    exp = sorted(con.sql(
        "SELECT pid, iid FROM p LEFT JOIN i ON p.g1 = i.g1 AND p.g2 = i.g2 "
        "AND p.v >= i.start AND p.v < i.end"
    ).fetchall())
    assert got == exp and len(exp) >= 300


def test_dedup_against_corpus_exact_and_no_false_drops(spark):
    """Incremental dedup: survivors are exactly the novel texts; a
    deliberately terrible Bloom (fpr=0.5) floods the verify stage with
    false positives and the exact semi join still removes none of the
    novel rows (zero false drops, zero false keeps)."""
    from puddsketch_spark.ops.dedup import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(300)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1000 + i, f"doc body {i}") for i in range(0, 100, 2)]      # 50 dups
        + [(2000 + i, f"fresh body {i}") for i in range(80)],         # 80 novel
        "doc_id long, text string",
    )
    for fpr in (1e-3, 0.5):
        out = dedup_against_corpus(new, corpus, fpr=fpr)
        ids = sorted(r.doc_id for r in out.collect())
        assert ids == sorted(2000 + i for i in range(80)), fpr
        assert out.columns == new.columns  # digest column dropped

    # scale-plan pin: the batch itself never shuffles — the final anti
    # join is BROADCAST, and every Exchange in the plan carries only the
    # candidate digest column (the thin verify stage), never batch rows
    import re

    plan = (dedup_against_corpus(new, corpus)
            ._jdf.queryExecution().executedPlan().toString())
    anti = [ln for ln in plan.split("\n") if "LeftAnti" in ln]
    assert anti and "BroadcastHashJoin" in anti[0], plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^,]+)", plan):
        assert m.group(1).startswith("_dig"), m.group(0)
