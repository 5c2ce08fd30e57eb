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
