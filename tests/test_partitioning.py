"""Sketch-driven equal-frequency range partitioning."""

import math

import pytest
from pyspark.sql import functions as F

from puddsketch_spark.spark.partitioning import (
    NULL_BUCKET,
    bucket_balance,
    range_repartition,
    sketch_range_bounds,
    with_range_bucket,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """Deterministic lognormal-ish skew: equal-width bucketing would pile
    ~everything into the first bucket; equal-frequency must not."""
    df = (
        spark.range(20_000)
        .withColumn("u", (F.xxhash64("id") % 1_000_000) / 1_000_000.0)
        .withColumn("v", F.exp(F.abs(F.col("u")) * 8))
        .drop("u")
    )
    df.persist().count()
    yield df
    df.unpersist()


def test_bounds_deterministic_across_layouts(skewed):
    b1 = sketch_range_bounds(skewed, "v", 16)
    b2 = sketch_range_bounds(skewed.repartition(7), "v", 16)
    b3 = sketch_range_bounds(skewed.repartition(3, "id"), "v", 16)
    assert b1 == b2 == b3  # merge-order invariance -> layout-independent
    assert b1 == sorted(b1) and len(b1) == 15


def test_balance_on_skew(skewed):
    row = bucket_balance(skewed, "v", 16).first()
    assert row.n == 20_000
    assert row.num_buckets == 16
    assert row.monotonic
    # ideal share 1/16 = 0.0625; alpha=0.005 bounds keep buckets near-equal
    assert row.max_share < 0.085
    assert row.min_share > 0.04


def test_bucket_assignment_matches_searchsorted(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (1.0,), (2.0,), (2.5,), (99.0,), (None,), (float("nan"),)],
        "v double",
    )
    got = {
        r.v: r._bucket
        for r in with_range_bucket(df, "v", [0.0, 2.0, 10.0]).collect()
        if r.v is not None and not (isinstance(r.v, float) and math.isnan(r.v))
    }
    # searchsorted 'left': value equal to a cut point goes LEFT
    assert got == {-5.0: 0, 0.0: 0, 1.0: 1, 2.0: 1, 2.5: 2, 99.0: 3}
    specials = [
        r._bucket
        for r in with_range_bucket(df, "v", [0.0, 2.0, 10.0]).collect()
        if r.v is None or (isinstance(r.v, float) and math.isnan(r.v))
    ]
    assert specials == [NULL_BUCKET, NULL_BUCKET]


def test_checkpointed_sketch_skips_fill(skewed):
    from puddsketch_spark.core.ddsketch import DDSketchPair
    from puddsketch_spark.spark.agg import sketch_global

    sk = sketch_global(
        skewed, "v", lambda: DDSketchPair(initial_alpha=0.005, m=4096),
        DDSketchPair.from_bytes,
    )
    restored = DDSketchPair.from_bytes(sk.to_bytes())  # the checkpoint path
    assert sketch_range_bounds(None, "v", 16, sketch=restored) == sketch_range_bounds(
        skewed, "v", 16
    )


def test_range_repartition_contiguous_and_balanced(skewed):
    out = range_repartition(skewed, "v", 16, keep_bucket=True)
    per = (
        out.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.min("_bucket").alias("lo"), F.max("_bucket").alias("hi"),
             F.count(F.lit(1)).alias("c"))
        .orderBy("pid")
        .collect()
    )
    assert sum(r.c for r in per) == 20_000
    nonempty = [r for r in per if r.c > 0]
    # physical partitions hold contiguous, non-overlapping bucket ranges
    for a, b in zip(nonempty, nonempty[1:]):
        assert a.hi <= b.lo
    # and the heaviest physical partition stays near the ideal share
    assert max(r.c for r in per) / 20_000 < 0.15


def test_constant_column_single_bucket(spark):
    df = spark.range(100).withColumn("v", F.lit(7.0))
    assert sketch_range_bounds(df, "v", 8) == []
    assert with_range_bucket(df, "v", []).agg(F.max("_bucket")).first()[0] == 0
    # no-cut input must keep its layout, not coalesce into one partition
    with pytest.warns(UserWarning, match="no equal-frequency cut"):
        out = range_repartition(df.repartition(4), "v", 8)
    assert out.rdd.getNumPartitions() == 4


def test_negative_values_signed_domain(spark):
    df = spark.range(10_000).withColumn(
        "v", (F.col("id") - 5_000).cast("double")
    )
    bounds = sketch_range_bounds(df, "v", 4)
    assert len(bounds) == 3
    assert bounds[0] < 0 < bounds[2]  # p25 < 0 < p75 on a symmetric column
    row = bucket_balance(df, "v", 4).first()
    assert row.monotonic and row.max_share < 0.30


def test_empty_input(spark):
    df = spark.range(0).withColumn("v", F.col("id").cast("double"))
    assert sketch_range_bounds(df, "v", 8) == []


def test_single_bucket_short_circuits_without_warning(spark, recwarn):
    """Review regression: num_buckets=1 legitimately has no cuts — it must
    skip the sketch fill and not claim the column is constant."""
    df = spark.range(100).withColumn("v", F.col("id").cast("double"))
    assert sketch_range_bounds(None, "v", 1) == []  # df unused: no fill ran
    out = range_repartition(df.repartition(4), "v", 1)
    assert not [w for w in recwarn.list if "equal-frequency" in str(w.message)]
    assert out.count() == 100


def test_bucket_column_collision_raises(spark):
    df = spark.range(5).withColumn("v", F.col("id").cast("double")).withColumn(
        "_bucket", F.lit(9)
    )
    with pytest.raises(ValueError, match="_bucket"):
        with_range_bucket(df, "v", [2.0])
