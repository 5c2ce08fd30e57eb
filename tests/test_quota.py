"""Per-group quota capping (plain vs skew-safe salted) + deterministic order."""

import pytest
from pyspark.sql import functions as F

from puddsketch_spark.ops.quota import cap_per_group, deterministic_shuffle


@pytest.fixture(scope="module")
def hotdomain(spark):
    """99% of rows belong to one hot source — the web-corpus skew shape."""
    df = (
        spark.range(10_000)
        .withColumn(
            "source",
            F.when(F.col("id") % 100 < 99, F.lit("hot")).otherwise(
                F.concat(F.lit("cold"), (F.col("id") % 7).cast("string"))
            ),
        )
        .withColumn("score", (F.xxhash64("id") % 1000).cast("double"))
    )
    df.persist().count()
    yield df
    df.unpersist()


def test_cap_semantics(hotdomain):
    kept = cap_per_group(hotdomain, ["source"], 5, [F.col("score").desc(), "id"])
    per = {r.source: r.c for r in kept.groupBy("source").count().withColumnRenamed("count", "c").collect()}
    assert all(c <= 5 for c in per.values())
    assert per["hot"] == 5
    # survivors really are the top-5 by (score desc, id): exact check
    top_hot = (
        hotdomain.where(F.col("source") == "hot")
        .orderBy(F.col("score").desc(), "id").limit(5).collect()
    )
    got_hot = kept.where(F.col("source") == "hot").orderBy(F.col("score").desc(), "id").collect()
    assert [r.id for r in got_hot] == [r.id for r in top_hot]


def test_salted_path_identical_to_plain(hotdomain):
    order = [F.col("score").desc(), "id"]
    plain = cap_per_group(hotdomain, ["source"], 7, order)
    salted = cap_per_group(hotdomain, ["source"], 7, order, salt_buckets=16)
    assert sorted(r.id for r in plain.collect()) == sorted(
        r.id for r in salted.collect()
    )


def test_cap_smaller_groups_survive_whole(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(3)] + [("b", i) for i in range(10)], "g string, v int"
    )
    kept = cap_per_group(df, ["g"], 5, ["v"])
    per = {r.g: r.c for r in kept.groupBy("g").agg(F.count("*").alias("c")).collect()}
    assert per == {"a": 3, "b": 5}


def test_cap_rejects_bad_k(spark):
    df = spark.range(1).withColumn("g", F.lit("x"))
    with pytest.raises(ValueError):
        cap_per_group(df, ["g"], 0, ["id"])


def test_cap_rejects_bad_salt_buckets_and_helper_collisions(spark):
    """Review regressions: salt_buckets=0 would pmod to a NULL salt and
    silently re-serialize the hot group; a pre-existing _rn/_salt column
    would be overwritten then dropped."""
    df = spark.range(4).withColumn("g", F.lit("x"))
    with pytest.raises(ValueError, match="salt_buckets"):
        cap_per_group(df, ["g"], 2, ["id"], salt_buckets=0)
    with pytest.raises(ValueError, match="_rn"):
        cap_per_group(df.withColumn("_rn", F.lit(1)), ["g"], 2, ["id"])
    with pytest.raises(ValueError, match="_salt"):
        cap_per_group(df.withColumn("_salt", F.lit(1)), ["g"], 2, ["id"],
                      salt_buckets=4)
    # _salt in the input is fine on the PLAIN path, which never touches it
    assert cap_per_group(
        df.withColumn("_salt", F.lit(1)), ["g"], 2, ["id"]
    ).columns == ["id", "g", "_salt"]


def test_plain_cap_plan_has_partial_window_group_limit(spark):
    """Plan pin: the plain path's skew safety rests on Catalyst inserting a
    PARTIAL WindowGroupLimit below the exchange (map-side top-k, so a hot
    group ships <= k rows per input partition). If an engine/config change
    silently drops it, the salted path must become the documented default —
    this test is the tripwire."""
    df = (
        spark.range(10_000)
        .withColumn("g", (F.col("id") % 3).cast("string"))
        .withColumn("s", F.xxhash64("id").cast("double"))
    )
    kept = cap_per_group(df, ["g"], 5, [F.col("s").desc(), "id"])
    plan = kept._jdf.queryExecution().executedPlan().toString()
    partial = [i for i, line in enumerate(plan.splitlines())
               if "WindowGroupLimit" in line and "Partial" in line]
    exchange = [i for i, line in enumerate(plan.splitlines())
                if "Exchange" in line]
    assert partial and exchange, plan
    # the Partial limit must sit BELOW the exchange (deeper in the tree)
    assert partial[0] > exchange[0], plan


def test_plain_cap_warns_above_window_group_limit_threshold(spark):
    df = (
        spark.range(100)
        .withColumn("g", (F.col("id") % 3).cast("string"))
    )
    with pytest.warns(UserWarning, match="windowGroupLimitThreshold"):
        cap_per_group(df, ["g"], 5000, ["id"]).count()
    # the salted path needs no warning at any k
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cap_per_group(df, ["g"], 5000, ["id"], salt_buckets=4).count()


def test_deterministic_shuffle_rejects_empty_ids(spark):
    from puddsketch_spark.ops.quota import deterministic_shuffle

    with pytest.raises(ValueError, match="id_cols"):
        deterministic_shuffle(spark.range(3), [])


def test_deterministic_shuffle_stable_across_layouts(hotdomain):
    a = [r.id for r in deterministic_shuffle(hotdomain, ["id"]).collect()]
    b = [r.id for r in deterministic_shuffle(hotdomain.repartition(13), ["id"]).collect()]
    assert a == b
    assert a != sorted(a)  # actually shuffled, not identity order
    c = [r.id for r in deterministic_shuffle(hotdomain, ["id"], seed=1).collect()]
    assert a != c  # seed changes the order
