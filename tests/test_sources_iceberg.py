"""Genuine Iceberg round-trip for the transcript source layer.

The sandbox ships no iceberg-spark-runtime jar, so this module SKIPS there
— but on any cluster with the runtime on the classpath it executes a real
write / read / time-travel cycle against a hadoop catalog, proving the
north_rule's "Iceberg transcript tables" claim is an exercised code path,
not just a format switch (r4 item 8). The parquet fallback branch of
read_transcripts is covered unconditionally below.
"""

import pytest

from puddsketch_spark.sources.transcripts import (
    _iceberg_available,
    read_transcripts,
    validate_transcript_schema,
)


def test_read_transcripts_parquet_fallback(spark, tmp_path):
    """No Iceberg runtime: a path resolves to the parquet reader and the
    schema contract is enforced."""
    from puddsketch_spark.datagen import transcripts

    p = str(tmp_path / "t")
    transcripts(spark, n_conv=20, avg_turns=4, seed=3).write.parquet(p)
    df = read_transcripts(spark, p)
    validate_transcript_schema(df)
    assert df.count() > 0

    bad = str(tmp_path / "bad")
    spark.range(5).write.parquet(bad)
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, bad)


def test_read_transcripts_iceberg_fmt_requires_runtime(spark, tmp_path):
    if _iceberg_available(spark):
        pytest.skip("Iceberg runtime present; covered by the round-trip test")
    with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        read_transcripts(spark, str(tmp_path), fmt="iceberg")


def test_iceberg_write_read_time_travel(spark, tmp_path):
    """Write two commits to an Iceberg transcript table, read back through
    read_transcripts, and time-travel to the first snapshot."""
    if not _iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    from puddsketch_spark.datagen import transcripts

    spark.conf.set(
        "spark.sql.catalog.pudds_it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.pudds_it.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.pudds_it.warehouse", str(tmp_path / "warehouse")
    )
    tbl = "pudds_it.db.transcripts"
    t1 = transcripts(spark, n_conv=10, avg_turns=4, seed=1)
    t1.writeTo(tbl).create()
    n1 = t1.count()
    assert read_transcripts(spark, tbl, fmt="iceberg").count() == n1

    t2 = transcripts(spark, n_conv=5, avg_turns=4, seed=2)
    t2.writeTo(tbl).append()
    assert read_transcripts(spark, tbl, fmt="iceberg").count() == n1 + t2.count()

    snaps = spark.sql(f"SELECT snapshot_id FROM {tbl}.snapshots ORDER BY committed_at").collect()
    first = snaps[0].snapshot_id
    back = spark.read.format("iceberg").option("snapshot-id", first).load(tbl)
    validate_transcript_schema(back)
    assert back.count() == n1
