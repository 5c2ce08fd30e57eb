"""Bucketed co-located joins & aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Bucketing
pays that shuffle ONCE at write time: both tables are hash-partitioned into
the same number of buckets on the join key (and sorted within buckets), so
every later equi-join or groupBy on that key runs with NO Exchange — the
SortMergeJoin reads co-located buckets directly. This is the standard
layout for tables that are repeatedly joined on the same key (orders x
lineitem on orderkey, transcripts x annotations on conv_id).

The bucketing metadata lives in the session catalog (`saveAsTable`); with a
shared metastore the layout survives across jobs. Plan property pinned in
tests/test_plans.py::test_bucketed_join_has_no_exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 64,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (+ sorted) parquet table.

    ``n_buckets`` must match across tables that will be joined (bucket
    co-location requires equal bucket counts); size it so one bucket of the
    LARGEST table fits an executor task (~100-500 MB compressed).
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (spark.table, not
    spark.read.parquet(path) — a raw path read loses the bucketing metadata
    and the exchange-free join with it)."""
    return spark.table(table)
