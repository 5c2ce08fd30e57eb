"""Transcript-table source layer.

North_rule input contract: Iceberg tables of shape
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). On a production cluster the Iceberg runtime jar + catalog
give snapshot-isolated scans, split-level lineage (file+offset -> exact
checkpoint resume), partition pruning on conv buckets, and metadata-only
row counts. This sandbox ships no Iceberg jar, so ``read_transcripts``
resolves: explicit format > catalog table name > iceberg-by-path if the
runtime is present > parquet directory. The rest of the engine only sees a
DataFrame — nothing else changes when Iceberg is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["TRANSCRIPT_SCHEMA", "read_transcripts", "validate_transcript_schema"]

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

_REQUIRED = {f.name for f in TRANSCRIPT_SCHEMA.fields}


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_transcripts(
    spark: SparkSession, source: str, fmt: str | None = None
) -> DataFrame:
    """Load a transcript table from an Iceberg catalog name, an Iceberg path,
    or a parquet directory.

    fmt: "iceberg" | "parquet" | None (auto). Auto order: catalog table if
    ``source`` has no path separator; iceberg-by-path when the runtime is on
    the classpath; else parquet.
    """
    if fmt == "parquet":
        df = spark.read.parquet(source)
    elif fmt == "iceberg":
        if not _iceberg_available(spark):
            raise RuntimeError(
                "fmt='iceberg' requested but the Iceberg runtime jar is not "
                "on the classpath; add iceberg-spark-runtime via --packages "
                "or use fmt='parquet'"
            )
        df = spark.read.format("iceberg").load(source)
    elif "/" not in source:
        df = spark.read.table(source)
    elif _iceberg_available(spark):
        df = spark.read.format("iceberg").load(source)
    else:
        df = spark.read.parquet(source)
    validate_transcript_schema(df)
    return df


def validate_transcript_schema(df: DataFrame) -> None:
    missing = _REQUIRED - set(df.columns)
    if missing:
        raise ValueError(
            f"transcript table missing columns {sorted(missing)}; "
            f"expected {sorted(_REQUIRED)}"
        )
