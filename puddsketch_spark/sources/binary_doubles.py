"""Headerless binary-double file source (the reference's VALIDATE input
format: a flat array of IEEE float64, /root/reference/ParallelDDSketch/src/
Utility.cc:459-505). Lets golden inputs produced for/by the reference binary
be replayed directly through the Spark pipeline.

``binaryFile`` loads each file as ONE row, so a file is a unit of
parallelism (one partition per file, like the reference's per-rank slices of
one big file — repartition after decode to spread CPU). For 100 TB inputs
convert to parquet once instead; this source exists for golden replays and
reference interop, not as the scale path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, StructField, StructType

__all__ = ["read_binary_doubles"]


def read_binary_doubles(
    spark: SparkSession, path: str, col: str = "value", byte_order: str = "<"
) -> DataFrame:
    """DataFrame[col double] from headerless binary float64 file(s)."""
    raw = spark.read.format("binaryFile").load(path)
    schema = StructType([StructField(col, DoubleType(), False)])
    dtype = np.dtype(f"{byte_order}f8")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                if len(content) % 8:
                    raise ValueError(
                        f"binary-double file length {len(content)} not a "
                        "multiple of 8"
                    )
                yield pd.DataFrame({col: np.frombuffer(content, dtype=dtype)})

    return raw.select("content").mapInPandas(decode, schema=schema)
