"""Checkpoint / resume for long sketch jobs via per-partition state parquet.

North-rule requirement: jobs resumable from checkpointed per-partition sketch
state with lineage + bucket-count/collapse metrics per partition. The
checkpoint is the stage-1 partials DataFrame (group cols + state blob +
n/buckets/collapses/partition_id) plus a tiny JSON manifest recording the
expected partition count, written atomically after the data.

Resume contract: a partition is complete iff its partition_id appears in the
checkpoint. Re-running recomputes ONLY missing partitions (idempotent: the
recompute filters on TaskContext partition id, so retried/duplicate rows are
impossible as long as the input split planning is unchanged — same files,
same maxPartitionBytes). At real 100 TB scale the partition_id would be an
Iceberg file+split hash; the mechanism is identical.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..core.uddsketch import UDDSketch
from .agg import SketchFactory, merge_grouped, partial_sketches

__all__ = ["write_partials", "resume_partials", "checkpointed_sketch_grouped"]


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_sketch_manifest.json")


def write_partials(
    partials: DataFrame,
    path: str,
    num_input_partitions: int,
    completed_ids: list[int] | None = None,
) -> None:
    """Write partial states + manifest. ``completed_ids`` records partitions
    known processed even if they produced zero rows (empty input partitions
    leave no parquet trace, so presence-in-parquet alone can never mark a
    checkpoint complete)."""
    partials.write.mode("overwrite").parquet(path)
    with open(_manifest_path(path), "w") as f:
        json.dump(
            {
                "num_input_partitions": num_input_partitions,
                "completed": sorted(completed_ids or []),
                "version": 2,
            },
            f,
        )


def resume_partials(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    path: str,
    factory: SketchFactory = UDDSketch,
) -> DataFrame:
    """Return complete partials, computing only partitions missing from ``path``.

    If no checkpoint exists, builds everything and writes one.
    """
    n_parts = df.rdd.getNumPartitions()
    if not os.path.exists(_manifest_path(path)):
        partials = partial_sketches(df, value_col, group_cols, factory)
        write_partials(partials, path, n_parts, completed_ids=list(range(n_parts)))
        return spark.read.parquet(path)

    with open(_manifest_path(path)) as f:
        manifest = json.load(f)
    if manifest["num_input_partitions"] != n_parts:
        raise ValueError(
            f"checkpoint at {path} was written for {manifest['num_input_partitions']} "
            f"input partitions, input now has {n_parts}; split planning changed — "
            "delete the checkpoint or pin spark.sql.files.maxPartitionBytes"
        )
    existing = spark.read.parquet(path)
    done_ids = {r[0] for r in existing.select("partition_id").distinct().collect()}
    done_ids |= set(manifest.get("completed", []))
    missing = sorted(set(range(n_parts)) - done_ids)
    if not missing:
        return existing
    missing_set = set(missing)

    # recompute only missing partitions: the gate runs in the same narrow
    # chain (partition indices preserved), so completed partitions emit
    # nothing (their input is still scanned — split-level lineage in the
    # table format removes that at production scale, the contract is identical)
    from pyspark import TaskContext

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        if pid not in missing_set:
            return
        yield from batches

    pruned = df.select(*group_cols, value_col)
    gated = pruned.mapInPandas(gate, schema=pruned.schema)
    fresh = partial_sketches(gated, value_col, group_cols, factory)
    fresh.write.mode("append").parquet(path)
    # record the recomputed partitions as complete — empty partitions leave
    # no rows, so the parquet alone can never prove completeness
    with open(_manifest_path(path), "w") as f:
        json.dump(
            {
                "num_input_partitions": n_parts,
                "completed": sorted(done_ids | missing_set),
                "version": 2,
            },
            f,
        )
    return spark.read.parquet(path)


def checkpointed_sketch_grouped(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    path: str,
    factory: SketchFactory = UDDSketch,
    from_bytes: Callable[[bytes], object] | None = None,
) -> DataFrame:
    """sketch_grouped with a resumable stage-1 checkpoint at ``path``."""
    fb = from_bytes or type(factory()).from_bytes
    partials = resume_partials(spark, df, value_col, group_cols, path, factory)
    return merge_grouped(partials, list(group_cols), fb)
