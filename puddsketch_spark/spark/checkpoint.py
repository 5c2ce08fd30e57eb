"""Checkpoint / resume for long sketch jobs via per-partition state parquet.

North-rule requirement: jobs resumable from checkpointed per-partition sketch
state with lineage + bucket-count/collapse metrics per partition. The
checkpoint is the stage-1 partials DataFrame (group cols + state blob +
n/buckets/collapses/partition_id) plus a JSON manifest recording input
lineage, written atomically after the data.

Two lineage modes, picked automatically:

* **File-level (primary, file-backed sources).** The manifest records every
  completed input file with a (size, mtime) fingerprint. Resume lists the
  input's files, verifies fingerprints of already-completed files (a changed
  file raises instead of silently double-counting; a vanished file raises —
  resume is defined for append-only inputs), and builds a NEW scan over
  ONLY the missing files — a 99%-done job re-reads ~1% of the input, not
  100%. Each resume run is appended to ``manifest["runs"]`` with the exact
  file set its scan planned, so tests (and operators) can audit what was
  actually re-read. Crash-safe: partials are only trusted inside the
  manifest's committed partition-id ranges, so a run that dies between its
  parquet append and its manifest rewrite leaves orphan rows that every
  later read EXCLUDES (and the next resume re-runs those files under a
  fresh id range). At Iceberg scale the file list would come from the table
  snapshot; the mechanism is identical.

* **Partition-id (fallback, non-file sources such as generated data).** A
  partition is complete iff its partition_id appears in the checkpoint; the
  recompute gates inside mapInPandas on TaskContext partition id. This
  re-scans the full input to recompute the missing slice and is only sound
  while split planning is unchanged (same partition count, which is
  verified; same packing, which cannot be — hence file-level is primary).

Contract for the file-level mode: ``df`` must be an unfiltered scan of the
file-backed table (projections are fine — the resume scan re-reads only the
columns ``partial_sketches`` prunes to). For derived/filtered inputs pass
``rebuild_scan(spark, missing_files) -> DataFrame`` reproducing the same
transformation over a partial file list.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterator, Sequence
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.uddsketch import UDDSketch
from .agg import SketchFactory, merge_grouped, partial_sketches

__all__ = ["write_partials", "resume_partials", "checkpointed_sketch_grouped"]

_VERSION = 3


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_sketch_manifest.json")


def _fingerprint(uri: str) -> dict:
    """(size, mtime) of a local input file; identity-only for remote URIs
    (an object store would supply etags via the table format instead)."""
    p = urlparse(uri)
    local = p.path if p.scheme in ("", "file") else None
    if local and os.path.exists(local):
        st = os.stat(local)
        return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}
    return {}


def _write_manifest(path: str, manifest: dict) -> None:
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(path))


def write_partials(
    partials: DataFrame,
    path: str,
    num_input_partitions: int,
    completed_ids: list[int] | None = None,
    input_files: Sequence[str] | None = None,
) -> None:
    """Write partial states + manifest.

    ``input_files`` records file-level lineage (primary resume mode).
    ``completed_ids`` records partitions known processed even when they
    produced zero rows (empty partitions leave no parquet trace, so
    presence-in-parquet alone can never mark a checkpoint complete).
    """
    partials.write.mode("overwrite").parquet(path)
    _write_manifest(
        path,
        {
            "version": _VERSION,
            "num_input_partitions": num_input_partitions,
            "completed": sorted(completed_ids or []),
            "files": {f: _fingerprint(f) for f in (input_files or [])},
            "runs": [{"scanned": sorted(input_files or [])}],
            "next_pid_base": num_input_partitions,
            # partition_id ranges whose partials the manifest vouches for; a
            # crash BETWEEN a resume append and the manifest rewrite leaves
            # orphan rows outside every committed range, and the read path
            # filters them out instead of double-counting
            "committed_ranges": [[0, num_input_partitions]],
        },
    )


def _committed_partials(spark: SparkSession, path: str, manifest: dict) -> DataFrame:
    """Read the checkpoint parquet restricted to manifest-committed
    partition-id ranges (orphan rows from crashed appends are excluded)."""
    df = spark.read.parquet(path)
    ranges = manifest.get("committed_ranges")
    if not ranges:
        return df
    cond = None
    for lo, hi in ranges:
        c = (F.col("partition_id") >= int(lo)) & (F.col("partition_id") < int(hi))
        cond = c if cond is None else (cond | c)
    return df.where(cond)


def resume_partials(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    path: str,
    factory: SketchFactory = UDDSketch,
    rebuild_scan: Callable[[SparkSession, list[str]], DataFrame] | None = None,
) -> DataFrame:
    """Return complete partials, computing only the missing input.

    File-backed input -> file-level lineage: the resume job's scan is built
    from ONLY the files absent from the manifest. Non-file input -> the
    partition-id fallback documented in the module docstring. If no
    checkpoint exists, builds everything and writes one.
    """
    input_files = sorted(df.inputFiles())
    if input_files:
        return _resume_files(
            spark, df, value_col, group_cols, path, factory, input_files, rebuild_scan
        )
    return _resume_partition_ids(spark, df, value_col, group_cols, path, factory)


def _resume_files(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    path: str,
    factory: SketchFactory,
    input_files: list[str],
    rebuild_scan: Callable[[SparkSession, list[str]], DataFrame] | None,
) -> DataFrame:
    n_parts = df.rdd.getNumPartitions()
    if not os.path.exists(_manifest_path(path)):
        partials = partial_sketches(df, value_col, group_cols, factory)
        write_partials(partials, path, n_parts, input_files=input_files)
        return spark.read.parquet(path)

    with open(_manifest_path(path)) as f:
        manifest = json.load(f)
    known = manifest.get("files", {})
    if not known:
        raise ValueError(
            f"checkpoint at {path} has partition-id lineage but the input is "
            "file-backed; delete the checkpoint to switch lineage modes"
        )
    for f_uri in input_files:
        if f_uri in known and known[f_uri] and known[f_uri] != _fingerprint(f_uri):
            raise ValueError(
                f"checkpoint at {path}: input file changed since checkpoint: "
                f"{f_uri} (was {known[f_uri]}, now {_fingerprint(f_uri)}); "
                "delete the checkpoint — resuming would double-count rows"
            )
    gone = sorted(set(known) - set(input_files))
    if gone:
        raise ValueError(
            f"checkpoint at {path} covers {len(gone)} input file(s) that no "
            f"longer exist (e.g. {gone[0]}); its partials contain data the "
            "table no longer has — delete the checkpoint (resume is only "
            "defined for append-only inputs)"
        )
    missing = [f_uri for f_uri in input_files if f_uri not in known]
    if not missing:
        return _committed_partials(spark, path, manifest)

    # THE point of file-level lineage: the recompute scan plans ONLY the
    # missing files — completed input is never re-read
    if rebuild_scan is not None:
        missing_df = rebuild_scan(spark, missing)
    else:
        # the default rebuild is a plain parquet read of the leaf files; it
        # CANNOT reconstruct hive-partition directory columns (they would
        # silently become NULL groups) or non-parquet sources — demand an
        # explicit rebuild_scan for those. Only directory segments BELOW the
        # scan root count: an ancestor like /warehouse/env=prod/ is not
        # partitioning.
        paths = [urlparse(f_uri).path for f_uri in input_files]
        root = os.path.commonpath([os.path.dirname(p) for p in paths]) if paths else ""
        if any(
            "=" in seg
            for f_uri in missing
            for seg in os.path.dirname(urlparse(f_uri).path)[len(root):].split("/")
        ):
            raise ValueError(
                "input looks hive-partitioned (key=value directories below "
                "the scan root); the default missing-file rebuild would NULL "
                "the partition columns — pass rebuild_scan reproducing the "
                "full read"
            )
        if not all(urlparse(f_uri).path.endswith(".parquet") for f_uri in missing):
            raise ValueError(
                "input files are not parquet; pass rebuild_scan reproducing "
                "the original source read over a file subset"
            )
        missing_df = spark.read.schema(df.schema).parquet(*missing)
    pid_base = int(manifest.get("next_pid_base", 0))
    existing = spark.read.parquet(path)
    max_pid = existing.agg(F.max("partition_id")).first()[0]
    if max_pid is not None and max_pid >= pid_base:
        # orphan rows from a resume that crashed after its append but before
        # its manifest rewrite: leave them outside every committed range and
        # start this run's ids above them
        pid_base = int(max_pid) + 1
    fresh = partial_sketches(missing_df, value_col, group_cols, factory).withColumn(
        "partition_id", (F.col("partition_id") + F.lit(pid_base)).cast("int")
    )
    fresh.write.mode("append").parquet(path)
    # commit the range from the ids ACTUALLY WRITTEN, not a re-planned
    # getNumPartitions() (AQE can re-plan a rebuild_scan's shuffle between
    # the write and a later evaluation, and an undersized range would
    # silently exclude committed rows)
    written_max = (
        spark.read.parquet(path)
        .where(F.col("partition_id") >= pid_base)
        .agg(F.max("partition_id"))
        .first()[0]
    )
    hi = (int(written_max) + 1) if written_max is not None else pid_base
    known.update({f_uri: _fingerprint(f_uri) for f_uri in missing})
    manifest["files"] = known
    manifest.setdefault("runs", []).append({"scanned": sorted(missing_df.inputFiles())})
    manifest.setdefault("committed_ranges", [[0, int(manifest.get("next_pid_base", 0))]])
    manifest["committed_ranges"].append([pid_base, hi])
    manifest["next_pid_base"] = hi
    _write_manifest(path, manifest)
    return _committed_partials(spark, path, manifest)


def _resume_partition_ids(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    path: str,
    factory: SketchFactory,
) -> DataFrame:
    n_parts = df.rdd.getNumPartitions()
    if not os.path.exists(_manifest_path(path)):
        partials = partial_sketches(df, value_col, group_cols, factory)
        write_partials(partials, path, n_parts, completed_ids=list(range(n_parts)))
        return spark.read.parquet(path)

    with open(_manifest_path(path)) as f:
        manifest = json.load(f)
    if manifest.get("files"):
        raise ValueError(
            f"checkpoint at {path} has file lineage but the input is not "
            "file-backed; delete the checkpoint to switch lineage modes"
        )
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
    # nothing. Their input is still scanned — acceptable only because this
    # fallback serves non-file sources (generated data) where a "scan" is
    # the generator itself; file-backed inputs take _resume_files.
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
    manifest["completed"] = sorted(done_ids | missing_set)
    manifest["version"] = _VERSION
    _write_manifest(path, manifest)
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
