"""Distributed sketch aggregation: Arrow-vectorized partials + mergeable reduce.

The Spark equivalent of the reference's MPI pipeline
(/root/reference/psketches/pudds.cpp:118-203): per-rank local sketch build ->
custom commutative MPI_Reduce -> root-rank quantile query becomes

    df.select(cols)                      # column pruning reaches the scan
      .mapInPandas(partial_fn)           # per-partition sketch, Arrow batches,
                                         #   pandas-groupby map-side combine
      .groupBy(group).applyInPandas(...) # keyed merge: shuffles ~KB sketch
                                         #   blobs, never raw rows
      -- or --
      .rdd.treeReduce(merge, depth=2)    # global merge, two-level tree

Scale notes (100 TB / 1000 executors):
  * the only shuffle moves (n_groups x n_partitions) sketch blobs of
    ~16*m bytes (m=200 -> ~3 KB); raw rows never cross the wire.
  * group-key skew is irrelevant post-partial (one row per group per
    partition); input conv_id skew is handled by skew.salted_repartition.
  * all per-row work is numpy inside Arrow batches — no per-row Python.
"""

from __future__ import annotations

import math
from typing import Callable, Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..core.uddsketch import UDDSketch

__all__ = [
    "dd_bucket_counts",
    "dd_sketch_global_jvm",
    "dd_states_grouped_jvm",
    "partial_sketches",
    "merge_grouped",
    "rollup_grouping_sets",
    "rollup_cube",
    "rollup_hierarchy",
    "rollup_states",
    "sketch_grouped",
    "sketch_global",
    "quantile_table",
    "udds_quantiles",
]

# A sketch kernel is anything with: update(np.ndarray)->self, merge(other)->self,
# to_bytes()->bytes, classmethod from_bytes(bytes), and int attrs count /
# num_buckets / num_collapses (companion sketches report 0 collapses).
SketchFactory = Callable[[], object]

_METRIC_FIELDS = [
    StructField("state", BinaryType(), False),
    StructField("n", LongType(), False),
    StructField("buckets", IntegerType(), False),
    StructField("collapses", IntegerType(), False),
    StructField("partition_id", IntegerType(), False),
]


def _metrics_of(sk) -> tuple[int, int, int]:
    return (
        int(getattr(sk, "count", 0)),
        int(getattr(sk, "num_buckets", 0)),
        int(getattr(sk, "num_collapses", 0)),
    )


def _partial_schema(df: DataFrame, group_cols: Sequence[str]) -> StructType:
    by_name = {f.name: f for f in df.schema.fields}
    return StructType([by_name[c] for c in group_cols] + _METRIC_FIELDS)


def _kernel_update_weighted(sk, vals: np.ndarray, w: np.ndarray):
    """Weighted-update dispatch: kernels expose either update_weighted
    (UDD, t-digest, HLL, Bloom) or update(values, counts) (CMS,
    Misra-Gries). Rank-based kernels (KLL, REQ) have no exact weighted
    form — their compaction samples ITEMS, so they reject the
    pre-aggregate path. The capability check is by SIGNATURE, not by
    catching TypeError from the call — a genuine TypeError inside a
    weight-capable kernel must surface as itself, not as a false
    'unsupported' diagnosis."""
    import inspect

    uw = getattr(sk, "update_weighted", None)
    if uw is not None:
        return uw(vals, w)
    params = list(inspect.signature(sk.update).parameters)
    if len(params) >= 2:  # update(values, counts)
        return sk.update(vals, w)
    raise TypeError(
        f"{type(sk).__name__} does not support weighted update; "
        "use pre_aggregate=False for this kernel"
    )


def partial_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    factory: SketchFactory = UDDSketch,
    weight_col: str | None = None,
) -> DataFrame:
    """Stage 1: one sketch row per (group x input-partition).

    mapInArrow map-side combine: group columns stay dictionary-encoded
    (codes are int32 numpy; only the per-DISTINCT-group values ever become
    Python objects), values go straight to the kernel's numpy ``update``.
    Zero per-row Python objects — the pandas conversion of millions of
    group strings was the hot spot at 50M+ rows. Emits per-partition
    lineage/metrics (partition_id, n, buckets, collapses) per the
    north_rule, mirroring the reference's per-rank logs
    (/root/reference/ParallelDDSketch/src/ParallelSketcher.cc:662-708).
    """
    group_cols = list(group_cols)
    schema = _partial_schema(df, group_cols)
    sel = [*group_cols, value_col] + ([weight_col] if weight_col else [])
    pruned = df.select(*sel)
    tname = pruned.schema[value_col].dataType.typeName()
    numeric_value = tname in {
        "double", "float", "integer", "long", "short", "byte", "decimal",
    }
    int_value = tname in {"integer", "long", "short", "byte"}
    # hash-family kernels (HLL/CMS/Bloom) hash integer columns via their
    # exact bit pattern, and exact-key kernels (MisraGries) keep raw keys —
    # a float64 round-trip would collide IDs above 2^53 and turn keys into
    # '12345.0'-style strings downstream
    preserve_int = getattr(factory(), "value_family", "numeric") in ("hash", "exact")

    def build(batches):
        import pyarrow as pa

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        sketches: dict[tuple, object] = {}
        arrow_schema = None
        for batch in batches:
            if arrow_schema is None:
                arrow_schema = batch.schema
            vcol = batch.column(len(group_cols))
            if preserve_int and int_value:
                valid = ~np.asarray(vcol.is_null()) if vcol.null_count else None
                vals_all = (
                    vcol.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
                )
            elif numeric_value:
                vals_all = vcol.cast(pa.float64()).to_numpy(zero_copy_only=False)
                valid = None
            else:
                vals_all = vcol.to_numpy(zero_copy_only=False)
                valid = ~np.asarray(vcol.is_null())
            w_all = None
            if weight_col is not None:
                w_all = (
                    batch.column(len(group_cols) + 1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
            if not group_cols:
                sk = sketches.setdefault((), factory())
                sl = slice(None) if valid is None else valid
                if w_all is None:
                    sk.update(vals_all[sl])
                else:
                    _kernel_update_weighted(sk, vals_all[sl], w_all[sl])
                continue
            # dictionary-encode each group col: int codes, tiny value dicts
            code_arrays, dicts = [], []
            for gi in range(len(group_cols)):
                de = batch.column(gi).dictionary_encode()
                codes = de.indices.to_numpy(zero_copy_only=False)
                if de.indices.null_count:
                    codes = np.where(np.isnan(codes), len(de.dictionary), codes)
                codes = codes.astype(np.int64)
                code_arrays.append(codes)
                dicts.append(de.dictionary.to_pylist() + [None])
            combined = code_arrays[0]
            for gi in range(1, len(group_cols)):
                combined = combined * len(dicts[gi]) + code_arrays[gi]
            order = np.argsort(combined, kind="stable")
            sorted_codes = combined[order]
            starts = np.flatnonzero(np.diff(sorted_codes, prepend=sorted_codes[0] - 1)) if sorted_codes.size else np.empty(0, np.int64)
            for i, g0 in enumerate(starts):
                g1 = starts[i + 1] if i + 1 < len(starts) else len(sorted_codes)
                code = sorted_codes[g0]
                key = []
                for gi in reversed(range(len(group_cols))):
                    code, r = divmod(code, len(dicts[gi])) if gi > 0 else (0, code)
                    key.append(dicts[gi][int(r)])
                key = tuple(reversed(key))
                sk = sketches.get(key)
                if sk is None:
                    sk = sketches[key] = factory()
                idx = order[g0:g1]
                if valid is not None:
                    idx = idx[valid[idx]]
                if w_all is None:
                    sk.update(vals_all[idx])
                else:
                    _kernel_update_weighted(sk, vals_all[idx], w_all[idx])
        cols: list[list] = [[] for _ in range(len(group_cols))]
        states, ns, bs, cs, pids = [], [], [], [], []
        for key, sk in sketches.items():
            n, b, c = _metrics_of(sk)
            for gi, kv in enumerate(key):
                cols[gi].append(kv)
            states.append(sk.to_bytes())
            ns.append(n)
            bs.append(b)
            cs.append(c)
            pids.append(pid)
        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(schema)
        arrays = [
            pa.array(cols[gi], type=out_schema.field(gi).type)
            for gi in range(len(group_cols))
        ] + [
            pa.array(states, type=pa.binary()),
            pa.array(ns, type=pa.int64()),
            pa.array(bs, type=pa.int32()),
            pa.array(cs, type=pa.int32()),
            pa.array(pids, type=pa.int32()),
        ]
        yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    return pruned.mapInArrow(build, schema=schema)


def _null_safe(k):
    # pandas uses NaN/NaT for missing group keys; Arrow wants None
    if k is None or (isinstance(k, float) and math.isnan(k)) or k is pd.NaT:
        return None
    return k


def merge_grouped(
    partials: DataFrame,
    group_cols: Sequence[str],
    from_bytes: Callable[[bytes], object],
) -> DataFrame:
    """Stage 2: shuffle partial states by group, merge per group.

    The shuffle payload is sketch blobs only. Merge order is arbitrary —
    valid because kernel merge is commutative/associative (property-tested).
    """
    group_cols = list(group_cols)
    out_fields = [f for f in partials.schema.fields if f.name in group_cols]
    schema = StructType(
        out_fields
        + [
            StructField("state", BinaryType(), False),
            StructField("n", LongType(), False),
            StructField("buckets", IntegerType(), False),
            StructField("collapses", IntegerType(), False),
            StructField("num_partials", IntegerType(), False),
        ]
    )

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        states = pdf["state"]
        sk = from_bytes(states.iloc[0])
        for blob in states.iloc[1:]:
            sk = sk.merge(from_bytes(blob))
        n, b, c = _metrics_of(sk)
        # _null_safe: pandas encodes a NULL group key as NaN/NaT; emitting
        # that into a non-float Arrow field fails the stage
        key_vals = [_null_safe(pdf[c_].iloc[0]) for c_ in group_cols]
        return pd.DataFrame(
            [tuple(key_vals) + (sk.to_bytes(), n, b, c, len(pdf))],
            columns=[f.name for f in schema.fields],
        )

    if not group_cols:
        raise ValueError("merge_grouped needs group_cols; use sketch_global for global")
    return partials.groupBy(*group_cols).applyInPandas(merge_fn, schema=schema)


def _tree_merge_bytes(blobs, fb, depth: int):
    """treeAggregate with a None sentinel: ONE job, same pairwise merge
    tree as RDD.treeReduce (which PySpark implements as exactly this
    aggregate over (isZero, value) pairs — so results stay bit-identical
    for order-sensitive kernels like KLL). Replaces the old
    persist + isEmpty + treeReduce + unpersist dance, which cost one extra
    job (the isEmpty take(1)) and a cache round-trip per global fill —
    measured r7: that overhead was a fixed ~0.15-0.3 s tax on every one of
    the nine headline queries that end in a global fill (guide §1.2: remove
    passes before tuning anything else). Returns the merged blob, or None
    when ``blobs`` is empty."""
    def seq(acc, b):
        return b if acc is None else fb(acc).merge(fb(b)).to_bytes()

    def comb(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return fb(a).merge(fb(b)).to_bytes()

    return blobs.treeAggregate(None, seq, comb, depth=depth)


def rollup_states(
    states: DataFrame,
    group_cols: Sequence[str],
    from_bytes: Callable[[bytes], object],
    depth: int = 2,
):
    """Re-aggregate an EXISTING sketch-state table to a coarser grouping —
    the incremental-rollup pattern: materialize per-(day, group) states
    once (plain parquet; ``state`` is a binary column), then ANY coarser
    query — a date range, a group rollup, the global figure — is a merge
    over a few KB of states, never a rescan of the raw table. At 10^12
    turns that turns repeat quantile queries from full-scan cost into
    metadata cost. Valid because kernel merge is commutative/associative
    (property-tested); with no collapses the rollup is bit-identical to a
    full recompute (oracle-checked by the udds_rollup_daily driver query).

    group_cols non-empty -> DataFrame[group..., state, n, ...];
    group_cols empty -> the merged kernel object (treeReduce, like
    sketch_global).
    """
    group_cols = list(group_cols)
    if group_cols:
        return merge_grouped(states, group_cols, from_bytes)
    blobs = states.select("state").rdd.map(lambda r: bytes(r[0]))
    out = _tree_merge_bytes(blobs, from_bytes, depth)
    if out is None:
        raise ValueError("rollup_states: empty state table")
    return from_bytes(out)


def rollup_grouping_sets(
    states: DataFrame,
    grouping_sets: Sequence[Sequence[str]],
    from_bytes: Callable[[bytes], object],
) -> DataFrame:
    """SQL GROUPING SETS over a sketch-state table: every requested
    grouping set is derived from ONE finest-grain state table by merging
    states — the raw table is scanned exactly once (by whoever built
    ``states``), and each set costs a merge over KB-sized blobs instead of
    a rescan. The sketch-native form of the classic one-pass OLAP cube: at
    10^12 turns, ``CUBE(role, tool)`` as four separate aggregations is four
    full scans; here it is one fill plus three merges of a
    |distinct(role, tool)|-row table.

    ``states``: DataFrame[cols..., state, n, buckets, collapses, ...] whose
    grouping columns are (a superset of) the union of ``grouping_sets`` —
    the output of sketch_grouped / sketch_grouped_jvm / dd_states_grouped_jvm
    on the FINEST grouping, or a checkpointed state table. The caller
    persists it (it is tiny); each grouping set references it again.

    Returns DataFrame[all_cols..., grouping_id, state, n, buckets,
    collapses] — one row per group cell per set, columns absent from a set
    padded with NULL, and ``grouping_id`` following the SQL / Spark
    ``grouping_id()`` bit convention (first column of the ordered union =
    most significant bit; bit set = column aggregated away), so rollup
    NULLs are distinguishable from data NULLs exactly as in SQL.

    Validity: kernel merge is commutative/associative (property-tested),
    so every cell equals a direct fill on its slice up to merge effects —
    bit-identical for UDD m=0 / DD / HLL / CMS / Bloom / theta /
    moments, bound-preserving for t-digest / Misra-Gries (see
    sketch_grouped's pre_aggregate note for the same taxonomy).
    """
    sets = [list(s) for s in grouping_sets]
    if not sets:
        raise ValueError("rollup_grouping_sets: no grouping sets")
    all_cols: list[str] = []
    for s in sets:
        for c in s:
            if c not in all_cols:
                all_cols.append(c)
        if len(set(s)) != len(s):
            raise ValueError(f"duplicate column in grouping set {s}")
    missing = [c for c in all_cols if c not in states.columns]
    if missing:
        raise ValueError(f"states table lacks grouping columns {missing}")
    dtypes = {f.name: f.dataType for f in states.schema.fields}
    # ONE merge stage for every set (r7): project the state table once per
    # set — keys kept for the set's columns, NULL-padded otherwise, plus
    # the set's grouping_id — union the projections, and merge with a
    # single groupBy(all_cols + grouping_id).applyInPandas. grouping_id
    # separates the sets, so cells are merged over exactly the same state
    # rows as the old one-merge-per-set form (bit-identical for the
    # exact-merge kernels; same bounds otherwise), while N sets cost one
    # shuffle + one Python stage instead of N of each — the per-stage
    # overhead was most of this operator's wall time, the blobs being KB.
    parts = []
    for s in sets:
        gid = sum(
            1 << (len(all_cols) - 1 - i)
            for i, c in enumerate(all_cols)
            if c not in s
        )
        parts.append(
            states.select(
                *[
                    F.col(c) if c in s else F.lit(None).cast(dtypes[c]).alias(c)
                    for c in all_cols
                ],
                F.lit(gid).cast("int").alias("grouping_id"),
                "state",
            )
        )
    tagged = parts[0]
    for p in parts[1:]:
        tagged = tagged.unionByName(p)
    return merge_grouped(
        tagged, all_cols + ["grouping_id"], from_bytes
    ).select(*all_cols, "grouping_id", "state", "n", "buckets", "collapses")


def rollup_cube(
    states: DataFrame,
    cols: Sequence[str],
    from_bytes: Callable[[bytes], object],
) -> DataFrame:
    """CUBE(cols): all 2^|cols| grouping sets from one finest state table
    (SQL ``GROUP BY CUBE`` semantics, sketch-merge cost)."""
    cols = list(cols)
    if len(cols) > 10:
        raise ValueError("rollup_cube: 2^|cols| sets; use rollup_grouping_sets")
    sets = [
        [c for i, c in enumerate(cols) if mask & (1 << (len(cols) - 1 - i))]
        for mask in range((1 << len(cols)) - 1, -1, -1)
    ]
    return rollup_grouping_sets(states, sets, from_bytes)


def rollup_hierarchy(
    states: DataFrame,
    cols: Sequence[str],
    from_bytes: Callable[[bytes], object],
) -> DataFrame:
    """ROLLUP(cols): the prefix chain (c1..ck), (c1..ck-1), ..., () — SQL
    ``GROUP BY ROLLUP`` semantics at sketch-merge cost."""
    cols = list(cols)
    sets = [cols[:i] for i in range(len(cols), -1, -1)]
    return rollup_grouping_sets(states, sets, from_bytes)


def sketch_grouped(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    factory: SketchFactory = UDDSketch,
    from_bytes: Callable[[bytes], object] | None = None,
    pre_aggregate: bool = False,
) -> DataFrame:
    """partials -> keyed merge. Returns DataFrame[group..., state, n, buckets, collapses, num_partials].

    ``pre_aggregate=True`` runs a Tungsten ``groupBy(group, value).count()``
    FIRST and feeds (value, weight) pairs to the kernel — the JVM->Python
    Arrow exchange then carries |distinct (group, value)| rows instead of N.
    The right call for duplicate-heavy columns (integer-ish features,
    categorical values): at 10^12 turns with ~10^3 distinct lengths per
    group, the Python stage sees ~10^3 rows per group instead of 10^9.
    Wrong call for near-unique columns (the extra shuffle buys nothing).
    State-identical to the row path for UDD (same bucket increments),
    HLL/Bloom (duplicate-insensitive), and CMS (additive counters);
    bound-preserving but NOT state-identical for t-digest and Misra-Gries
    (their compression/shrink sees different intermediate states, so
    centroids/counters can differ while the published error bounds still
    hold); rank-compaction kernels (KLL, REQ) reject it loudly.
    """
    fb = from_bytes or _default_from_bytes(factory)
    if pre_aggregate:
        counts = df.groupBy(*group_cols, value_col).agg(
            F.count(F.lit(1)).alias("_w")
        )
        partials = partial_sketches(counts, value_col, group_cols, factory,
                                    weight_col="_w")
    else:
        partials = partial_sketches(df, value_col, group_cols, factory)
    return merge_grouped(partials, group_cols, fb)


def _default_from_bytes(factory: SketchFactory):
    probe = factory()
    return type(probe).from_bytes


def sketch_global(
    df: DataFrame,
    value_col: str,
    factory: SketchFactory = UDDSketch,
    from_bytes: Callable[[bytes], object] | None = None,
    depth: int = 2,
    pre_aggregate: bool = False,
    weight_col: str | None = None,
):
    """Global sketch via two-level treeReduce over serialized partials.

    Spark analogue of the reference's MPI_Reduce with a custom commutative op
    (/root/reference/psketches/pudds.cpp:45-57,175-182): executors pairwise-
    merge blobs at ``depth`` levels, the driver receives one blob.
    Returns the merged kernel object (driver-side, like rank 0).
    ``pre_aggregate``: see sketch_grouped — Tungsten distinct-count first,
    weighted kernel fill after; for duplicate-heavy value columns.
    ``weight_col``: fill from an ALREADY-aggregated (value, weight) table —
    the caller pays the Tungsten count once and can reuse it for other
    work, instead of pre_aggregate computing a private copy.
    """
    fb = from_bytes or _default_from_bytes(factory)
    if pre_aggregate and weight_col is not None:
        raise ValueError("pass pre_aggregate or weight_col, not both")
    if pre_aggregate:
        counts = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_w"))
        partials = partial_sketches(counts, value_col, (), factory,
                                    weight_col="_w")
    elif weight_col is not None:
        partials = partial_sketches(df, value_col, (), factory,
                                    weight_col=weight_col)
    else:
        partials = partial_sketches(df, value_col, (), factory)
    blobs = partials.select("state").rdd.map(lambda r: bytes(r[0]))
    out = _tree_merge_bytes(blobs, fb, depth)
    return factory() if out is None else fb(out)


def quantile_table(
    merged: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    from_bytes: Callable[[bytes], object] = UDDSketch.from_bytes,
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """Finalize: DataFrame[group..., q, est, extra...] from merged sketch
    states. ``extra_cols`` pass through columns of ``merged`` (e.g. the n
    metric) WITHOUT a self-join — joining the finalized table back to
    ``merged`` would recompute the whole fill pipeline (second scan)."""
    qs = [float(q) for q in qs]
    extra_cols = list(extra_cols)

    @F.pandas_udf(ArrayType(DoubleType()))
    def q_udf(states: pd.Series) -> pd.Series:
        return states.map(lambda b: [float(from_bytes(b).quantile(q)) for q in qs])

    qlits = F.array(*[F.lit(q) for q in qs])
    return (
        merged.withColumn("_ests", q_udf("state"))
        .select(
            *group_cols,
            *extra_cols,
            F.explode(F.arrays_zip(qlits.alias("q"), F.col("_ests").alias("est"))).alias("_z"),
        )
        .select(*group_cols, F.col("_z.q").alias("q"), F.col("_z.est").alias("est"),
                *extra_cols)
    )


# --------------------------------------------------------------------------
# JVM fill path: the UDD bucket-key function is a Catalyst expression, so the
# whole fill stage runs as a Tungsten hash aggregation (codegen, map-side
# partial + final) — Python only ever sees the tiny (group, key, count)
# bucket table. This is the idiomatic-Spark equivalent of the reference's
# per-rank fill loop (pudds.cpp:150-153) and is the scale path: per-row work
# never leaves the JVM; shuffle moves bucket counts, not rows.
# --------------------------------------------------------------------------
def udds_bucket_counts(
    df: DataFrame, value_col: str, group_cols: Sequence[str], alpha: float
) -> DataFrame:
    """(group..., _bkey, _bcnt): JVM-side log-bucket histogram.

    _bkey NULL encodes the zero bucket (v < MIN_ADDRESSABLE, incl. 0 and
    negatives, matching uddsketch.cpp:176-179); NaNs are dropped.
    """
    from ..core.uddsketch import MIN_ADDRESSABLE

    gamma0 = (1.0 + alpha) / (1.0 - alpha)
    log_gamma = float(np.log(gamma0))
    v = F.col(value_col)
    key = F.when(
        v >= MIN_ADDRESSABLE, F.ceil(F.log(v) / F.lit(log_gamma)).cast("long")
    )  # NULL -> zero bucket
    return (
        df.select(*group_cols, v.alias(value_col))
        .where(~F.isnan(v.cast("double")) & v.isNotNull())
        .groupBy(*group_cols, key.alias("_bkey"))
        .agg(F.count(F.lit(1)).alias("_bcnt"))
    )


def udds_states_from_buckets(
    buckets: DataFrame, group_cols: Sequence[str], alpha: float, m: int
) -> DataFrame:
    """Assemble UDDSketch states from the JVM bucket table (per group).

    Input per group is <= |distinct keys| rows (a few thousand); collapse to
    the m bound happens here, in one vectorized pass.
    """
    group_cols = list(group_cols)
    out_fields = [f for f in buckets.schema.fields if f.name in group_cols]
    schema = StructType(
        out_fields
        + [
            StructField("state", BinaryType(), False),
            StructField("n", LongType(), False),
            StructField("buckets", IntegerType(), False),
            StructField("collapses", IntegerType(), False),
            StructField("num_partials", IntegerType(), False),
        ]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["_bkey"]
        zero = int(pdf.loc[keys.isna(), "_bcnt"].sum())
        live = pdf.loc[keys.notna()]
        k = live["_bkey"].to_numpy(dtype=np.int64)
        c = live["_bcnt"].to_numpy(dtype=np.int64)
        order = np.argsort(k, kind="stable")
        sk = UDDSketch(
            initial_alpha=alpha, m=m, zero_count=zero, keys=k[order], counts=c[order]
        )
        sk._enforce_bound()
        key_vals = [_null_safe(pdf[g].iloc[0]) for g in group_cols]
        return pd.DataFrame(
            [tuple(key_vals) + (sk.to_bytes(), sk.count, sk.num_buckets, sk.num_collapses, len(pdf))],
            columns=[f.name for f in schema.fields],
        )

    if not group_cols:
        raise ValueError("udds_states_from_buckets needs group_cols; "
                         "the global path collects the bucket table directly")
    return buckets.groupBy(*group_cols).applyInPandas(assemble, schema=schema)


def sketch_grouped_jvm(
    df: DataFrame, value_col: str, group_cols: Sequence[str], alpha: float, m: int
) -> DataFrame:
    """UDDSketch states via the JVM fill path (Tungsten hash agg fill)."""
    b = udds_bucket_counts(df, value_col, group_cols, alpha)
    return udds_states_from_buckets(b, group_cols, alpha, m)


def udds_quantile_table_jvm(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    qs: Sequence[float],
    alpha: float,
    m: int,
) -> DataFrame:
    """Fused JVM path: bucket histogram (Tungsten) -> ONE applyInPandas stage
    assembling the sketch AND finalizing quantiles — a single Python stage
    over the tiny bucket table (half the Python round-trips of
    sketch_grouped_jvm + quantile_table; same results)."""
    group_cols = list(group_cols)
    qs = [float(q) for q in qs]
    buckets = udds_bucket_counts(df, value_col, group_cols, alpha)
    out_fields = [f for f in buckets.schema.fields if f.name in group_cols]
    schema = StructType(
        out_fields
        + [
            StructField("q", DoubleType(), False),
            StructField("est", DoubleType(), False),
            StructField("n", LongType(), False),
        ]
    )

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["_bkey"]
        zero = int(pdf.loc[keys.isna(), "_bcnt"].sum())
        live = pdf.loc[keys.notna()]
        k = live["_bkey"].to_numpy(dtype=np.int64)
        c = live["_bcnt"].to_numpy(dtype=np.int64)
        order = np.argsort(k, kind="stable")
        sk = UDDSketch(initial_alpha=alpha, m=m, zero_count=zero,
                       keys=k[order], counts=c[order])
        sk._enforce_bound()
        key_vals = tuple(_null_safe(pdf[g].iloc[0]) for g in group_cols)
        rows = [key_vals + (q, float(sk.quantile(q)), sk.count) for q in qs]
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return buckets.groupBy(*group_cols).applyInPandas(finalize, schema=schema)


def udds_quantiles_multi(
    df: DataFrame,
    value_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    qs: Iterable[float] = (0.5, 0.9, 0.99, 0.999),
    alpha: float = 0.01,
    m: int = 200,
) -> DataFrame:
    """Quantiles for SEVERAL numeric features in ONE scan.

    The reference runs one reduction per binary invocation; on a 100 TB
    table the scan dominates, so re-reading it per feature is the real
    cost. Here the feature columns stack into (feature, value) rows with a
    Catalyst ``stack`` (codegen'd, no Python, no extra scan) and feature
    becomes the leading group key of the SAME Tungsten bucket-histogram
    fill — N features for one scan and one shuffle of bucket counts.

    Output: DataFrame[feature, group..., q, est, n].
    """
    group_cols = list(group_cols)
    # pure Column expressions (no SQL-string interpolation — a column name
    # containing a quote/backtick must not break or reshape the plan);
    # explode(array(struct...)) compiles to the same Generate node as stack
    stacked = df.select(
        *group_cols,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("feature"),
                    F.col(c).cast("double").alias("_value"),
                )
                for c in value_cols
            ])
        ).alias("_fv"),
    ).select(*group_cols, F.col("_fv.feature").alias("feature"),
             F.col("_fv._value").alias("_value"))
    gcols = ["feature", *group_cols]
    merged = sketch_grouped_jvm(stacked, "_value", gcols, alpha, m)
    return quantile_table(merged, gcols, list(qs), UDDSketch.from_bytes,
                          extra_cols=["n"])


def udds_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    qs: Iterable[float] = (0.5, 0.9, 0.99, 0.999),
    alpha: float = 0.01,
    m: int = 200,
    engine: str = "jvm",
    pre_aggregate: bool = False,
) -> DataFrame:
    """One-call UDDSketch quantile summary, grouped or global.

    ``pre_aggregate`` applies to engine="python" only (the JVM engine IS a
    pre-aggregation — its Tungsten histogram already ships distinct bucket
    keys); see sketch_grouped.

    Flagship API: p50/p90/p99/p999 of a numeric feature grouped by e.g.
    role/tool, at relative-error alpha with memory bounded by m buckets.

    engine="jvm" (default): fill = Tungsten hash aggregation on the Catalyst
    bucket-key expression; Python touches only the bucket table. Identical
    results to engine="python" (the Arrow mapInPandas/treeReduce path, which
    also generalizes to the non-SQL-expressible companion sketches).

    Note: with m small enough to trigger collapses, the python path may
    collapse *during* the fill (per partition), while the jvm path collapses
    once globally — both satisfy the alpha bound, but bucket sets can differ;
    with no collapse (m=0 or large m) the two are bit-identical.
    """
    qs = list(qs)
    if engine == "jvm":
        if group_cols:
            merged = sketch_grouped_jvm(df, value_col, group_cols, alpha, m)
            return quantile_table(merged, group_cols, qs, UDDSketch.from_bytes)
        buckets = udds_bucket_counts(df, value_col, (), alpha).collect()
        zero = sum(r["_bcnt"] for r in buckets if r["_bkey"] is None)
        live = sorted((r["_bkey"], r["_bcnt"]) for r in buckets if r["_bkey"] is not None)
        sk = UDDSketch(
            initial_alpha=alpha,
            m=m,
            zero_count=int(zero),
            keys=np.array([k for k, _ in live], dtype=np.int64),
            counts=np.array([c for _, c in live], dtype=np.int64),
        )
        sk._enforce_bound()
        return df.sparkSession.createDataFrame(
            [(float(q), float(sk.quantile(q))) for q in qs], schema="q double, est double"
        )
    factory = lambda: UDDSketch(initial_alpha=alpha, m=m)  # noqa: E731
    if group_cols:
        merged = sketch_grouped(df, value_col, group_cols, factory,
                                UDDSketch.from_bytes, pre_aggregate=pre_aggregate)
        return quantile_table(merged, group_cols, qs, UDDSketch.from_bytes)
    sk = sketch_global(df, value_col, factory, UDDSketch.from_bytes,
                       pre_aggregate=pre_aggregate)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(q), float(sk.quantile(q))) for q in qs], schema="q double, est double"
    )


def dd_bucket_counts(
    df: DataFrame, value_col: str, group_cols: Sequence[str], alpha: float
) -> DataFrame:
    """(group..., _sign, _bkey, _bcnt): JVM-side signed log-bucket histogram
    for the DDSketch pair — the flagship Tungsten-fill architecture extended
    to the second kernel family. _sign in {-1, 0, 1} (0 = B*, the near-zero
    bucket: |v| < MIN_ADDRESSABLE); keys are ceil(ln(|v|)/ln gamma), the
    same libm expression the numpy kernel uses (non-compat path), so the
    assembled pair is bucket-identical to an Arrow fill at m=0."""
    from ..core.uddsketch import MIN_ADDRESSABLE

    gamma0 = (1.0 + alpha) / (1.0 - alpha)
    log_gamma = float(np.log(gamma0))
    v = F.col(value_col).cast("double")
    sign = (
        F.when(F.abs(v) < MIN_ADDRESSABLE, F.lit(0))
        .when(v > 0, F.lit(1))
        .otherwise(F.lit(-1))
    )
    key = F.when(
        F.abs(v) >= MIN_ADDRESSABLE,
        F.ceil(F.log(F.abs(v)) / F.lit(log_gamma)).cast("long"),
    ).otherwise(F.lit(0))
    return (
        df.select(*group_cols, v.alias(value_col))
        .where(~F.isnan(v) & v.isNotNull())
        .groupBy(*group_cols, sign.alias("_sign"), key.alias("_bkey"))
        .agg(F.count(F.lit(1)).alias("_bcnt"))
    )


def dd_sketch_global_jvm(
    df: DataFrame,
    value_col: str,
    alpha: float,
    m: int = 0,
    collapse_mode: str = "uniform",
):
    """Global DDSketchPair via the JVM histogram fill (driver-side object).

    Python sees only the <=10^3-row (sign, key, count) table plus one
    min/max row; the heavy per-row work is Tungsten hash aggregation. With
    m=0 the result is bucket-identical to the Arrow-engine fill (pinned in
    tests). With m>0 the bound is enforced ONCE on the assembled store (a
    one-shot fold): for uniform mode that is the minimal-collapse result;
    for the ddog trash-bin modes the fold history differs from an
    incremental fill's, so use the Arrow engine when reference fold-order
    parity matters. Not available for compat=True (glibc fast-log keys are
    Python-side)."""
    from ..core.ddsketch import DDSketchPair

    rows = dd_bucket_counts(df, value_col, (), alpha).collect()
    zero = sum(r["_bcnt"] for r in rows if r["_sign"] == 0)
    pos = sorted((r["_bkey"], r["_bcnt"]) for r in rows if r["_sign"] == 1)
    neg = sorted((r["_bkey"], r["_bcnt"]) for r in rows if r["_sign"] == -1)
    v = F.col(value_col).cast("double")
    mm = (
        df.select(v.alias("v"))
        .where(~F.isnan(F.col("v")) & F.col("v").isNotNull())
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .first()
    )
    sk = DDSketchPair(
        initial_alpha=alpha,
        m=m,
        collapse_mode=collapse_mode,
        zero_count=int(zero),
        pos_keys=np.array([k for k, _ in pos], dtype=np.int64),
        pos_counts=np.array([c for _, c in pos], dtype=np.int64),
        neg_keys=np.array([k for k, _ in neg], dtype=np.int64),
        neg_counts=np.array([c for _, c in neg], dtype=np.int64),
        min_value=float(mm["lo"]) if mm["lo"] is not None else float("nan"),
        max_value=float(mm["hi"]) if mm["hi"] is not None else float("nan"),
    )
    sk._enforce_bound()
    return sk


def dd_states_grouped_jvm(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    alpha: float,
    m: int = 0,
    collapse_mode: str = "uniform",
) -> DataFrame:
    """Grouped DDSketchPair states from the JVM histogram fill:
    DataFrame[group..., state, n, buckets, collapses, num_partials].

    Same contract as sketch_grouped; per group the input is the <=10^3-row
    signed bucket table plus a min/max row, assembled and bound-enforced in
    one vectorized pass (see dd_sketch_global_jvm for the one-shot-fold
    caveat on ddog modes with m > 0)."""
    from ..core.ddsketch import DDSketchPair

    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("dd_states_grouped_jvm needs group_cols; "
                         "use dd_sketch_global_jvm for global")
    buckets = dd_bucket_counts(df, value_col, group_cols, alpha)
    v = F.col(value_col).cast("double")
    mm = (
        df.select(*group_cols, v.alias("_v"))
        .where(~F.isnan(F.col("_v")) & F.col("_v").isNotNull())
        .groupBy(*group_cols)
        .agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    )
    # null-SAFE join: a NULL group key must keep its state row (null-unsafe
    # equality would silently drop the NULL group, diverging from the Arrow
    # engine's _null_safe handling)
    mm_r = mm.select(*[F.col(c).alias(f"__mm_{c}") for c in group_cols], "_lo", "_hi")
    cond = None
    for c in group_cols:
        clause = buckets[c].eqNullSafe(F.col(f"__mm_{c}"))
        cond = clause if cond is None else (cond & clause)
    joined = buckets.join(mm_r, cond).drop(*[f"__mm_{c}" for c in group_cols])
    out_fields = [f for f in joined.schema.fields if f.name in group_cols]
    schema = StructType(
        out_fields
        + [
            StructField("state", BinaryType(), False),
            StructField("n", LongType(), False),
            StructField("buckets", IntegerType(), False),
            StructField("collapses", IntegerType(), False),
            StructField("num_partials", IntegerType(), False),
        ]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        zero = int(pdf.loc[pdf["_sign"] == 0, "_bcnt"].sum())
        pos = pdf[pdf["_sign"] == 1].sort_values("_bkey")
        neg = pdf[pdf["_sign"] == -1].sort_values("_bkey")
        sk = DDSketchPair(
            initial_alpha=alpha,
            m=m,
            collapse_mode=collapse_mode,
            zero_count=zero,
            pos_keys=pos["_bkey"].to_numpy(dtype=np.int64),
            pos_counts=pos["_bcnt"].to_numpy(dtype=np.int64),
            neg_keys=neg["_bkey"].to_numpy(dtype=np.int64),
            neg_counts=neg["_bcnt"].to_numpy(dtype=np.int64),
            min_value=float(pdf["_lo"].iloc[0]),
            max_value=float(pdf["_hi"].iloc[0]),
        )
        sk._enforce_bound()
        key_vals = [_null_safe(pdf[c].iloc[0]) for c in group_cols]
        return pd.DataFrame(
            [tuple(key_vals) + (sk.to_bytes(), sk.count, sk.num_buckets,
                                sk.num_collapses + sk.pair_collapses, 1)],
            columns=[f.name for f in schema.fields],
        )

    return joined.groupBy(*group_cols).applyInPandas(assemble, schema=schema)
