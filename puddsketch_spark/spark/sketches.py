"""High-level sketch aggregation APIs over the generic partial/merge plumbing.

One function per sketch, all built on agg.partial_sketches / merge_grouped /
sketch_global — identical distributed shape to the UDDSketch flagship:
Arrow-vectorized per-partition partials, blob-only shuffles, commutative
merges. (North_rule companion set: HLL, count-min, t-digest, KLL, Bloom —
plus theta set algebra, exact moments, and the sketch-powered analytics:
quantile-threshold filtering and the quantile-rank transform.)
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

from ..core.bloom import BloomFilter
from ..core.cms import CountMinSketch
from ..core.hll import HLLSketch
from ..core.kll import KLLSketch
from ..core.tdigest import TDigest
from ..core.theta import ThetaSketch
from .agg import quantile_table, sketch_global, sketch_grouped

__all__ = [
    "hll_distinct",
    "theta_global",
    "theta_states",
    "theta_set_ops",
    "moments_stats",
    "moments_table",
    "filter_above_quantile",
    "with_quantile_rank",
    "cms_states",
    "cms_global",
    "bloom_global",
    "bloom_states",
    "dd_quantiles",
    "tdigest_quantiles",
    "kll_quantiles",
    "heavy_hitters_global",
    "heavy_hitters_grouped",
]


def _null_safe_broadcast_join(
    df: DataFrame, small: DataFrame, keys: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Broadcast-join a small keyed table onto ``df`` with null-SAFE key
    equality. A plain column-name equi-join silently drops every row whose
    key is NULL even when the small table carries a NULL-key row (the agg
    paths produce one via _null_safe) — same contract as the JVM fill's
    join in agg.dd_states_grouped_jvm."""
    renamed = small.select(
        *[F.col(c).alias(f"__ns_{c}") for c in keys],
        *[c for c in small.columns if c not in keys],
    )
    cond = None
    for c in keys:
        clause = F.col(c).eqNullSafe(F.col(f"__ns_{c}"))
        cond = clause if cond is None else (cond & clause)
    return df.join(F.broadcast(renamed), cond, how).drop(
        *[f"__ns_{c}" for c in keys]
    )


# ---------------------------------------------------------------- HLL
def hll_distinct(
    df: DataFrame, col: str, group_cols: Sequence[str] = (), p: int = 14
) -> DataFrame | int:
    """Approximate COUNT(DISTINCT col), grouped or global.

    Grouped -> DataFrame[group..., est:long]; global -> int.
    """
    factory = lambda: HLLSketch(p=p)  # noqa: E731
    if not group_cols:
        return int(round(sketch_global(df, col, factory, HLLSketch.from_bytes).estimate()))
    merged = sketch_grouped(df, col, group_cols, factory, HLLSketch.from_bytes)

    @F.pandas_udf(LongType())
    def est(states: pd.Series) -> pd.Series:
        return states.map(lambda b: int(round(HLLSketch.from_bytes(b).estimate())))

    return merged.select(*group_cols, est("state").alias("est"))


# ---------------------------------------------------------------- Theta
def theta_global(df: DataFrame, col: str, k: int = 4096) -> ThetaSketch:
    """Global theta (KMV) distinct sketch of ``col`` (driver-side object).

    Unlike :func:`hll_distinct`, the result supports set operations —
    ``ThetaSketch.intersect`` / ``a_not_b`` / ``union`` — so overlap
    cardinalities between two columns/tables stay sketch-level instead of
    exact-join-level at scale.
    """
    factory = lambda: ThetaSketch(k=k)  # noqa: E731
    return sketch_global(df, col, factory, ThetaSketch.from_bytes)


def theta_states(
    df: DataFrame, col: str, group_cols: Sequence[str], k: int = 4096
) -> DataFrame:
    """Per-group theta states (DataFrame[group..., state]) — mergeable blobs
    for rollups, and set-op-able across groups driver-side."""
    factory = lambda: ThetaSketch(k=k)  # noqa: E731
    return sketch_grouped(df, col, group_cols, factory, ThetaSketch.from_bytes)


def theta_set_ops(
    df_a: DataFrame, col_a: str, df_b: DataFrame, col_b: str, k: int = 4096
) -> dict:
    """Distinct-set algebra between two columns in one pass per side.

    Returns {"a", "b", "union", "intersection", "a_not_b", "b_not_a",
    "jaccard", "rse", "theta_frac"} — every cardinality a float estimate
    from the two theta sketches. BOTH sides fill in one tagged scan
    (grouped by side); the shuffle carries only (k * 8)-byte key blobs,
    never the columns themselves.

    The key columns must share one dtype: hash64 hashes an int's bit
    pattern and a float/string's bytes DISJOINTLY, so set-ops between,
    say, a bigint and a double column of the same logical values would
    come back ~0 overlap with no error. Cast both sides to a common type
    first (``df.withColumn(c, F.col(c).cast("bigint"))``) — mismatches
    raise rather than mis-estimate (same contract as bloom_probe).
    """
    type_a = dict(df_a.dtypes)[col_a]
    type_b = dict(df_b.dtypes)[col_b]
    if type_a != type_b:
        raise TypeError(
            f"theta_set_ops key dtypes differ ({col_a}: {type_a} vs "
            f"{col_b}: {type_b}); hash64 hashes representations, not "
            "values, so cross-type set-ops would silently estimate ~0 "
            "overlap. Cast both columns to a common type first."
        )
    # same key type: ONE tagged scan+fill job for both sides instead of
    # two (the hash-family agg keeps per-side states separate by group)
    tagged = (
        df_a.select(F.col(col_a).alias("_v"), F.lit("a").alias("_side"))
        .unionByName(df_b.select(F.col(col_b).alias("_v"), F.lit("b").alias("_side")))
    )
    states = {
        r["_side"]: ThetaSketch.from_bytes(r["state"])
        for r in sketch_grouped(
            tagged, "_v", ["_side"], lambda: ThetaSketch(k=k), ThetaSketch.from_bytes
        ).collect()
    }
    sa = states.get("a", ThetaSketch(k=k))
    sb = states.get("b", ThetaSketch(k=k))
    union = ThetaSketch.union(sa, sb)
    inter = ThetaSketch.intersect(sa, sb)
    u = union.estimate()
    return {
        "a": sa.estimate(),
        "b": sb.estimate(),
        "union": u,
        "intersection": inter.estimate(),
        "a_not_b": ThetaSketch.a_not_b(sa, sb).estimate(),
        "b_not_a": ThetaSketch.a_not_b(sb, sa).estimate(),
        "jaccard": (inter.estimate() / u) if u > 0 else 0.0,
        "rse": max(sa.rse(), sb.rse()),
        # smallest sampling fraction across the ops — error bars are
        # ~sqrt(n / theta_frac) absolute, see ThetaSketch docstring
        "theta_frac": float(min(sa.theta, sb.theta)) / float(1 << 63),
    }


# ---------------------------------------------------------------- filters
def filter_above_quantile(
    df: DataFrame,
    value_col: str,
    q: float = 0.99,
    group_cols: Sequence[str] = (),
    alpha: float = 0.005,
    m: int = 0,
    strict: bool = True,
) -> DataFrame:
    """Rows whose ``value_col`` exceeds their group's sketch-estimated
    q-quantile — tail/outlier mining without a per-group sort.

    Two passes, both cheap at scale: (1) the JVM UDD fill produces one
    threshold per group (a ~KB-scale table regardless of input size),
    (2) the thresholds broadcast-join back onto the scan and the filter
    runs map-side. Compare with the exact approach (window rank over every
    group = full shuffle + sort of the table). With m=0 the threshold is
    the deterministic bucket-walk value, so the whole operator is
    SQL-replayable bit-exactly.
    """
    from .agg import quantile_table, sketch_grouped_jvm, udds_quantiles

    group_cols = list(group_cols)
    # Spark sorts NaN ABOVE every number, so `NaN > threshold` is TRUE —
    # but the threshold sketch dropped NaNs; exclude them from the tail too
    not_nan = ~F.isnan(F.col(value_col).cast("double"))
    cmp = (
        (lambda c, t: not_nan & (c > t))
        if strict
        else (lambda c, t: not_nan & (c >= t))
    )
    if not group_cols:
        est = udds_quantiles(df, value_col, (), [q], alpha, m, engine="jvm")
        thr = float(est.first()["est"])
        return df.where(cmp(F.col(value_col), F.lit(thr)))
    merged = sketch_grouped_jvm(df, value_col, group_cols, alpha, m)
    from ..core.uddsketch import UDDSketch

    thresholds = quantile_table(merged, group_cols, [q], UDDSketch.from_bytes).select(
        *group_cols, F.col("est").alias("_thr")
    )
    return (
        _null_safe_broadcast_join(df, thresholds, group_cols)
        .where(cmp(F.col(value_col), F.col("_thr")))
        .drop("_thr")
    )


def with_quantile_rank(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    alpha: float = 0.005,
    out: str = "qrank",
) -> DataFrame:
    """Adds ``out`` = the value's (bucket-granular) CDF position within its
    group, in (0, 1] — quantile normalization for feature engineering,
    entirely JVM-side.

    Plan: the Tungsten log-bucket histogram (KB-scale per group) becomes a
    cumulative bucket->cdf table; the table broadcast-joins back onto the
    scan on the codegen'd bucket key. No sort of the data, no Python; cost
    is one aggregation + a broadcast map join regardless of input size.
    Semantics match ``UDDSketch.rank_of``: every row sharing a bucket gets
    that bucket's cumulative mass; rows in the zero bucket (v <
    MIN_ADDRESSABLE, incl. negatives) get zero_mass / n; NaN/NULL values
    get NULL rank.
    """
    import numpy as np

    from ..core.uddsketch import MIN_ADDRESSABLE
    from .agg import udds_bucket_counts

    group_cols = list(group_cols)
    hist = udds_bucket_counts(df, value_col, group_cols, alpha)
    from pyspark.sql import Window

    wk = (
        Window.partitionBy(*group_cols)
        # NULL _bkey (the zero bucket) sorts FIRST, so the running sum
        # already includes the zero mass for every live bucket
        .orderBy(F.col("_bkey").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*group_cols)
    _ZSENT = -(1 << 62)  # NULL keys never equi-join; sentinel for the zero bucket
    cdf_tbl = hist.select(
        *group_cols,
        F.coalesce("_bkey", F.lit(_ZSENT)).alias("_bkey"),
        (F.sum("_bcnt").over(wk) / F.sum("_bcnt").over(wn)).alias("_qrank"),
    )

    gamma0 = (1.0 + alpha) / (1.0 - alpha)
    log_gamma = float(np.log(gamma0))
    v = F.col(value_col).cast("double")
    key = F.when(
        v >= MIN_ADDRESSABLE, F.ceil(F.log(v) / F.lit(log_gamma)).cast("long")
    )
    joined = _null_safe_broadcast_join(
        df.withColumn("_bkey", F.coalesce(key, F.lit(_ZSENT))),
        cdf_tbl,
        group_cols + ["_bkey"],
        "left",
    )
    return joined.withColumn(
        out, F.when(~F.isnan(v) & v.isNotNull(), F.col("_qrank"))
    ).drop("_bkey", "_qrank")


# ---------------------------------------------------------------- Moments
def moments_stats(
    df: DataFrame, value_col: str, group_cols: Sequence[str] = (),
    engine: str = "arrow",
) -> DataFrame:
    """Exact one-pass distribution-shape statistics per group:
    DataFrame[group..., n, mean, variance, stddev, skewness, kurtosis,
    vmin, vmax] via the mergeable MomentsSketch (Pébay pairwise combine).
    Global (no groups) returns a single-row DataFrame.

    ``engine="arrow"``: the generic kernel fill (mapInArrow partials, keyed
    merge) — rows cross into Python once.
    ``engine="jvm"``: same split as the UDD flagship's Tungsten path — the
    per-(group, input-partition) chunk moments come from Spark's builtin
    stable central-moment aggregates (whole-stage codegen, map-side partial
    agg; NO row ever crosses into Python), the chunk states are inverted to
    (n, mean, M2, M3, M4) and merged by the kernel's own Pébay combine.
    Merge-order float agreement with the arrow engine is the usual ~1e-12
    relative, same as any re-partitioning of the fill (module docstring of
    core.moments). NaN rows are dropped up front, mirroring the kernel's
    _drop_nan."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..core.moments import MomentsSketch

    def rows_of(sk: MomentsSketch) -> tuple:
        return (
            int(sk.n), float(sk.mean), float(sk.variance()), float(sk.stddev()),
            float(sk.skewness()), float(sk.kurtosis()), float(sk.vmin),
            float(sk.vmax),
        )

    stat_fields = [
        StructField("n", LongType(), False),
        StructField("mean", DoubleType(), True),
        StructField("variance", DoubleType(), True),
        StructField("stddev", DoubleType(), True),
        StructField("skewness", DoubleType(), True),
        StructField("kurtosis", DoubleType(), True),
        StructField("vmin", DoubleType(), True),
        StructField("vmax", DoubleType(), True),
    ]
    if engine not in ("arrow", "jvm"):
        raise ValueError("engine must be 'arrow' or 'jvm'")
    if engine == "jvm":
        v = F.col(value_col).cast("double")
        chunked = (
            df.where(v.isNotNull() & ~F.isnan(v))
            .groupBy(*group_cols, F.spark_partition_id().alias("_pid"))
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.avg(v).alias("_mean"),
                F.var_pop(v).alias("_varp"),
                F.skewness(v).alias("_skew"),
                F.kurtosis(v).alias("_kurt"),
                F.min(v).alias("_min"),
                F.max(v).alias("_max"),
            )
            .collect()
        )
        merged: dict[tuple, MomentsSketch] = {}
        # deterministic merge order: by partition id within each group
        for r in sorted(chunked, key=lambda r: (r["_pid"],)):
            n = float(r["_n"])
            m2 = 0.0 if r["_varp"] is None else float(r["_varp"]) * n
            # invert Spark's population skew/kurt back to central sums;
            # both are NaN/NULL for constant chunks (m2 == 0) -> sums are 0
            sk_ = r["_skew"]
            ku_ = r["_kurt"]
            m3 = (
                0.0 if m2 == 0.0 or sk_ is None or math.isnan(sk_)
                else float(sk_) * m2 ** 1.5 / math.sqrt(n)
            )
            m4 = (
                0.0 if m2 == 0.0 or ku_ is None or math.isnan(ku_)
                else (float(ku_) + 3.0) * m2 * m2 / n
            )
            key = tuple(r[g] for g in group_cols)
            sk = merged.setdefault(key, MomentsSketch())
            sk._combine(n, float(r["_mean"]), m2, m3, m4,
                        float(r["_min"]), float(r["_max"]))
        group_fields = [f for f in df.schema.fields if f.name in group_cols]
        schema = StructType(group_fields + stat_fields)
        rows = [key + rows_of(sk) for key, sk in merged.items()]
        return df.sparkSession.createDataFrame(rows, schema)
    if not group_cols:
        sk = sketch_global(df, value_col, MomentsSketch, MomentsSketch.from_bytes)
        return df.sparkSession.createDataFrame([rows_of(sk)], StructType(stat_fields))
    merged = sketch_grouped(
        df, value_col, group_cols, MomentsSketch, MomentsSketch.from_bytes
    )
    return moments_table(merged, group_cols)


def moments_table(merged: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Finalize a merged moments STATE table (group..., state) into the
    stats table — the piece CLI state rollups reuse without rescanning."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from ..core.moments import MomentsSketch

    stat_fields = [
        StructField("n", LongType(), False),
        StructField("mean", DoubleType(), True),
        StructField("variance", DoubleType(), True),
        StructField("stddev", DoubleType(), True),
        StructField("skewness", DoubleType(), True),
        StructField("kurtosis", DoubleType(), True),
        StructField("vmin", DoubleType(), True),
        StructField("vmax", DoubleType(), True),
    ]
    group_fields = [f for f in merged.schema.fields if f.name in group_cols]
    schema = StructType(group_fields + stat_fields)

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = MomentsSketch.from_bytes(pdf["state"].iloc[0])
        key = tuple(pdf[g].iloc[0] for g in group_cols)
        row = key + (
            int(sk.n), float(sk.mean), float(sk.variance()), float(sk.stddev()),
            float(sk.skewness()), float(sk.kurtosis()), float(sk.vmin),
            float(sk.vmax),
        )
        return pd.DataFrame([row], columns=[f.name for f in schema.fields])

    return merged.groupBy(*group_cols).applyInPandas(finalize, schema=schema)


# ---------------------------------------------------------------- CMS
def cms_global(
    df: DataFrame, col: str, depth: int = 5, width: int = 2048
) -> CountMinSketch:
    """Global frequency sketch of ``col`` (driver-side object)."""
    factory = lambda: CountMinSketch(depth=depth, width=width)  # noqa: E731
    return sketch_global(df, col, factory, CountMinSketch.from_bytes)


def cms_states(
    df: DataFrame, col: str, group_cols: Sequence[str], depth: int = 5, width: int = 2048
) -> DataFrame:
    factory = lambda: CountMinSketch(depth=depth, width=width)  # noqa: E731
    return sketch_grouped(df, col, group_cols, factory, CountMinSketch.from_bytes)


# ---------------------------------------------------------------- Bloom
def bloom_global(
    df: DataFrame, col: str, num_bits: int = 1 << 22, num_hashes: int = 7
) -> BloomFilter:
    """Global membership filter (driver-side object, e.g. for broadcast-join
    style pre-filtering of a second table)."""
    factory = lambda: BloomFilter(num_bits=num_bits, num_hashes=num_hashes)  # noqa: E731
    return sketch_global(df, col, factory, BloomFilter.from_bytes)


def bloom_states(
    df: DataFrame, col: str, group_cols: Sequence[str], num_bits: int = 1 << 20, num_hashes: int = 7
) -> DataFrame:
    factory = lambda: BloomFilter(num_bits=num_bits, num_hashes=num_hashes)  # noqa: E731
    return sketch_grouped(df, col, group_cols, factory, BloomFilter.from_bytes)


# ---------------------------------------------------------------- heavy hitters
def heavy_hitters_global(
    df: DataFrame, col: str, k: int = 64, phi: float = 0.01
):
    """Frequent items of ``col`` (driver-side dict key -> lower-bound count).
    Guaranteed superset of the true phi-heavy-hitters when phi > 1/(k+1)."""
    from ..core.heavyhitters import MisraGries

    sk = sketch_global(df, col, lambda: MisraGries(k=k), MisraGries.from_bytes)
    return sk.heavy_hitters(phi)


def heavy_hitters_grouped(
    df: DataFrame, col: str, group_cols: Sequence[str], k: int = 64, phi: float = 0.01
) -> DataFrame:
    """Per-group frequent items: DataFrame[group..., item, count_lo, err]."""
    from pyspark.sql.types import StringType, StructField, StructType

    from ..core.heavyhitters import MisraGries

    merged = sketch_grouped(df, col, group_cols, lambda: MisraGries(k=k),
                            MisraGries.from_bytes)
    group_fields = [f for f in merged.schema.fields if f.name in group_cols]
    schema = StructType(
        group_fields
        + [
            StructField("item", StringType(), True),
            StructField("count_lo", LongType(), False),
            StructField("err", LongType(), False),
        ]
    )

    def explode_hh(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = MisraGries.from_bytes(pdf["state"].iloc[0])
        key = tuple(pdf[g].iloc[0] for g in group_cols)
        hits = sk.heavy_hitters(phi)
        rows = [key + (str(item), int(c), int(sk.err)) for item, c in sorted(hits.items())]
        return pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return merged.groupBy(*group_cols).applyInPandas(explode_hh, schema=schema)


# ---------------------------------------------------------------- DDSketch
def dd_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    qs: Iterable[float] = (0.5, 0.9, 0.99, 0.999),
    alpha: float = 0.01,
    bound: int = 512,
    collapse_mode: str = "uniform",
    engine: str = "arrow",
) -> DataFrame:
    """Signed-value quantiles via the DDSketch pair (pos/neg stores + B*),
    any collapse flavor: "uniform" (gamma widens, alpha' grows),
    "ddog_low" / "ddog_high" (gamma fixed, edge bins fold into a trash bin).

    Output: DataFrame[group..., q, est, q0, q1, alpha_now] — [q0, q1] is the
    accurate-range window (trash-bin bookkeeping; (0, 1) for uniform mode)
    and alpha_now the post-collapse error bound, so callers can tell which
    estimates carry which guarantee.

    ``engine="jvm"``: Tungsten signed-histogram fill (bucket-identical to
    arrow at bound=0; ONE-SHOT bound fold otherwise — see
    agg.dd_sketch_global_jvm). The heavy per-row work never leaves the JVM.
    """
    from ..core.ddsketch import DDSketchPair

    factory = lambda: DDSketchPair(  # noqa: E731
        initial_alpha=alpha, m=bound, collapse_mode=collapse_mode
    )
    qs = [float(q) for q in qs]

    def rows_of(sk) -> list[tuple]:
        q0, q1 = sk.accurate_range()
        return [
            (q, float(sk.quantile(q)), float(q0), float(q1), float(sk.alpha))
            for q in qs
        ]

    if not group_cols:
        if engine == "jvm":
            from .agg import dd_sketch_global_jvm

            sk = dd_sketch_global_jvm(df, value_col, alpha, m=bound,
                                      collapse_mode=collapse_mode)
        else:
            sk = sketch_global(df, value_col, factory, DDSketchPair.from_bytes)
        return df.sparkSession.createDataFrame(
            rows_of(sk), "q double, est double, q0 double, q1 double, alpha_now double"
        )
    if engine == "jvm":
        from .agg import dd_states_grouped_jvm

        merged = dd_states_grouped_jvm(df, value_col, group_cols, alpha,
                                       m=bound, collapse_mode=collapse_mode)
    else:
        merged = sketch_grouped(df, value_col, group_cols, factory,
                                DDSketchPair.from_bytes)
    group_fields = [f for f in merged.schema.fields if f.name in group_cols]
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        group_fields
        + [
            StructField("q", DoubleType(), False),
            StructField("est", DoubleType(), True),
            StructField("q0", DoubleType(), False),
            StructField("q1", DoubleType(), False),
            StructField("alpha_now", DoubleType(), False),
        ]
    )

    def finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = DDSketchPair.from_bytes(pdf["state"].iloc[0])
        key = tuple(pdf[g].iloc[0] for g in group_cols)
        return pd.DataFrame(
            [key + r for r in rows_of(sk)], columns=[f.name for f in schema.fields]
        )

    return merged.groupBy(*group_cols).applyInPandas(finalize, schema=schema)


# ---------------------------------------------------------------- quantiles
def tdigest_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    qs: Iterable[float] = (0.5, 0.9, 0.99, 0.999),
    delta: float = 200.0,
) -> DataFrame:
    factory = lambda: TDigest(delta=delta)  # noqa: E731
    qs = list(qs)
    if group_cols:
        merged = sketch_grouped(df, value_col, group_cols, factory, TDigest.from_bytes)
        return quantile_table(merged, group_cols, qs, TDigest.from_bytes)
    sk = sketch_global(df, value_col, factory, TDigest.from_bytes)
    return df.sparkSession.createDataFrame(
        [(float(q), float(sk.quantile(q))) for q in qs], "q double, est double"
    )


def kll_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    qs: Iterable[float] = (0.5, 0.9, 0.99, 0.999),
    k: int = 200,
) -> DataFrame:
    factory = lambda: KLLSketch(k=k)  # noqa: E731
    qs = list(qs)
    if group_cols:
        merged = sketch_grouped(df, value_col, group_cols, factory, KLLSketch.from_bytes)
        return quantile_table(merged, group_cols, qs, KLLSketch.from_bytes)
    sk = sketch_global(df, value_col, factory, KLLSketch.from_bytes)
    return df.sparkSession.createDataFrame(
        [(float(q), float(sk.quantile(q))) for q in qs], "q double, est double"
    )
