"""Deterministic synthetic transcript tables (shape from BASELINE.json input_hint).

Schema: conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp. Everything derives from xxhash64(seed, conv, turn) — fully
deterministic, order-independent, and generated with Catalyst expressions
only (no Python in the row path), so a 10M-turn bench table materializes at
JVM speed and the same recipe would scale out on a real cluster.

Mirrors the reference's seeded per-rank generation discipline
(/root/reference/psketches/pudds.cpp:118-134): distributions uniform(1,1000)
and lognormal(5,1) for text length, exponential(1) inter-turn latency, and
beta via the reference's two-gamma construction Z = X/(X+Y) with
X~Gamma(a,1), Y~Gamma(b,1)
(/root/reference/ParallelDDSketch/src/ParallelSketcher.cc:358-366) — here
with integer shapes so Gamma(k,1) = -log(prod of k uniforms) stays a closed
Catalyst expression (no rejection sampling in the row path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

__all__ = ["embeddings_table", "transcripts"]


def embeddings_table(
    spark: SparkSession,
    n: int = 1_000,
    dim: int = 64,
    seed: int = 42,
    n_dupes: int = 0,
) -> DataFrame:
    """Deterministic synthetic unit-norm embeddings for similarity/ANN tests
    and high-dim benchmarks: (vec_id long, embedding array<float>).

    Each row derives from default_rng([seed, vec_id]) inside mapInPandas over
    spark.range — identical under any partitioning. The last ``n_dupes`` ids
    (n..n+n_dupes-1) are exact copies of ids 0..n_dupes-1, giving a known
    near-dup pair set for recall checks.
    """
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    import numpy as np
    import pandas as pd

    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType(), False), False),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                base = int(i) if i < n else int(i) - n
                rng = np.random.default_rng([seed, base])
                v = rng.standard_normal(dim)
                vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    rng_df = spark.range(0, n + n_dupes, 1, spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=schema)

_TWO32 = float(2**32)


def _u01(*cols):
    """Deterministic uniform(0,1) from column content (never exactly 0 or 1)."""
    h = F.xxhash64(*cols)
    return (F.pmod(h, F.lit(2**32)).cast("double") + 0.5) / F.lit(_TWO32)


def transcripts(
    spark: SparkSession,
    n_conv: int = 1_000,
    avg_turns: int = 8,
    seed: int = 42,
    length_dist: str = "uniform",  # uniform(1,1000) | lognormal(5,1) | beta(2,5)*999+1
    skew: str | None = None,  # None -> ~uniform conv sizes; "zipf" -> pareto-tailed
    partitions: int | None = None,
    with_text: bool = True,  # False: emit text_len (double) instead of the
    # text bytes — length(text) == text_len by construction (rpad truncates),
    # so sketch benchmarks skip materializing ~500B/row of padding
) -> DataFrame:
    conv = spark.range(0, n_conv, 1, partitions or spark.sparkContext.defaultParallelism)
    u_sz = _u01(F.col("id"), F.lit(seed), F.lit("size"))
    if skew == "zipf":
        # pareto(a=1.2): heavy upper tail -> a few hot conversations
        n_turns = F.least(
            F.lit(avg_turns * 200),
            (F.pow(u_sz, F.lit(-1.0 / 1.2))).cast("int"),
        )
    else:
        n_turns = (F.lit(1) + (u_sz * F.lit(2 * avg_turns - 1)).cast("int"))
    df = (
        conv.withColumn("n_turns", F.greatest(F.lit(1), n_turns))
        .select(
            F.col("id").alias("conv"),
            F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
        )
    )
    u_role = _u01(F.col("conv"), F.col("turn_idx"), F.lit(seed), F.lit("role"))
    role = (
        F.when(u_role < 0.40, "user")
        .when(u_role < 0.80, "assistant")
        .when(u_role < 0.85, "system")
        .otherwise("tool")
    )
    u_tool = _u01(F.col("conv"), F.col("turn_idx"), F.lit(seed), F.lit("tool"))
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("python"), F.lit("browser"), F.lit("editor")),
            (u_tool * 4).cast("int") + 1,
        ),
    )
    u1 = _u01(F.col("conv"), F.col("turn_idx"), F.lit(seed), F.lit("len1"))
    u2 = _u01(F.col("conv"), F.col("turn_idx"), F.lit(seed), F.lit("len2"))
    if length_dist == "uniform":
        text_len = (F.lit(1) + (u1 * F.lit(999)).cast("int")).cast("int")
    elif length_dist == "lognormal":
        # Box-Muller from two deterministic uniforms
        z = F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2.0 * 3.141592653589793) * u2)
        text_len = F.greatest(F.lit(1), F.exp(F.lit(5.0) + z).cast("int"))
    elif length_dist == "beta":
        # reference two-gamma construction, integer shapes a=2, b=5:
        # Gamma(k,1) = sum of k iid Exp(1) = -log(u_1 * ... * u_k)
        a, b = 2, 5
        ug = [
            _u01(F.col("conv"), F.col("turn_idx"), F.lit(seed), F.lit(f"g{i}"))
            for i in range(a + b)
        ]
        gx = -sum((F.log(u) for u in ug[:a]), F.lit(0.0))
        gy = -sum((F.log(u) for u in ug[a:]), F.lit(0.0))
        z = gx / (gx + gy)  # ~ Beta(2, 5) on (0, 1)
        text_len = (F.lit(1) + (z * F.lit(999)).cast("int")).cast("int")
    else:
        raise ValueError(f"unknown length_dist {length_dist!r}")
    # inter-turn latency ~ exponential(1.0) seconds (reference dist set)
    u_lat = _u01(F.col("conv"), F.col("turn_idx"), F.lit(seed), F.lit("lat"))
    lat_us = (-F.log(u_lat) * F.lit(1e6)).cast("long")
    w = Window.partitionBy("conv").orderBy("turn_idx")
    ts = F.timestamp_micros(
        F.unix_micros(F.lit("2026-01-01 00:00:00").cast("timestamp"))
        + F.col("conv") * F.lit(60_000_000)
        + F.sum(lat_us).over(w)
    )
    conv_id = F.format_string("c%08d", F.col("conv"))
    if not with_text:
        return df.select(
            conv_id.alias("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            role.alias("role"),
            text_len.cast("double").alias("text_len"),
            tool.alias("tool"),
            ts.alias("ts"),
        )
    prefix = F.concat_ws(":", role, conv_id, F.col("turn_idx").cast("string"), F.lit(""))
    text = F.rpad(prefix, text_len, "x")
    return df.select(
        conv_id.alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
