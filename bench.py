"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total query wall time", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <dir>, plus sketch throughput +
   scaling info when SPARK_GRAFT_SCALING=1}

Throughput protocol mirrors the reference (updates/s over fill+merge,
/root/reference/ParallelDDSketch/src/ParallelSketcher.cc:870-879): the
`udds_transcripts` entry sketches a generated transcript table and reports
turns/sec in the side metrics.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run_bench(sf_dir: str, cpus: str, n_turn_target: int = 2_000_000) -> dict:
    from puddsketch_spark.core import UDDSketch
    from puddsketch_spark.datagen import transcripts
    from puddsketch_spark.spark.agg import (
        quantile_table,
        sketch_grouped,
        sketch_grouped_jvm,
    )
    from puddsketch_spark.spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name=f"bench[{cpus}]", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) if str(cpus).isdigit() else 32)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    qs = entry.queries()
    # untimed warmup: spins up codegen + the python worker pool so the first
    # timed query doesn't absorb session startup
    qs["q1_pricing_summary"](spark, sf_dir).count()
    qs["udds_quantile_by_flag"](spark, sf_dir).count()
    for name in [
        "q1_pricing_summary",
        "q3_top_revenue_orders",
        "udds_quantile_global",
        "udds_quantile_by_flag",
        "ddsketch_signed_quantiles",
        "events_gap_quantile",
        "dedup_exact_documents",
        "minhash_selfdup_recall",
        "cosine_topk_embeddings",
        "doc_token_stats",
        "ddsketch_ddog_quantiles",
        "heavy_hitters_custkeys",
        "multimodal_pipeline_stats",
    ]:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count() if hasattr(df, "count") else len(df)
        timings[name] = round(time.time() - t0, 3)
        assert n >= 0

    # sketch throughput on the north_rule transcript shape: generate (timed
    # separately), then fill+merge, report turns/sec over the sketch phase
    # for both engines (jvm = flagship Tungsten fill; arrow = generic path)
    n_conv = max(1, n_turn_target // 8)
    t0 = time.time()
    t = transcripts(spark, n_conv=n_conv, avg_turns=8, seed=42, with_text=False)
    # north_star shape: quantiles grouped by role AND tool
    t = t.select("role", "tool", "text_len").persist()
    n_turns = t.count()
    gen_s = time.time() - t0

    t0 = time.time()
    merged = sketch_grouped_jvm(t, "text_len", ["role", "tool"], 0.01, 200)
    quantile_table(merged, ["role", "tool"], [0.5, 0.9, 0.99, 0.999],
                   UDDSketch.from_bytes).collect()
    jvm_s = time.time() - t0
    timings["udds_transcripts_grouped_jvm"] = round(jvm_s, 3)

    t0 = time.time()
    merged = sketch_grouped(
        t, "text_len", ["role", "tool"],
        lambda: UDDSketch(initial_alpha=0.01, m=200), UDDSketch.from_bytes,
    )
    quantile_table(merged, ["role", "tool"], [0.5, 0.9, 0.99, 0.999],
                   UDDSketch.from_bytes).collect()
    arrow_s = time.time() - t0
    t.unpersist()
    timings["udds_transcripts_grouped_arrow"] = round(arrow_s, 3)
    extras["transcript_turns"] = n_turns
    extras["transcript_gen_sec"] = round(gen_s, 3)
    extras["sketch_throughput_turns_per_sec_jvm"] = round(n_turns / jvm_s, 1)
    extras["sketch_throughput_turns_per_sec_arrow"] = round(n_turns / arrow_s, 1)

    # high-dim embedding audit: dim-768 hyperplane-LSH near-dups via the
    # Arrow matmul engine (no catalyst literal blowup); planted exact dupes
    # give a known recall target
    from puddsketch_spark.datagen import embeddings_table
    from puddsketch_spark.ops.dedup import embedding_near_dups, release_cached

    emb768 = embeddings_table(spark, n=8_000, dim=768, seed=5, n_dupes=100).persist()
    emb768.count()
    # 16 planes/band: 8-bit bands collide randomly at 0.5^8 and the exact-
    # cosine verify on ~500k junk candidates dominates; 16 bits cuts random
    # collisions ~256x while keeping >0.9 recall at cosine 0.99
    t0 = time.time()
    pairs = embedding_near_dups(
        emb768, threshold=0.99, num_bands=4, planes_per_band=16, engine="auto"
    )
    n_pairs = pairs.count()
    timings["embedding_near_dups_dim768"] = round(time.time() - t0, 3)
    release_cached(pairs)
    emb768.unpersist()
    extras["dim768_near_dup_pairs"] = n_pairs
    assert n_pairs >= 100  # the planted duplicates must all surface

    spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline query wall time (sum)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": cpus,
        **extras,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
