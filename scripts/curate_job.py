"""spark-submit entry point: end-to-end document-curation job.

Runs the full curation composition (ops/pipeline.py) over a document table
— exact + fuzzy dedup, optional corpus line-dedup, optional benchmark
decontamination, quality filter, optional PII redaction — plus the
standalone stages the pipeline does not fold in: incremental dedup against
an existing corpus (--against) and semantic dedup over an embedding table
(--embeddings). Writes the curated table as parquet and prints one JSON
stats line.

Usage (cluster):
    spark-submit --py-files puddsketch_spark.zip scripts/curate_job.py \
        --input s3://bucket/docs --output s3://bucket/curated \
        --fuzzy --line-dedup-max-df 100 \
        --benchmark s3://bucket/benchmarks --redact \
        --against s3://bucket/existing-corpus \
        --cap-per-source 100000 --balance-output 4096

Usage (local smoke):
    python scripts/curate_job.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated --redact
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="puddsketch_spark curation job")
    p.add_argument("--input", required=True, help="parquet path of the document table")
    p.add_argument("--output", required=True, help="parquet path for the curated table")
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--quality-threshold", type=float, default=0.5)
    p.add_argument("--fuzzy", action="store_true", help="minhash/LSH near-dup stage")
    p.add_argument("--num-perm", type=int, default=64)
    p.add_argument("--bands", type=int, default=8)
    p.add_argument("--jaccard-threshold", type=float, default=0.9)
    p.add_argument("--line-dedup-max-df", type=int, default=None,
                   help="strip lines occurring in more than this many docs")
    p.add_argument("--benchmark", default=None,
                   help="parquet path of benchmark texts to decontaminate against")
    p.add_argument("--decontam-n", type=int, default=8)
    p.add_argument("--redact", action="store_true", help="PII-mask surviving text")
    p.add_argument("--pii-kinds", nargs="*", default=None)
    p.add_argument("--against", default=None,
                   help="parquet path of an existing corpus; drop new docs whose "
                        "text already appears there (Bloom + exact verify)")
    p.add_argument("--against-fpr", type=float, default=1e-3)
    p.add_argument("--embeddings", default=None,
                   help="parquet path of (id, embedding) rows; docs flagged "
                        "as semantic DUPLICATES are dropped (docs with no "
                        "embedding row are untouched)")
    p.add_argument("--emb-id-col", default="vec_id")
    p.add_argument("--emb-vec-col", default="embedding")
    p.add_argument("--semantic-threshold", type=float, default=0.9)
    p.add_argument("--semantic-engine", choices=["exact", "ivf"], default="ivf")
    p.add_argument("--cap-per-source", type=int, default=None, metavar="K",
                   help="keep at most K surviving docs per --cap-group-col "
                        "(ranked by --cap-order-col desc, id tiebreak; "
                        "skew-safe salted top-k)")
    p.add_argument("--cap-group-col", default="source")
    p.add_argument("--cap-order-col", default="quality")
    p.add_argument("--cap-salt-buckets", type=int, default=16)
    p.add_argument("--balance-output", type=int, default=None, metavar="P",
                   help="range-repartition the output into P equal-frequency "
                        "buckets of text length before writing (one sketch "
                        "pass picks deterministic bounds; evens out the "
                        "output file sizes a dedup-heavy pipeline skews)")
    p.add_argument("--shuffle-output", type=int, default=None, metavar="SEED",
                   help="write rows in a deterministic pseudo-random order "
                        "(seeded xxhash64 of the id — reproducible training "
                        "order, unlike rand()); mutually exclusive with "
                        "--balance-output")
    p.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.shuffle_output is not None and args.balance_output:
        raise SystemExit("--shuffle-output and --balance-output are mutually "
                         "exclusive (a random order and a length-range "
                         "layout cannot both hold)")
    from puddsketch_spark.ops.pipeline import curate_documents
    from puddsketch_spark.spark.session import get_spark

    spark = get_spark(app_name="curate_job", master=f"local[{args.cpus}]"
                      if not os.environ.get("SPARK_GRAFT_CLUSTER") else None)
    t0 = time.time()
    df = spark.read.parquet(args.input)
    stats: dict = {}

    if args.against:
        from puddsketch_spark.ops.dedup import dedup_against_corpus

        corpus = spark.read.parquet(args.against)
        before = df.count()
        df = dedup_against_corpus(df, corpus, text_col=args.text_col,
                                  fpr=args.against_fpr)
        stats["n_input_batch"] = before
        stats["n_after_incremental"] = df.count()

    benchmark = spark.read.parquet(args.benchmark) if args.benchmark else None
    curated, pstats = curate_documents(
        df,
        text_col=args.text_col,
        id_col=args.id_col,
        quality_threshold=args.quality_threshold,
        fuzzy=args.fuzzy,
        num_perm=args.num_perm,
        bands=args.bands,
        jaccard_threshold=args.jaccard_threshold,
        line_dedup_max_df=args.line_dedup_max_df,
        benchmark=benchmark,
        decontam_n=args.decontam_n,
        redact=args.redact,
        pii_kinds=args.pii_kinds,
    )
    stats.update(pstats)

    # every post-pipeline stage below ACTIONS `curated` before the write
    # actions it again (the semantic stage's count, the cap's count, the
    # balance sketch pass) — without a persist HERE, each action re-executes
    # the whole dedup/quality/redact lineage, multiplying job cost at corpus
    # scale (ADVICE r5: the persist used to sit below the semantic stage, so
    # --embeddings plus --cap-per-source/--balance-output re-ran curation
    # once more than intended)
    cached = None
    if args.embeddings or args.cap_per_source or args.balance_output:
        cached = curated.persist()
        curated = cached

    if args.embeddings:
        from pyspark.sql import functions as F

        from puddsketch_spark.ops.similarity import semantic_dedup

        emb = spark.read.parquet(args.embeddings)
        for col in (args.emb_id_col, args.emb_vec_col):
            if col not in emb.columns:
                raise SystemExit(
                    f"--embeddings table has no column {col!r} "
                    f"(columns: {emb.columns}); set --emb-id-col/--emb-vec-col"
                )
        # drop only docs FLAGGED as semantic duplicates — a doc with no
        # embedding row is not a duplicate (embedding pipelines routinely
        # lag ingestion) and must survive, so the join removes the
        # (emb ids - survivors) set rather than semi-joining on survivors
        survivors = semantic_dedup(
            emb, id_col=args.emb_id_col, vec_col=args.emb_vec_col,
            threshold=args.semantic_threshold, engine=args.semantic_engine,
        )
        dropped = emb.select(args.emb_id_col).join(
            survivors.select(args.emb_id_col), args.emb_id_col, "left_anti"
        ).select(F.col(args.emb_id_col).alias(args.id_col))
        curated = curated.join(dropped, args.id_col, "left_anti")
        stats["n_after_semantic"] = curated.count()

    if args.cap_per_source:
        from pyspark.sql import functions as F

        from puddsketch_spark.ops.quota import cap_per_group

        for col in (args.cap_group_col, args.cap_order_col):
            if col not in curated.columns:
                raise SystemExit(
                    f"--cap-per-source needs column {col!r} in the curated "
                    f"table (columns: {curated.columns}); set "
                    "--cap-group-col/--cap-order-col"
                )
        curated = cap_per_group(
            curated, [args.cap_group_col], args.cap_per_source,
            [F.col(args.cap_order_col).desc(), args.id_col],
            salt_buckets=args.cap_salt_buckets,
        )
        stats["n_after_source_cap"] = curated.count()

    if args.balance_output:
        from pyspark.sql import functions as F

        from puddsketch_spark.spark.partitioning import range_repartition

        curated = range_repartition(
            curated.withColumn("_len", F.length(args.text_col)),
            "_len", args.balance_output,
        ).drop("_len")
        stats["balance_output_buckets"] = args.balance_output
    if args.shuffle_output is not None:
        from puddsketch_spark.ops.quota import deterministic_shuffle

        curated = deterministic_shuffle(curated, [args.id_col],
                                        seed=args.shuffle_output)
        stats["shuffle_seed"] = args.shuffle_output
    curated.write.mode("overwrite").parquet(args.output)
    if cached is not None:
        cached.unpersist()
    stats["wall_sec"] = round(time.time() - t0, 3)
    stats["output"] = args.output
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
