"""spark-submit entry point: run an arbitrary SQL query with every sketch
function pre-registered (spark/sqlfns.py) — the analyst surface: write
sketch SQL, point it at tables, get parquet or stdout.

Usage (cluster):
    spark-submit --py-files puddsketch_spark.zip scripts/sql_job.py \
        --view transcripts=s3://bucket/transcripts \
        --sql "SELECT role, udds_quantile(udds_sketch(text_len), 0.99D) AS p99
               FROM transcripts GROUP BY role" \
        --alpha 0.005 --output s3://bucket/out/p99

Usage (local smoke):
    python scripts/sql_job.py --view t=/root/testdata/sf0.001/lineitem.parquet \
        --sql "SELECT udds_quantile(udds_sketch(l_extendedprice), 0.5D) FROM t"

--sql-file reads the statement from a file (one statement). Multiple
--view flags register multiple parquet paths as temp views. The sketch
config (--alpha/--max-buckets/--hll-p/--theta-k/--tdigest-delta/--dd-m)
binds to the registered functions exactly as register_sql_functions
documents; state tables written by one run (any query SELECTing a
``*_sketch`` column into --output) are readable by the next run's
``*_merge`` — the fill-once / regroup-forever contract in CLI form.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="run sketch SQL with puddsketch functions registered")
    q = p.add_mutually_exclusive_group(required=True)
    q.add_argument("--sql", help="SQL statement to run")
    q.add_argument("--sql-file", help="file containing the SQL statement")
    p.add_argument("--view", action="append", default=[],
                   metavar="NAME=PATH",
                   help="register PATH (parquet) as temp view NAME; repeatable")
    p.add_argument("--alpha", type=float, default=0.01)
    p.add_argument("--max-buckets", type=int, default=200,
                   help="UDD collapse bound m (0 = unbounded)")
    p.add_argument("--dd-m", type=int, default=500)
    p.add_argument("--hll-p", type=int, default=14)
    p.add_argument("--theta-k", type=int, default=4096)
    p.add_argument("--tdigest-delta", type=int, default=200)
    p.add_argument("--prefix", default="",
                   help="function-name prefix (second config side by side)")
    p.add_argument("--output", help="parquet dir for the result (default: stdout)")
    p.add_argument("--show-plan", action="store_true",
                   help="print the formatted physical plan to stderr")
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    t0 = time.time()
    sql = args.sql
    if args.sql_file:
        with open(args.sql_file) as f:
            sql = f.read()

    from puddsketch_spark.spark.session import get_spark
    from puddsketch_spark.spark.sqlfns import register_sql_functions

    spark = get_spark(app_name="sql_job", master=args.master)
    try:
        register_sql_functions(
            spark, prefix=args.prefix, alpha=args.alpha, m=args.max_buckets,
            dd_m=args.dd_m, hll_p=args.hll_p, theta_k=args.theta_k,
            tdigest_delta=args.tdigest_delta)
        for spec in args.view:
            name, _, path = spec.partition("=")
            if not name or not path:
                raise SystemExit(f"--view wants NAME=PATH, got {spec!r}")
            spark.read.parquet(path).createOrReplaceTempView(name)

        out = spark.sql(sql)
        if args.show_plan:
            out.explain("formatted")
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            n = spark.read.parquet(args.output).count()
        else:
            rows = out.collect()
            n = len(rows)
            for r in rows:
                print(json.dumps(r.asDict(), default=repr))
        print(json.dumps({"rows": n, "wall_sec": round(time.time() - t0, 2)}),
              file=sys.stderr)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
