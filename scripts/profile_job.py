"""spark-submit entry point: SUMMARIZE-style table profile.

    spark-submit --py-files puddsketch_spark.zip scripts/profile_job.py \
        --input s3://bucket/table [--columns a b c] [--output out_dir]

One JSON line per column (or a parquet table with --output): count, nulls,
theta distinct estimate (+ exact-mode flag), moments (mean/stddev/min/max),
UDD quartiles + p99, Misra-Gries top value. Constant job count regardless
of column count — see puddsketch_spark/ops/profile.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="sketch-family table profiler")
    p.add_argument("--input", required=True, help="parquet path of the table")
    p.add_argument("--columns", nargs="*", default=None,
                   help="columns to profile (default: all)")
    p.add_argument("--theta-k", type=int, default=4096,
                   help="theta sketch size (distinct estimates exact below k)")
    p.add_argument("--output", help="parquet dir for the profile (default: stdout)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from puddsketch_spark.ops.profile import profile_table
    from puddsketch_spark.spark.session import get_spark

    spark = get_spark(app_name="profile_job", master=args.master)
    t0 = time.time()
    df = spark.read.parquet(args.input)
    prof = profile_table(df, args.columns, theta_k=args.theta_k)
    if args.output:
        prof.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    else:
        rows = prof.collect()
        n = len(rows)
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
    print(json.dumps({"columns": n, "wall_sec": round(time.time() - t0, 2)}),
          file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
