"""Per-query isolation harness for the r7 optimization round (guide §1.4).

NOT the driver's bench: bench.py stays frozen. This file exists to time a
single declared query (or a comma list) in isolation with repeats, optional
.explain("formatted") capture, and the same session/shuffle settings the
frozen bench uses, so before/after numbers in OPTIMIZATION_r07.md are
apples-to-apples.

Usage:
  python bench_extra.py q1_pricing_summary,decontam_docs [--repeats 5]
      [--sf /root/testdata/sf1.0] [--explain plans/r07/decontam_before.txt]
"""

from __future__ import annotations

import argparse
import os
import statistics
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated query names, or 'all'")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None,
                    help="write .explain('formatted') of each query here "
                         "(suffix _<name>.txt when several)")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from puddsketch_spark.spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(app_name="bench_extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    qs = entry.queries()
    names = sorted(qs) if args.names == "all" else args.names.split(",")
    # same warmup the frozen bench does
    qs["q1_pricing_summary"](spark, args.sf).count()
    qs["udds_quantile_by_flag"](spark, args.sf).count()
    for name in names:
        fn = qs[name]
        if args.explain:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = (args.explain if len(names) == 1
                    else f"{args.explain}_{name}.txt")
            with open(path, "w") as f:
                f.write(plan)
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        print(f"{name}: median={statistics.median(samples):.3f} "
              f"min={samples[0]:.3f} max={samples[-1]:.3f} "
              f"samples={[round(s, 3) for s in samples]}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
