"""Accuracy sweep: measured relative error vs the alpha bound, per
distribution — the reference's VALIDATE-mode CSV analog
(/root/reference/ParallelDDSketch/src/ParallelSketcher.cc:1048-1070).

For each (distribution, alpha, m): build the grouped sketch through the full
distributed pipeline at local[8], compare every quantile estimate against the
exact order statistic, report max relative error and the post-collapse alpha
it must not exceed. Writes BENCH/ACCURACY.md + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
QS = [0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999]


def main() -> None:
    from puddsketch_spark.core import UDDSketch
    from puddsketch_spark.spark.agg import sketch_global
    from puddsketch_spark.spark.session import get_spark

    spark = get_spark(app_name="accuracy", master="local[8]", shuffle_partitions=8)
    rows = []
    n = 500_000
    rng_specs = {
        "uniform(1,1000)": lambda g: g.uniform(1, 1000, n),
        "lognormal(5,1)": lambda g: g.lognormal(5, 1, n),
        "exponential(1)": lambda g: g.exponential(1.0, n) + 1e-12,
        "normal(30,10)+": lambda g: np.clip(g.normal(30, 10, n), 1e-3, None),
        # the reference's BETA mode (two-gamma construction,
        # ParallelDDSketch/src/ParallelSketcher.cc:358-366)
        "beta(2,5)": lambda g: g.beta(2, 5, n) + 1e-12,
    }
    for dist, gen in rng_specs.items():
        for seed in (0, 1):
            v = gen(np.random.default_rng(seed))
            sv = np.sort(v)
            # distributed path over 16 partitions
            rdd = spark.sparkContext.parallelize(v.tolist(), 16)
            sdf = rdd.map(lambda x: (x,)).toDF(["x"])
            for alpha, m in [(0.01, 200), (0.001, 2048)]:
                sk = sketch_global(
                    sdf, "x", lambda a=alpha, mm=m: UDDSketch(initial_alpha=a, m=mm),
                    UDDSketch.from_bytes,
                )
                errs = []
                for q in QS:
                    est = sk.quantile(q)
                    exact = sv[int(np.floor(q * (n - 1)))]
                    errs.append(abs(est - exact) / abs(exact))
                rows.append(
                    {
                        "dist": dist,
                        "seed": seed,
                        "alpha0": alpha,
                        "m": m,
                        "alpha_current": round(sk.alpha, 6),
                        "collapses": sk.num_collapses,
                        "max_rel_err": round(max(errs), 6),
                        "p99_rel_err": round(errs[QS.index(0.99)], 6),
                        "within_bound": bool(max(errs) <= sk.alpha + 1e-12),
                    }
                )
    # DDOG pair-collapse modes: accuracy holds INSIDE the reported
    # accurate_range window (the reference's q0/q1 bookkeeping,
    # ParallelSketcher.cc:920-1028); verify exactly that
    from puddsketch_spark.core import DDSketchPair

    ddog_rows = []
    for dist, gen in rng_specs.items():
        v = gen(np.random.default_rng(0))
        sv = np.sort(v)
        rdd = spark.sparkContext.parallelize(v.tolist(), 16)
        sdf = rdd.map(lambda x: (x,)).toDF(["x"])
        for mode in ("ddog_low", "ddog_high"):
            sk = sketch_global(
                sdf, "x",
                lambda md=mode: DDSketchPair(initial_alpha=0.01, m=256, collapse_mode=md),
                DDSketchPair.from_bytes,
            )
            q0, q1 = sk.accurate_range()
            inside = [q for q in QS if q0 <= q <= q1] or [q0 + 0.5 * (q1 - q0)]
            errs = []
            for q in inside:
                est = sk.quantile(q)
                exact = sv[int(np.floor(q * (n - 1)))]
                errs.append(abs(est - exact) / abs(exact))
            ddog_rows.append(
                {
                    "dist": dist,
                    "mode": mode,
                    "q0": round(q0, 4),
                    "q1": round(q1, 4),
                    "n_q_inside": len(inside),
                    "max_rel_err_inside": round(max(errs), 6),
                    "within_bound": bool(max(errs) <= sk.alpha + 1e-12),
                }
            )
    # rank/CDF accuracy: the bucket-granular inverse quantile's error at v
    # is bounded by the mass of v's boundary bucket (items within relative
    # gamma of v) — measure both sides of that inequality per distribution
    rank_rows = []
    for dist, gen in rng_specs.items():
        v = gen(np.random.default_rng(0))
        sv = np.sort(v)
        rdd = spark.sparkContext.parallelize(v.tolist(), 16)
        sdf = rdd.map(lambda x: (x,)).toDF(["x"])
        sk = sketch_global(
            sdf, "x", lambda: UDDSketch(initial_alpha=0.01, m=200),
            UDDSketch.from_bytes,
        )
        g = sk.gamma
        errs, bounds = [], []
        for q in QS:
            probe = float(sv[int(np.floor(q * (n - 1)))])
            emp = float((v <= probe).sum()) / n
            errs.append(abs(sk.cdf(probe) - emp))
            bounds.append(float(((v > probe / g) & (v <= probe * g)).sum()) / n)
        rank_rows.append(
            {
                "dist": dist,
                "max_cdf_err": round(max(errs), 6),
                "max_bucket_mass": round(max(bounds), 6),
                "within_bound": bool(
                    all(e <= b + 1e-12 for e, b in zip(errs, bounds))
                ),
            }
        )
    spark.stop()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ACCURACY.md"), "w") as f:
        f.write(
            "# ACCURACY — measured relative error vs the alpha bound\n\n"
            "Distributed UDDSketch (16 partitions, treeReduce merge) vs exact\n"
            "order statistics, 500k values, quantiles "
            f"{QS}.\nBound: post-collapse alpha (VALIDATE-mode semantics).\n\n"
            "| dist | seed | alpha0 | m | alpha_now | collapses | max rel err | p99 rel err | within bound |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['dist']} | {r['seed']} | {r['alpha0']} | {r['m']} | "
                f"{r['alpha_current']} | {r['collapses']} | {r['max_rel_err']} | "
                f"{r['p99_rel_err']} | {'YES' if r['within_bound'] else 'NO'} |\n"
            )
        f.write(
            "\n## DDOG pair-collapse modes (alpha=0.01, bound=256, seed 0)\n\n"
            "Accuracy is guaranteed only inside the reported accurate-range\n"
            "window [q0, q1] (trash-bin semantics); measured there:\n\n"
            "| dist | mode | q0 | q1 | #q inside | max rel err inside | within bound |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for r in ddog_rows:
            f.write(
                f"| {r['dist']} | {r['mode']} | {r['q0']} | {r['q1']} | "
                f"{r['n_q_inside']} | {r['max_rel_err_inside']} | "
                f"{'YES' if r['within_bound'] else 'NO'} |\n"
            )
        f.write(
            "\n## Inverse quantile (rank/CDF, alpha=0.01, m=200, seed 0)\n\n"
            "rank_of is bucket-granular: its CDF error at v is bounded by the\n"
            "mass of v's boundary bucket (items within relative gamma of v).\n"
            "Measured at the exact quantile points of each distribution:\n\n"
            "| dist | max |cdf - empirical| | max bucket mass (bound) | within bound |\n"
            "|---|---|---|---|\n"
        )
        for r in rank_rows:
            f.write(
                f"| {r['dist']} | {r['max_cdf_err']} | {r['max_bucket_mass']} | "
                f"{'YES' if r['within_bound'] else 'NO'} |\n"
            )
    all_ok = all(r["within_bound"] for r in rows + ddog_rows + rank_rows)
    print(json.dumps({"metric": "accuracy within alpha", "all_within_bound": all_ok,
                      "cases": len(rows) + len(ddog_rows) + len(rank_rows)}))


if __name__ == "__main__":
    main()
