"""Dataset snapshot diffing from sketches — the monitoring composition.

``dataset_diff`` compares two snapshots of a table (yesterday's build vs
today's, two pipeline versions, two time windows) WITHOUT joining or
rescanning either side more than once:

  * identity churn: theta sketches over the id column give kept / added /
    removed cardinality estimates (exact below k) via set algebra;
  * value drift: one quantile sketch per numeric column per side gives the
    KS statistic (sup |cdf gap| over bucket boundaries). The default UDD
    kernel is POSITIVE-DOMAIN: every negative value collapses into the zero
    bucket, so drift happening within negative values is invisible to it —
    pass ``signed=True`` to fill signed DDSketch pairs instead, whose KS
    sees the whole real line (at the cost of the SQL-replayable oracle);
  * moment shift: one moments sketch per column per side gives
    mean/stddev deltas.

Each side is scanned once per sketch family (stacked fills); the
comparison itself touches only KB-scale sketch states — at 100 TB the
diff costs two scans, not a join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["dataset_diff"]


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    value_cols: Sequence[str],
    alpha: float = 0.005,
    theta_k: int = 4096,
    signed: bool = False,
) -> dict:
    """{"ids": {...churn estimates...},
        "columns": {col: {n_old, n_new, mean_old, mean_new, mean_delta,
                          stddev_old, stddev_new, ks}, ...}}.

    Cardinalities are theta estimates (exact when a side's id cardinality
    sits below ``theta_k``); ks/mean/stddev come from quantile and moments
    sketches filled once per side. ``signed=False`` (default) uses the
    positive-domain UDD kernel — bit-exactly SQL-replayable, but BLIND to
    drift inside negative values (they all land in one zero bucket);
    ``signed=True`` uses DDSketch pairs so the KS covers the full real
    line for columns that go negative.
    """
    from ..core.ddsketch import DDSketchPair
    from ..core.theta import ThetaSketch
    from ..core.uddsketch import UDDSketch
    from ..spark.agg import sketch_global, sketch_grouped
    from .profile import _stack, fused_moments_quantile

    if signed:
        q_factory = lambda: DDSketchPair(initial_alpha=alpha, m=0)  # noqa: E731
        q_from_bytes = DDSketchPair.from_bytes
    else:
        q_factory = lambda: UDDSketch(initial_alpha=alpha, m=0)  # noqa: E731
        q_from_bytes = UDDSketch.from_bytes
    # moments + quantile sketch fill in ONE fused stacked pass per side
    # (the same composite kernel profile_table uses), keeping the module
    # contract — "the diff costs two scans" — literal: theta + fused
    factory, from_bytes = fused_moments_quantile(q_factory, q_from_bytes)

    def stacked(df: DataFrame) -> DataFrame:
        return _stack(df, value_cols, lambda c: F.col(c).cast("double"))

    def fills(df: DataFrame):
        th = sketch_global(
            df, id_col, lambda: ThetaSketch(k=theta_k), ThetaSketch.from_bytes
        )
        mom, udd = {}, {}
        for r in sketch_grouped(
            stacked(df), "v", ["feature"], factory, from_bytes
        ).collect():
            fused = from_bytes(r["state"])
            mom[r["feature"]] = fused.moments
            udd[r["feature"]] = fused.q
        return th, mom, udd

    th_o, mom_o, udd_o = fills(old)
    th_n, mom_n, udd_n = fills(new)

    ids = {
        "old": th_o.estimate(),
        "new": th_n.estimate(),
        "kept": ThetaSketch.intersect(th_o, th_n).estimate(),
        "added": ThetaSketch.a_not_b(th_n, th_o).estimate(),
        "removed": ThetaSketch.a_not_b(th_o, th_n).estimate(),
        "exact_mode": th_o.is_exact and th_n.is_exact,
    }
    columns = {}
    for c in value_cols:
        mo, mn = mom_o.get(c), mom_n.get(c)
        uo, un = udd_o.get(c), udd_n.get(c)
        columns[c] = {
            "n_old": int(mo.n) if mo else 0,
            "n_new": int(mn.n) if mn else 0,
            "mean_old": float(mo.mean) if mo and mo.n else None,
            "mean_new": float(mn.mean) if mn and mn.n else None,
            "mean_delta": (
                float(mn.mean - mo.mean) if mo and mn and mo.n and mn.n else None
            ),
            "stddev_old": float(mo.stddev()) if mo and mo.n else None,
            "stddev_new": float(mn.stddev()) if mn and mn.n else None,
            "ks": (
                float(uo.ks_distance(un))
                if uo is not None and un is not None and uo.count and un.count
                else None
            ),
        }
    return {"ids": ids, "columns": columns}
