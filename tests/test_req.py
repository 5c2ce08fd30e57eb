"""REQ-style sketch: high-rank accuracy sharper than uniform, mergeable."""

import numpy as np
import pytest

from puddsketch_spark.core.req import REQSketch
from puddsketch_spark.sources import TRANSCRIPT_SCHEMA, read_transcripts


@pytest.mark.parametrize("seed", [0, 1])
def test_req_high_rank_accuracy(seed):
    rng = np.random.default_rng(seed)
    n = 200_000
    v = rng.lognormal(5, 1, n)
    sk = REQSketch(k=64)
    for chunk in np.array_split(v, 20):
        sk.update(chunk)
    assert sk.n == n
    sv = np.sort(v)
    for q in [0.9, 0.99, 0.999, 0.9999]:
        est = sk.quantile(q)
        r = np.searchsorted(sv, est) / n
        # HRA: rank error shrinks with (1-q)
        assert abs(r - q) <= 0.35 * (1 - q) + 2e-5, (q, r)
    # top retained items are exact: the max is always exact
    assert sk.quantile(1.0) == sv[-1]


def test_req_beats_kll_at_extreme_tail():
    from puddsketch_spark.core import KLLSketch

    rng = np.random.default_rng(2)
    v = rng.exponential(10, 300_000)
    req = REQSketch(k=64).update(v)
    kll = KLLSketch(k=512).update(v)
    # REQ spends ~2x the items of KLL(512) and buys ~20x sharper p9995
    assert req.num_buckets <= 2.5 * kll.num_buckets
    sv = np.sort(v)
    q = 0.9995
    r_req = abs(np.searchsorted(sv, req.quantile(q)) / len(v) - q)
    r_kll = abs(np.searchsorted(sv, kll.quantile(q)) / len(v) - q)
    assert r_req <= r_kll + 1e-6


def test_req_merge_and_serde():
    rng = np.random.default_rng(3)
    parts = [REQSketch(k=64).update(rng.uniform(0, 1, 50_000)) for _ in range(4)]
    merged = REQSketch.from_bytes(parts[0].to_bytes())
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == 200_000
    for q in [0.9, 0.99]:
        assert abs(merged.quantile(q) - q) <= 0.05 * (1 - q) + 0.005
    rt = REQSketch.from_bytes(merged.to_bytes())
    assert rt.same_buckets(merged) and rt.n == merged.n


def test_req_param_mismatch():
    with pytest.raises(ValueError, match="parameter mismatch"):
        REQSketch(k=32).merge(REQSketch(k=64))


# ---------------------------------------------------------------- LRA
# Low-Rank-Accuracy flavor (reference: DataSketches req_sketch.hpp HRA/LRA
# template flag): compaction protects the BOTTOM half, so rank error at
# quantile q shrinks proportionally to q — sharp p001/p0001 (e.g. fastest
# responses, smallest documents).


@pytest.mark.parametrize("seed", [0, 1])
def test_req_low_rank_accuracy(seed):
    rng = np.random.default_rng(seed)
    n = 200_000
    v = rng.lognormal(5, 1, n)
    sk = REQSketch(k=64, hra=False)
    for chunk in np.array_split(v, 20):
        sk.update(chunk)
    assert sk.n == n
    sv = np.sort(v)
    for q in [0.1, 0.01, 0.001, 0.0001]:
        est = sk.quantile(q)
        r = np.searchsorted(sv, est) / n
        # LRA: rank error shrinks with q (mirror of the HRA bound)
        assert abs(r - q) <= 0.35 * q + 2e-5, (q, r)
    # the bottom retained items are exact: the min is always exact
    assert sk.quantile(0.0) == sv[0]


def test_req_lra_beats_hra_at_low_tail():
    rng = np.random.default_rng(5)
    v = rng.exponential(10, 300_000)
    lra = REQSketch(k=64, hra=False).update(v)
    hra = REQSketch(k=64, hra=True).update(v)
    sv = np.sort(v)
    q = 0.0005
    r_lra = abs(np.searchsorted(sv, lra.quantile(q)) / len(v) - q)
    r_hra = abs(np.searchsorted(sv, hra.quantile(q)) / len(v) - q)
    assert r_lra <= r_hra + 1e-6


def test_req_lra_merge_and_serde():
    rng = np.random.default_rng(6)
    parts = [
        REQSketch(k=64, hra=False).update(rng.uniform(0, 1, 50_000))
        for _ in range(4)
    ]
    merged = REQSketch.from_bytes(parts[0].to_bytes())
    assert merged.hra is False  # serde round-trips the flavor flag
    for p in parts[1:]:
        merged.merge(p)
    assert merged.n == 200_000
    for q in [0.1, 0.01]:
        assert abs(merged.quantile(q) - q) <= 0.05 * q + 0.005
    rt = REQSketch.from_bytes(merged.to_bytes())
    assert rt.same_buckets(merged) and rt.n == merged.n and rt.hra is False


def test_req_hra_lra_merge_mismatch():
    with pytest.raises(ValueError, match="parameter mismatch"):
        REQSketch(k=64, hra=True).merge(REQSketch(k=64, hra=False))


# ---------------------------------------------------------------- sources
def test_read_transcripts_parquet_fallback(spark, tmp_path):
    from puddsketch_spark.datagen import transcripts

    path = str(tmp_path / "t")
    transcripts(spark, n_conv=20, seed=1).write.parquet(path)
    df = read_transcripts(spark, path)  # auto -> parquet (no iceberg jar here)
    assert set(f.name for f in TRANSCRIPT_SCHEMA.fields) <= set(df.columns)
    assert df.count() > 0


def test_read_transcripts_schema_validation(spark, tmp_path):
    path = str(tmp_path / "bad")
    spark.range(5).write.parquet(path)
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, path)


def test_req_tree_merge_stays_bounded():
    """Regression: repeated tree merges must not grow level buffers past cap
    (single-pass compaction left levels at 4x cap after 64-way fan-in)."""
    rng = np.random.default_rng(7)
    parts = [REQSketch(k=16).update(rng.uniform(0, 1, 2_000)) for _ in range(64)]
    pool = parts
    while len(pool) > 1:
        pool = [
            pool[i].merge(pool[i + 1]) if i + 1 < len(pool) else pool[i]
            for i in range(0, len(pool), 2)
        ]
    merged = pool[0]
    cap = 2 * merged.k
    assert all(lv.size <= cap for lv in merged.levels), [lv.size for lv in merged.levels]
    assert merged.n == 128_000
    assert merged.quantile(1.0) == merged.vmax  # exact extreme clamp
