"""DDSketch pair kernel: signed-value accuracy, B* routing, merge invariants."""

import numpy as np
import pytest

from puddsketch_spark.core.ddsketch import DDSketchPair


def exact_quantile(values, q):
    v = np.sort(np.asarray(values, dtype=np.float64))
    return v[int(np.floor(q * (len(v) - 1)))]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_signed_accuracy_within_alpha(seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(0, 100, 100_000)  # mixed sign
    sk = DDSketchPair(initial_alpha=0.005, m=0).update(v)
    for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        est, exact = sk.quantile(q), exact_quantile(v, q)
        assert abs(est - exact) <= sk.alpha * abs(exact) + 1e-9, (q, est, exact)


def test_sign_split_and_zero_bucket():
    sk = DDSketchPair(initial_alpha=0.01, m=0)
    sk.update(np.array([-10.0, -1.0, 0.0, 2.0, 100.0, np.nan]))
    assert sk.count == 5
    assert sk.zero_count == 1
    assert sk.neg_keys.size == 2 and sk.pos_keys.size == 2
    # ordered walk: q=0 -> most negative, q=1 -> most positive
    assert sk.quantile(0.0) == pytest.approx(-10.0, rel=0.02)
    assert sk.quantile(0.5) == pytest.approx(0.0, abs=1e-12)
    assert sk.quantile(1.0) == pytest.approx(100.0, rel=0.02)


def test_negative_only():
    rng = np.random.default_rng(3)
    v = -rng.lognormal(3, 1, 50_000)
    sk = DDSketchPair(initial_alpha=0.01, m=200).update(v)
    for q in [0.1, 0.5, 0.9]:
        est, exact = sk.quantile(q), exact_quantile(v, q)
        assert abs(est - exact) <= sk.alpha * abs(exact), (q, est, exact)


def test_bound_applies_jointly_and_preserves_population():
    rng = np.random.default_rng(4)
    v = np.concatenate([rng.lognormal(2, 2, 20_000), -rng.lognormal(2, 2, 20_000)])
    sk = DDSketchPair(initial_alpha=0.01, m=64).update(v)
    assert sk.num_buckets <= 64
    assert sk.num_collapses > 0
    assert sk.count == 40_000


def test_merge_commutative_and_serde():
    rng = np.random.default_rng(5)
    a = DDSketchPair(0.01, m=128).update(rng.normal(-50, 20, 30_000))
    b = DDSketchPair(0.01, m=128).update(rng.normal(50, 20, 30_000))
    ab = DDSketchPair.from_bytes(a.to_bytes()).merge(b.copy())
    ba = DDSketchPair.from_bytes(b.to_bytes()).merge(a.copy())
    assert ab.same_buckets(ba)
    assert ab.count == 60_000
    rt = DDSketchPair.from_bytes(ab.to_bytes())
    assert rt.same_buckets(ab)


def test_merge_alpha_mismatch_raises():
    with pytest.raises(ValueError, match="incompatible alpha"):
        DDSketchPair(0.01).merge(DDSketchPair(0.02))


def test_ddog_low_collapse_bound_and_fences():
    """DataDog-original LowBins collapse: gamma fixed, excess bins fold from
    the low end of the value axis, fences mark where accuracy starts.
    (Reference tracks the accurate quantile range [q0B, q1B] for the same
    reason: ParallelSketcher.cc:920-1028.)"""
    rng = np.random.default_rng(7)
    v = np.concatenate([rng.lognormal(2, 2, 20_000), -rng.lognormal(2, 2, 20_000)])
    sk = DDSketchPair(initial_alpha=0.01, m=64, collapse_mode="ddog_low").update(v)
    assert sk.num_buckets <= 64
    assert sk.count == 40_000
    assert sk.num_collapses == 0  # resolution unchanged
    assert sk.alpha == pytest.approx(0.01)
    assert sk.pair_collapses > 0
    assert sk.fence_neg is not None  # negative store gave bins first (LowBins)
    # accuracy holds exactly for values ABOVE the positive fence
    fence_value = sk.gamma ** sk.fence_pos if sk.fence_pos is not None else -np.inf
    for q in [0.7, 0.9, 0.99, 0.999]:
        exact = exact_quantile(v, q)
        if exact > fence_value:
            est = sk.quantile(q)
            assert abs(est - exact) <= sk.alpha * abs(exact) + 1e-9, (q, est, exact)
    # the top decile of a lognormal must be above any reasonable fence here
    assert exact_quantile(v, 0.999) > fence_value


def test_ddog_merge_commutative_and_serde():
    rng = np.random.default_rng(8)
    a = DDSketchPair(0.01, m=100, collapse_mode="ddog_low").update(rng.normal(-10, 30, 20_000))
    b = DDSketchPair(0.01, m=100, collapse_mode="ddog_low").update(rng.normal(10, 30, 20_000))
    ab = DDSketchPair.from_bytes(a.to_bytes()).merge(b.copy())
    ba = DDSketchPair.from_bytes(b.to_bytes()).merge(a.copy())
    assert ab.count == ba.count == 40_000
    assert ab.num_buckets <= 100 and ba.num_buckets <= 100
    rt = DDSketchPair.from_bytes(ab.to_bytes())
    assert rt.same_buckets(ab) and rt.collapse_mode == "ddog_low"
    assert rt.pair_collapses == ab.pair_collapses and rt.fence_neg == ab.fence_neg


def test_ddog_mode_mismatch_raises():
    with pytest.raises(ValueError, match="collapse modes"):
        DDSketchPair(0.01).merge(DDSketchPair(0.01, collapse_mode="ddog_low"))


def test_mixed_resolution_merge():
    rng = np.random.default_rng(6)
    fine = DDSketchPair(0.01, m=0).update(rng.normal(0, 10, 5_000))
    coarse = DDSketchPair(0.01, m=0).update(rng.normal(0, 10, 5_000)).collapse(2)
    merged = fine.copy().merge(coarse.copy())
    assert merged.num_collapses == 2 and merged.count == 10_000
    assert merged.same_buckets(coarse.copy().merge(fine.copy()))
