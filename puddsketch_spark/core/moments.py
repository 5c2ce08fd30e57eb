"""Moments sketch: exact single-pass mean / variance / skewness / kurtosis
(north_rule companion; merge formulas from Pébay 2008, "Formulas for Robust,
One-Pass Parallel Computation of Covariances and Arbitrary-Order Statistical
Moments", SAND2008-6212).

Unlike the estimate sketches this kernel is EXACT: it carries the central
power sums (n, mean, M2, M3, M4) plus min/max, which merge in any order —
the same mergeable-UDAF contract as the rest of the companion set, so one
scan yields distribution-shape statistics per group at any scale. Numerical
note: the pairwise (Chan/Pébay) update is numerically stable, but floating
point addition is not associative, so cross-merge-order agreement is ~1e-12
relative, not bit-for-bit (tests pin accordingly).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

__all__ = ["MomentsSketch"]

_MAGIC = b"MOM1"


def _drop_nan(values, counts=None):
    arr = np.asarray(values, dtype=np.float64) if not hasattr(values, "to_numpy") else values.to_numpy().astype(np.float64, copy=False)
    m = ~np.isnan(arr)
    if counts is None:
        return arr[m], None
    return arr[m], np.asarray(counts, dtype=np.float64)[m]


@dataclass
class MomentsSketch:
    n: float = 0.0
    mean: float = 0.0
    m2: float = 0.0
    m3: float = 0.0
    m4: float = 0.0
    vmin: float = float("inf")
    vmax: float = float("-inf")

    # metrics-contract attrs
    @property
    def count(self) -> int:
        return int(self.n)

    num_buckets = 5  # fixed-size state
    num_collapses = 0
    value_family = "real"

    # ---------------------------------------------------------------- update
    def _combine(self, nb, mean_b, m2b, m3b, m4b, vmin_b, vmax_b) -> None:
        if nb == 0:
            return
        na, ma = self.n, self.mean
        if na == 0:
            self.n, self.mean = nb, mean_b
            self.m2, self.m3, self.m4 = m2b, m3b, m4b
            self.vmin, self.vmax = vmin_b, vmax_b
            return
        n = na + nb
        d = mean_b - ma
        self.mean = ma + d * nb / n
        m2 = self.m2 + m2b + d * d * na * nb / n
        m3 = (
            self.m3
            + m3b
            + d**3 * na * nb * (na - nb) / n**2
            + 3.0 * d * (na * m2b - nb * self.m2) / n
        )
        m4 = (
            self.m4
            + m4b
            + d**4 * na * nb * (na * na - na * nb + nb * nb) / n**3
            + 6.0 * d * d * (na * na * m2b + nb * nb * self.m2) / n**2
            + 4.0 * d * (na * m3b - nb * self.m3) / n
        )
        self.n, self.m2, self.m3, self.m4 = n, m2, m3, m4
        self.vmin = min(self.vmin, vmin_b)
        self.vmax = max(self.vmax, vmax_b)

    def update(self, values) -> "MomentsSketch":
        x, _ = _drop_nan(values)
        if x.size == 0:
            return self
        mean = float(x.mean())
        c = x - mean
        c2 = c * c
        self._combine(
            float(x.size), mean, float(c2.sum()), float((c2 * c).sum()),
            float((c2 * c2).sum()), float(x.min()), float(x.max()),
        )
        return self

    def update_weighted(self, values, counts) -> "MomentsSketch":
        """Exact for integer counts (weight w == value repeated w times).
        Zero- or NaN-weight entries contribute nothing — including to
        min/max (a value present zero times must not become the minimum)."""
        x, w = _drop_nan(values, counts)
        if x.size == 0:
            return self
        live = (w > 0) & ~np.isnan(w)
        x, w = x[live], w[live]
        if x.size == 0:
            return self
        n = float(w.sum())
        mean = float((x * w).sum() / n)
        c = x - mean
        c2 = c * c
        self._combine(
            n, mean, float((w * c2).sum()), float((w * c2 * c).sum()),
            float((w * c2 * c2).sum()), float(x.min()), float(x.max()),
        )
        return self

    # ---------------------------------------------------------------- merge
    def merge(self, other: "MomentsSketch") -> "MomentsSketch":
        self._combine(other.n, other.mean, other.m2, other.m3, other.m4,
                      other.vmin, other.vmax)
        return self

    # ---------------------------------------------------------------- stats
    def variance(self, ddof: int = 0) -> float:
        if self.n <= ddof:
            return float("nan")
        return self.m2 / (self.n - ddof)

    def stddev(self, ddof: int = 0) -> float:
        return float(np.sqrt(self.variance(ddof)))

    def skewness(self) -> float:
        """Population skewness g1 = sqrt(n) * M3 / M2^1.5."""
        if self.n == 0 or self.m2 == 0:
            return float("nan")
        return float(np.sqrt(self.n) * self.m3 / self.m2**1.5)

    def kurtosis(self, excess: bool = True) -> float:
        """Population kurtosis g2 = n * M4 / M2^2 (minus 3 when excess)."""
        if self.n == 0 or self.m2 == 0:
            return float("nan")
        k = self.n * self.m4 / (self.m2 * self.m2)
        return float(k - 3.0) if excess else float(k)

    def total(self) -> float:
        return self.mean * self.n

    # ---------------------------------------------------------------- serde
    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack(
            "<7d", self.n, self.mean, self.m2, self.m3, self.m4, self.vmin, self.vmax
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "MomentsSketch":
        data = bytes(data)
        if data[:4] != _MAGIC:
            raise ValueError("not a moments sketch blob")
        return cls(*struct.unpack_from("<7d", data, 4))

    def same_buckets(self, other: "MomentsSketch") -> bool:
        return self.to_bytes() == other.to_bytes()
