"""KLL quantile sketch kernel (north_rule companion; designed from Karnin,
Lang & Liberty, "Optimal Quantile Approximation in Streams", FOCS 2016 —
behavioral reference: the Apache DataSketches kll_sketch used by
/root/reference/psketches/pkll.cpp, reimplemented from the paper, not ported).

Level ladder: items at level h carry weight 2^h; level capacities shrink
geometrically cap(h) = max(8, ceil(k * (2/3)^(depth-h))). A full level is
sorted and every other item promoted. Offsets alternate deterministically
(per-level compaction counter) so runs are reproducible; the classical
analysis uses random offsets, alternation behaves equivalently in practice.
Single-sided rank error ~ 2.296/k^0.9723 (DataSketches empirical fit).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["KLLSketch"]

_MAGIC = b"KLL1"


def _caps(k: int, num_levels: int) -> list[int]:
    return [max(8, int(np.ceil(k * (2.0 / 3.0) ** (num_levels - 1 - h)))) for h in range(num_levels)]


@dataclass
class KLLSketch:
    k: int = 200
    n: int = 0
    vmin: float = np.inf
    vmax: float = -np.inf
    levels: list = field(default_factory=lambda: [np.empty(0, dtype=np.float64)])
    compactions: list = field(default_factory=lambda: [0])

    # metrics-contract attrs
    @property
    def count(self) -> int:
        return self.n

    @property
    def num_buckets(self) -> int:
        return int(sum(lv.size for lv in self.levels))

    num_collapses = 0

    @property
    def rank_eps(self) -> float:
        return 2.296 / self.k**0.9723

    def update(self, values) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self.n += int(v.size)
        # absorb in capacity-sized slices so level 0 never balloons
        cap0 = _caps(self.k, len(self.levels))[0]
        for s in range(0, v.size, max(cap0, 64)):
            self.levels[0] = np.concatenate([self.levels[0], v[s : s + max(cap0, 64)]])
            self._compress()
        return self

    def _compress(self) -> None:
        while True:
            caps = _caps(self.k, len(self.levels))
            for h, lv in enumerate(self.levels):
                if lv.size > caps[h]:
                    self._compact_level(h)
                    break
            else:
                return

    def _compact_level(self, h: int) -> None:
        lv = np.sort(self.levels[h])
        off = self.compactions[h] & 1
        self.compactions[h] += 1
        if lv.size & 1:
            kept, pairs = lv[-1:], lv[:-1]  # odd: unpaired max stays here
        else:
            kept, pairs = np.empty(0, dtype=np.float64), lv
        promoted = pairs[off::2]  # one survivor per (2i, 2i+1) pair
        self.levels[h] = kept
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.compactions.append(0)
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("KLL k mismatch")
        self.n += other.n
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        for h, lv in enumerate(other.levels):
            while h >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.compactions.append(0)
            self.levels[h] = np.concatenate([self.levels[h], lv])
            self.compactions[h] += other.compactions[h] if h < len(other.compactions) else 0
        self._compress()
        return self

    def _weighted_items(self):
        items, weights = [], []
        for h, lv in enumerate(self.levels):
            if lv.size:
                items.append(lv)
                weights.append(np.full(lv.size, 1 << h, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float) -> float:
        it, wt = self._weighted_items()
        if it.size == 0:
            return float("nan")
        cum = np.cumsum(wt)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, it.size - 1)
        return float(it[i])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, value: float) -> float:
        it, wt = self._weighted_items()
        if it.size == 0:
            return float("nan")
        cum = np.cumsum(wt)
        i = int(np.searchsorted(it, value, side="right"))
        return float(cum[i - 1] / cum[-1]) if i > 0 else 0.0

    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack(
            "<iqddi", self.k, self.n, self.vmin, self.vmax, len(self.levels)
        )
        parts = [head]
        for lv, c in zip(self.levels, self.compactions):
            parts.append(struct.pack("<qi", lv.size, c))
            parts.append(lv.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        data = bytes(data)
        if data[:4] != _MAGIC:
            raise ValueError("not a KLL blob")
        k, n, vmin, vmax, nlev = struct.unpack_from("<iqddi", data, 4)
        off = 4 + struct.calcsize("<iqddi")
        levels, compactions = [], []
        for _ in range(nlev):
            sz, c = struct.unpack_from("<qi", data, off)
            off += struct.calcsize("<qi")
            levels.append(np.frombuffer(data, dtype="<f8", offset=off, count=sz).astype(np.float64))
            compactions.append(c)
            off += sz * 8
        return cls(k=k, n=n, vmin=vmin, vmax=vmax, levels=levels, compactions=compactions)

    def same_buckets(self, other: "KLLSketch") -> bool:
        return (
            self.k == other.k
            and len(self.levels) == len(other.levels)
            and all(np.array_equal(a, b) for a, b in zip(self.levels, other.levels))
        )
