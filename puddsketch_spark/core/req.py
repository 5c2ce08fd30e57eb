"""REQ-style relative-error quantile sketch (HRA), completing the reference's
sketch family (psketches/preq.cpp uses the Apache DataSketches req_sketch;
re-derived here from Cormode, Karnin, Liberty, Thaler & Vesely, "Relative
Error Streaming Quantiles", PODS 2021 — not ported).

High-Rank-Accuracy flavor: each compaction sorts the level buffer and
compacts only the LOWEST half (promoting every other item, alternating
offset), leaving the top items at full resolution — so rank error at
quantile q shrinks proportionally to (1-q), giving sharp p99/p999 (exactly
what tail-latency queries need), unlike KLL's uniform rank error.

Same mergeable contract as the other kernels.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["REQSketch"]

_MAGIC = b"REQ1"


@dataclass
class REQSketch:
    k: int = 64  # section size; buffer cap per level = 2k
    hra: bool = True
    n: int = 0
    vmin: float = np.inf
    vmax: float = -np.inf
    levels: list = field(default_factory=lambda: [np.empty(0, dtype=np.float64)])
    compactions: list = field(default_factory=lambda: [0])

    @property
    def count(self) -> int:
        return self.n

    @property
    def num_buckets(self) -> int:
        return int(sum(lv.size for lv in self.levels))

    num_collapses = 0

    def _cap(self) -> int:
        return 2 * self.k

    def update(self, values) -> "REQSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self.n += int(v.size)
        cap = self._cap()
        for s in range(0, v.size, cap):
            self.levels[0] = np.concatenate([self.levels[0], v[s : s + cap]])
            self._compress()
        return self

    def _compress(self) -> None:
        # fixed point: one compaction halves a level but can leave it (or the
        # level above) still over cap after a merge — re-scan until stable,
        # otherwise tree merges grow buffers without bound
        cap = self._cap()
        changed = True
        while changed:
            changed = False
            for h in range(len(self.levels)):
                if self.levels[h].size > cap:
                    self._compact_level(h)
                    changed = True

    def _compact_level(self, h: int) -> None:
        lv = np.sort(self.levels[h])
        half = lv.size // 2
        if self.hra:
            compacting, kept = lv[:half], lv[half:]  # protect the top (HRA)
        else:
            compacting, kept = lv[half:], lv[:half]
        off = self.compactions[h] & 1
        self.compactions[h] += 1
        if compacting.size & 1:
            # keep the unpaired item at this level (nearest the protected side)
            if self.hra:
                kept = np.concatenate([compacting[-1:], kept])
                compacting = compacting[:-1]
            else:
                kept = np.concatenate([kept, compacting[:1]])
                compacting = compacting[1:]
        promoted = compacting[off::2]
        self.levels[h] = kept
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.compactions.append(0)
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    def merge(self, other: "REQSketch") -> "REQSketch":
        if self.k != other.k or self.hra != other.hra:
            raise ValueError("REQ parameter mismatch")
        self.n += other.n
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        for h, lv in enumerate(other.levels):
            while h >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.compactions.append(0)
            self.levels[h] = np.concatenate([self.levels[h], lv])
            if h < len(other.compactions):
                self.compactions[h] += other.compactions[h]
        self._compress()
        return self

    def _weighted(self):
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
        it, wt = self._weighted()
        if it.size == 0:
            return float("nan")
        if q <= 0.0:
            return float(self.vmin)
        if q >= 1.0:
            return float(self.vmax)  # exact extremes (tracked in state)
        cum = np.cumsum(wt)
        i = min(int(np.searchsorted(cum, q * cum[-1], side="left")), it.size - 1)
        return float(it[i])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, value: float) -> float:
        it, wt = self._weighted()
        if it.size == 0:
            return float("nan")
        cum = np.cumsum(wt)
        i = int(np.searchsorted(it, value, side="right"))
        return float(cum[i - 1] / cum[-1]) if i > 0 else 0.0

    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack(
            "<iiqddi", self.k, int(self.hra), self.n, self.vmin, self.vmax, len(self.levels)
        )
        parts = [head]
        for lv, c in zip(self.levels, self.compactions):
            parts.append(struct.pack("<qi", lv.size, c))
            parts.append(lv.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "REQSketch":
        data = bytes(data)
        if data[:4] != _MAGIC:
            raise ValueError("not a REQ blob")
        k, hra, n, vmin, vmax, nlev = struct.unpack_from("<iiqddi", data, 4)
        off = 4 + struct.calcsize("<iiqddi")
        levels, comps = [], []
        for _ in range(nlev):
            sz, c = struct.unpack_from("<qi", data, off)
            off += struct.calcsize("<qi")
            levels.append(np.frombuffer(data, dtype="<f8", offset=off, count=sz).astype(np.float64))
            comps.append(c)
            off += sz * 8
        return cls(k=k, hra=bool(hra), n=n, vmin=vmin, vmax=vmax,
                   levels=levels, compactions=comps)

    def same_buckets(self, other: "REQSketch") -> bool:
        return (
            self.k == other.k
            and len(self.levels) == len(other.levels)
            and all(np.array_equal(a, b) for a, b in zip(self.levels, other.levels))
        )
