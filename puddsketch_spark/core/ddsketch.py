"""DDSketch pair kernel: signed values via (positive store, negative store,
near-zero bucket B*).

Semantics re-derived from the reference's ParallelDDSketch (UDD-collapse
flavor): three-way sign split with B* for |x| below the addressable bound
(/root/reference/ParallelDDSketch/src/ParallelSketcher.cc:546-643, B* key
and NULLBOUND at Header.h:40 / ParallelSketcher.cc:234), uniform collapse
preserving B* (MapSketch.cc:43-83), pair quantile walking negative bins in
reverse key order then B* then positive bins ascending
(ArraySketch.cc:10-79, key-order reversal Merger.cc:15-111).

Same mergeable contract as UDDSketch; keys use ln(gamma) buckets (the
reference's log10/log10 ratio is algebraically identical). The m bound
applies to pos+neg bucket count jointly.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field, replace

import numpy as np

from .uddsketch import MIN_ADDRESSABLE, _ceil_div

__all__ = ["DDSketchPair"]

_EMPTY = np.empty(0, dtype=np.int64)
# init_alpha, alpha, m, collapses, zero, n_pos, n_neg, mode, pair_collapses,
# fence_neg, fence_pos (fence sentinel: _NOFENCE = None)
_HEADER_FMT = "<ddiiqqqiiqq"
_NOFENCE = -(2**62)
_MODES = {"uniform": 0, "ddog_low": 1}
_MODES_INV = {v: k for k, v in _MODES.items()}


def _absorb(keys: np.ndarray, counts: np.ndarray, k2: np.ndarray, c2: np.ndarray):
    # copies on the pass-through branches: returning an operand's arrays by
    # reference would alias two sketches' stores (mutation corrupts both)
    if keys.size == 0:
        return k2.copy(), c2.copy()
    if k2.size == 0:
        return keys.copy(), counts.copy()
    allk = np.concatenate([keys, k2])
    allc = np.concatenate([counts, c2])
    u, inv = np.unique(allk, return_inverse=True)
    out = np.zeros(u.size, dtype=np.int64)
    np.add.at(out, inv, allc)
    return u, out


def _collapse_store(keys: np.ndarray, counts: np.ndarray, n: int):
    if keys.size == 0:
        return keys, counts
    newk = _ceil_div(keys, 2**n)
    starts = np.flatnonzero(np.diff(newk, prepend=newk[0] - 1))
    return newk[starts], np.add.reduceat(counts, starts)


@dataclass
class DDSketchPair:
    initial_alpha: float = 0.01
    m: int = 500  # joint pos+neg bucket bound; 0 = unbounded
    num_collapses: int = 0
    zero_count: int = 0  # B*
    pos_keys: np.ndarray = field(default_factory=lambda: _EMPTY.copy())
    pos_counts: np.ndarray = field(default_factory=lambda: _EMPTY.copy())
    neg_keys: np.ndarray = field(default_factory=lambda: _EMPTY.copy())
    neg_counts: np.ndarray = field(default_factory=lambda: _EMPTY.copy())
    # "uniform" = UDD-flavor collapse (gamma widens, error bound alpha' grows)
    # "ddog_low" = DataDog-original LowBins pair collapse (MapSketch.cc:87-247):
    #   gamma fixed; excess bins fold pairwise from the low end of the value
    #   axis (highest-|key| negative bins first, then lowest positive bins),
    #   fencing keys track where estimates stop being alpha-accurate
    collapse_mode: str = "uniform"
    pair_collapses: int = 0
    fence_neg: int | None = None
    fence_pos: int | None = None

    @property
    def gamma0(self) -> float:
        return (1.0 + self.initial_alpha) / (1.0 - self.initial_alpha)

    @property
    def log_gamma(self) -> float:
        return float(2**self.num_collapses) * np.log(self.gamma0)

    @property
    def gamma(self) -> float:
        return float(self.gamma0 ** float(2**self.num_collapses))

    @property
    def alpha(self) -> float:
        g = self.gamma
        return (g - 1.0) / (g + 1.0)

    @property
    def count(self) -> int:
        return int(self.pos_counts.sum() + self.neg_counts.sum()) + self.zero_count

    @property
    def num_buckets(self) -> int:
        return int(self.pos_keys.size + self.neg_keys.size)

    # -- update --------------------------------------------------------------
    def update(self, values) -> "DDSketchPair":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        near_zero = np.abs(v) < MIN_ADDRESSABLE
        self.zero_count += int(near_zero.sum())
        v = v[~near_zero]
        lg = self.log_gamma
        pos = v[v > 0]
        neg = -v[v < 0]
        if pos.size:
            k = np.ceil(np.log(pos) / lg).astype(np.int64)
            u, c = np.unique(k, return_counts=True)
            self.pos_keys, self.pos_counts = _absorb(
                self.pos_keys, self.pos_counts, u, c.astype(np.int64)
            )
        if neg.size:
            k = np.ceil(np.log(neg) / lg).astype(np.int64)
            u, c = np.unique(k, return_counts=True)
            self.neg_keys, self.neg_counts = _absorb(
                self.neg_keys, self.neg_counts, u, c.astype(np.int64)
            )
        self._enforce_bound()
        return self

    def _enforce_bound(self) -> None:
        if self.collapse_mode == "ddog_low":
            self._ddog_low_collapse()
            return
        while self.m > 0 and self.num_buckets > self.m:
            self.collapse(1)

    def _ddog_low_collapse(self) -> None:
        """Batch-exact equivalent of the reference's sequential LowBins pair
        collapse (MapSketch.cc:87-247): while over bound, fold the highest-key
        negative bin into its neighbor (= lowest VALUES merge upward); once
        the negative store is down to <=1 bin, fold the lowest-key positive
        bins. B* (our zero_count) is never touched."""
        if self.m <= 0:
            return
        excess = self.num_buckets - self.m
        if excess <= 0:
            return
        # negative store: can give up (sizen - 1) bins
        give_n = min(excess, max(self.neg_keys.size - 1, 0))
        if give_n > 0:
            keep = self.neg_keys.size - give_n
            # counts of the top give_n keys fold into the new top bin (index keep-1)
            folded = int(self.neg_counts[keep - 1 :].sum())
            self.neg_keys = self.neg_keys[:keep]
            self.neg_counts = self.neg_counts[:keep].copy()
            self.neg_counts[-1] = folded
            self.fence_neg = int(self.neg_keys[-1])
            self.pair_collapses += give_n
            excess -= give_n
        if excess > 0 and self.pos_keys.size > 1:
            give_p = min(excess, self.pos_keys.size - 1)
            folded = int(self.pos_counts[: give_p + 1].sum())
            self.pos_keys = self.pos_keys[give_p:]
            self.pos_counts = self.pos_counts[give_p:].copy()
            self.pos_counts[0] = folded
            self.fence_pos = int(self.pos_keys[0])
            self.pair_collapses += give_p

    def collapse(self, n: int = 1) -> "DDSketchPair":
        """Uniform collapse of BOTH stores; B* is exempt (MapSketch.cc:43-83)."""
        if n <= 0:
            return self
        self.pos_keys, self.pos_counts = _collapse_store(self.pos_keys, self.pos_counts, n)
        self.neg_keys, self.neg_counts = _collapse_store(self.neg_keys, self.neg_counts, n)
        self.num_collapses += n
        return self

    # -- merge ----------------------------------------------------------------
    def merge(self, other: "DDSketchPair") -> "DDSketchPair":
        if self.initial_alpha != other.initial_alpha:
            raise ValueError("Merging sketches have incompatible alpha values")
        if self.collapse_mode != other.collapse_mode:
            raise ValueError("Merging sketches have incompatible collapse modes")
        self.pair_collapses += other.pair_collapses
        for attr in ("fence_neg", "fence_pos"):
            o = getattr(other, attr)
            s = getattr(self, attr)
            if o is not None:
                setattr(self, attr, o if s is None else max(s, o))
        a, b = self, other
        if a.num_collapses < b.num_collapses:
            a = a.copy().collapse(b.num_collapses - a.num_collapses)
        elif b.num_collapses < a.num_collapses:
            b = b.copy().collapse(a.num_collapses - b.num_collapses)
        self.num_collapses = a.num_collapses
        self.zero_count = a.zero_count + b.zero_count
        self.pos_keys, self.pos_counts = _absorb(a.pos_keys, a.pos_counts, b.pos_keys, b.pos_counts)
        self.neg_keys, self.neg_counts = _absorb(a.neg_keys, a.neg_counts, b.neg_keys, b.neg_counts)
        self._enforce_bound()
        return self

    def copy(self) -> "DDSketchPair":
        return replace(
            self,
            pos_keys=self.pos_keys.copy(),
            pos_counts=self.pos_counts.copy(),
            neg_keys=self.neg_keys.copy(),
            neg_counts=self.neg_counts.copy(),
        )

    # -- query ----------------------------------------------------------------
    def _bucket_value(self, bkey: int) -> float:
        return float(self.gamma ** float(bkey) * (1.0 - self.alpha))

    def quantile(self, q: float) -> float:
        """Walk: negative bins (descending key = ascending value), B*, then
        positive bins ascending (ArraySketch.cc:10-79)."""
        n = self.count
        if n == 0:
            return float("nan")
        rank = int(np.floor(q * (n - 1)))
        # negative store: value -gamma^key, scanned largest key first
        neg_desc_counts = self.neg_counts[::-1]
        cum = np.cumsum(neg_desc_counts) if neg_desc_counts.size else _EMPTY
        if cum.size and rank < cum[-1]:
            i = int(np.searchsorted(cum, rank, side="right"))
            key = int(self.neg_keys[::-1][i])
            return -self._bucket_value(key)
        consumed = int(cum[-1]) if cum.size else 0
        if rank < consumed + self.zero_count:
            return 0.0
        consumed += self.zero_count
        if self.pos_keys.size == 0:
            return 0.0
        cump = consumed + np.cumsum(self.pos_counts)
        i = min(int(np.searchsorted(cump, rank, side="right")), self.pos_keys.size - 1)
        return self._bucket_value(int(self.pos_keys[i]))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    # -- serde ------------------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack(
            _HEADER_FMT,
            self.initial_alpha,
            self.alpha,
            self.m,
            self.num_collapses,
            self.zero_count,
            self.pos_keys.size,
            self.neg_keys.size,
            _MODES[self.collapse_mode],
            self.pair_collapses,
            _NOFENCE if self.fence_neg is None else self.fence_neg,
            _NOFENCE if self.fence_pos is None else self.fence_pos,
        )
        parts = [head]
        for arr in (self.pos_keys, self.pos_counts, self.neg_keys, self.neg_counts):
            parts.append(arr.astype("<i8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "DDSketchPair":
        data = bytes(data)
        (init_alpha, _alpha, m, c, zero, n_pos, n_neg,
         mode, pairc, fneg, fpos) = struct.unpack_from(_HEADER_FMT, data, 0)
        off = struct.calcsize(_HEADER_FMT)

        def take(n):
            nonlocal off
            a = np.frombuffer(data, dtype="<i8", offset=off, count=n).astype(np.int64)
            off += n * 8
            return a

        return cls(
            initial_alpha=init_alpha,
            m=m,
            num_collapses=c,
            zero_count=zero,
            pos_keys=take(n_pos),
            pos_counts=take(n_pos),
            neg_keys=take(n_neg),
            neg_counts=take(n_neg),
            collapse_mode=_MODES_INV[mode],
            pair_collapses=pairc,
            fence_neg=None if fneg == _NOFENCE else fneg,
            fence_pos=None if fpos == _NOFENCE else fpos,
        )

    def same_buckets(self, other: "DDSketchPair") -> bool:
        return (
            self.initial_alpha == other.initial_alpha
            and self.num_collapses == other.num_collapses
            and self.zero_count == other.zero_count
            and np.array_equal(self.pos_keys, other.pos_keys)
            and np.array_equal(self.pos_counts, other.pos_counts)
            and np.array_equal(self.neg_keys, other.neg_keys)
            and np.array_equal(self.neg_counts, other.neg_counts)
        )
