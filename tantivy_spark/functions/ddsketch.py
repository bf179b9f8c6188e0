"""DDSketch — relative-error quantile sketch, fully mergeable.

The reference's percentiles aggregation wraps the `sketches-ddsketch`
crate with its default config (alpha=0.01, max 2048 bins, min value 1e-9)
(/root/reference/src/aggregation/metric/percentiles.rs:216-218,
Cargo.toml `sketches-ddsketch`).  This is the same algorithm from the
DDSketch paper (Masson, Rim, Lee — VLDB'19) implemented vectorized in
numpy: log-gamma bucket keys, mirrored store for negatives, a zero
counter, and bucket-midpoint (in log space) value estimates.  Same
relative-error guarantee (|est - true| <= alpha * true); NOT
byte-compatible with the Rust crate's serialization.

Two-phase distributed use: one sketch per partition (`add` over an Arrow
batch), serialize, merge on the driver or in a reduce — exactly the
segment -> IntermediateAggregationResults -> merge_fruits shape of the
reference (intermediate_agg_result.rs:213).
"""

from __future__ import annotations

import numpy as np

DEFAULT_ALPHA = 0.01
DEFAULT_MAX_BINS = 2048
DEFAULT_MIN_VALUE = 1.0e-9


class DDSketch:
    __slots__ = ("alpha", "gamma", "log_gamma", "min_value", "max_bins",
                 "pos", "neg", "zero_count")

    def __init__(self, alpha: float = DEFAULT_ALPHA,
                 max_bins: int = DEFAULT_MAX_BINS,
                 min_value: float = DEFAULT_MIN_VALUE):
        self.alpha = float(alpha)
        self.gamma = (1.0 + alpha) / (1.0 - alpha)
        self.log_gamma = np.log(self.gamma)
        self.min_value = float(min_value)
        self.max_bins = int(max_bins)
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.zero_count = 0

    # -- build --------------------------------------------------------------
    def add(self, values) -> None:
        """Vectorized insert of an array of float values."""
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        zero = np.abs(v) < self.min_value
        self.zero_count += int(zero.sum())
        for sign, store in ((1.0, self.pos), (-1.0, self.neg)):
            part = v[(~zero) & ((v > 0) if sign > 0 else (v < 0))] * sign
            if len(part) == 0:
                continue
            keys = np.ceil(np.log(part) / self.log_gamma).astype(np.int64)
            uk, counts = np.unique(keys, return_counts=True)
            for k, c in zip(uk.tolist(), counts.tolist()):
                store[k] = store.get(k, 0) + int(c)
        self._collapse()

    def _collapse(self) -> None:
        # bin-count bound: collapse the smallest keys into one (the
        # crate's bounded-memory behavior; affects only the extreme tail)
        for store in (self.pos, self.neg):
            while len(store) > self.max_bins:
                ks = sorted(store)
                k0, k1 = ks[0], ks[1]
                store[k1] = store.get(k1, 0) + store.pop(k0)

    # -- merge --------------------------------------------------------------
    def merge(self, other: "DDSketch") -> "DDSketch":
        assert abs(other.gamma - self.gamma) < 1e-12, "incompatible sketches"
        for mine, theirs in ((self.pos, other.pos), (self.neg, other.neg)):
            for k, c in theirs.items():
                mine[k] = mine.get(k, 0) + c
        self.zero_count += other.zero_count
        self._collapse()
        return self

    # -- read ---------------------------------------------------------------
    @property
    def count(self) -> int:
        return (self.zero_count + sum(self.pos.values())
                + sum(self.neg.values()))

    def _key_value(self, key: int) -> float:
        # bucket (gamma^(k-1), gamma^k] estimated at the log-space midpoint
        return 2.0 * self.gamma ** key / (self.gamma + 1.0)

    def quantile(self, q: float) -> float | None:
        """Value at quantile q in [0, 1] with relative error <= alpha."""
        n = self.count
        if n == 0 or not (0.0 <= q <= 1.0):
            return None
        rank = q * (n - 1)
        # ascending walk: negatives (largest key = most negative first),
        # zeros, positives
        cum = 0
        for k in sorted(self.neg, reverse=True):
            cum += self.neg[k]
            if cum > rank:
                return -self._key_value(k)
        cum += self.zero_count
        if cum > rank:
            return 0.0
        for k in sorted(self.pos):
            cum += self.pos[k]
            if cum > rank:
                return self._key_value(k)
        return self._key_value(max(self.pos)) if self.pos else 0.0

    # -- serialization (for shuffling partial sketches) ---------------------
    def to_arrays(self) -> tuple[np.ndarray, np.ndarray, int]:
        keys = np.array(
            sorted(self.pos) + [-(10**9) + k for k in sorted(self.neg)],
            dtype=np.int64,
        )
        # encode negatives' keys offset so one pair of arrays carries both
        counts = np.array(
            [self.pos[k] for k in sorted(self.pos)]
            + [self.neg[k] for k in sorted(self.neg)],
            dtype=np.int64,
        )
        return keys, counts, self.zero_count

    @classmethod
    def from_arrays(cls, keys: np.ndarray, counts: np.ndarray,
                    zero_count: int, alpha: float = DEFAULT_ALPHA,
                    max_bins: int = DEFAULT_MAX_BINS) -> "DDSketch":
        s = cls(alpha=alpha, max_bins=max_bins)
        for k, c in zip(np.asarray(keys).tolist(),
                        np.asarray(counts).tolist()):
            if k <= -(10**9) + 10**8:  # negative-store marker range
                s.neg[k + 10**9] = int(c)
            else:
                s.pos[int(k)] = int(c)
        s.zero_count = int(zero_count)
        return s
