"""Mergeable sketches: HyperLogLog distinct-count.

The scalable aggregation pattern for distinct counts at 100 TB: one sketch
per batch inside ``map_batches`` (emit the serialized registers), merge the
(tiny) sketches in a second stage — sketches are designed to be mergeable
(ray_guide 'Aggregation at scale'). Plain numpy; deterministic given the
input multiset (register maxima are order-free).
"""

from __future__ import annotations

import numpy as np

from crawler_ray.functions.hashing import md5_u64_batch


class HyperLogLog:
    """Standard HLL (Flajolet et al.): 2^p registers, max-rank updates."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1, vectorized via
        # float64 exponent extraction (values are non-zero by construction)
        f = rest.astype(np.float64)
        exp = ((f.view(np.uint64) >> np.uint64(52)) & np.uint64(0x7FF)).astype(
            np.int64
        ) - 1023
        rank = (64 - exp).clip(1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        self.add_hashes(md5_u64_batch(list(values)))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert other.p == self.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv_sum = np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m / inv_sum
        if e <= 2.5 * m:  # small-range correction
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HyperLogLog":
        obj = cls(p=data[0])
        obj.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return obj


class MisraGries:
    """Misra-Gries frequent-items summary with k counters (Misra & Gries
    1982; merge rule from Agarwal et al. 2013 'Mergeable Summaries').

    Guarantees after summarizing a stream of n items: every item with true
    frequency > n/k is present, and each stored weight underestimates the
    true count by at most n/k. Merging two summaries (weight-sum then
    subtract the (k+1)-th largest and drop <=0) preserves both bounds, so
    per-batch sketches inside ``map_batches`` combine into an exact-superset
    candidate set for a second exact counting pass — the scale path for
    frequent items over domains too large to aggregate exactly (open token
    vocabularies, URLs, n-grams)."""

    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.counters: dict = {}

    def add(self, values, counts=None) -> "MisraGries":
        """Vectorized bulk add: pre-reduce with np.unique, then one dict
        merge + at most one batched decrement."""
        values = np.asarray(values)
        if counts is None:
            values, counts = np.unique(values, return_counts=True)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        c = self.counters
        for v, w in zip(values.tolist(), counts.tolist()):
            c[v] = c.get(v, 0) + w
        self._compress()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(min(self.k, other.k))
        c = dict(self.counters)
        for v, w in other.counters.items():
            c[v] = c.get(v, 0) + w
        out.counters = c
        out._compress()
        return out

    def _compress(self) -> None:
        c = self.counters
        if len(c) <= self.k:
            return
        # subtract the (k+1)-th largest weight from everything, drop <= 0:
        # one decrement round restores |counters| <= k while charging every
        # surviving weight at most what the eviction rule allows
        w = np.fromiter(c.values(), dtype=np.int64)
        d = int(np.partition(w, len(w) - self.k - 1)[len(w) - self.k - 1])
        self.counters = {v: x - d for v, x in c.items() if x > d}

    def items(self) -> dict:
        return dict(self.counters)
