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


class MRLQuantile:
    """Deterministic mergeable quantile summary (the Manku-Rajagopalan-
    Lindsay '98 / KLL compactor family, with DETERMINISTIC alternating
    selection instead of KLL's coin flips, so runs and resumes reproduce
    bit-identical estimates).

    Level i holds at most k values of weight 2^i. Compaction sorts a full
    level, promotes every other element (parity alternates per level) to
    level i+1 and keeps any odd remainder in place — total weight is
    conserved EXACTLY (2 x w -> 1 x 2w), so rank queries normalize by the
    true count. Space is O(k log(n/k)); rank error is O(log^2(n/k) / k)
    relative, asserted empirically in tests. Merging concatenates levels
    then re-compacts — the per-batch-sketch -> tiny-merge-stage pattern
    HLL/MisraGries use, for the third aggregate family (quantiles)."""

    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        self.levels: list[np.ndarray] = [np.array([], np.float64)]
        self.parity: list[int] = [0]
        self.n = 0

    def add(self, values) -> "MRLQuantile":
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        self.n += v.size
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            lv = self.levels[i]
            if len(lv) > self.k:
                s = np.sort(lv)
                m = (len(s) // 2) * 2
                off = self.parity[i]
                self.parity[i] ^= 1
                promoted = s[off:m:2]
                self.levels[i] = s[m:]  # odd remainder stays at weight 2^i
                if i + 1 == len(self.levels):
                    self.levels.append(np.array([], np.float64))
                    self.parity.append(0)
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], promoted]
                )
            i += 1

    def merge(self, other: "MRLQuantile") -> "MRLQuantile":
        out = MRLQuantile(min(self.k, other.k))
        depth = max(len(self.levels), len(other.levels))
        e = np.array([], np.float64)
        out.levels = [
            np.concatenate(
                [self.levels[i] if i < len(self.levels) else e,
                 other.levels[i] if i < len(other.levels) else e]
            )
            for i in range(depth)
        ]
        out.parity = [
            (self.parity[i] if i < len(self.parity) else 0)
            ^ (other.parity[i] if i < len(other.parity) else 0)
            for i in range(depth)
        ]
        out.n = self.n + other.n
        out._compress()
        return out

    def quantile(self, q: float) -> float:
        """Smallest stored value whose cumulative weight reaches
        ceil(q * n) (q=0 -> stored minimum)."""
        if self.n == 0:
            raise ValueError("empty sketch")
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, np.int64)
             for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(wts[order])
        target = max(1, int(np.ceil(q * self.n)))
        return float(vals[order][np.searchsorted(cum, target)])

    def total_weight(self) -> int:
        return int(sum((1 << i) * len(lv) for i, lv in enumerate(self.levels)))

    def serialize(self) -> bytes:
        import struct

        head = struct.pack(
            "<qqq", self.k, self.n, len(self.levels)
        ) + struct.pack(f"<{len(self.levels)}q", *map(len, self.levels)) + (
            struct.pack(f"<{len(self.parity)}q", *self.parity)
        )
        return head + b"".join(
            lv.astype("<f8").tobytes() for lv in self.levels
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "MRLQuantile":
        import struct

        k, n, d = struct.unpack_from("<qqq", data, 0)
        off = 24
        lens = struct.unpack_from(f"<{d}q", data, off)
        off += 8 * d
        parity = list(struct.unpack_from(f"<{d}q", data, off))
        off += 8 * d
        obj = cls(k)
        obj.n = n
        obj.parity = parity
        obj.levels = []
        for ln in lens:
            obj.levels.append(
                np.frombuffer(data, dtype="<f8", count=ln, offset=off).copy()
            )
            off += 8 * ln
        return obj


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): ``depth`` x ``width``
    counter grid; point estimate = min over rows. Completes the mergeable
    sketch family beside HLL (distinct), Misra-Gries (frequent items) and
    MRL (quantiles).

    Guarantees for a stream of total weight N with width w = ceil(e/eps) and
    depth d = ceil(ln(1/delta)): estimate(x) >= true(x) always (counters
    only overcount), and estimate(x) <= true(x) + eps*N with probability
    >= 1 - delta. Merge = elementwise counter sum, which preserves both
    bounds exactly (Agarwal et al. 2013) — so per-batch sketches inside
    ``map_batches`` combine associatively.

    Hashing: one md5-derived 64-bit value per item, then ``depth``
    multiply-shift row hashes from fixed odd constants — deterministic
    across processes and batch splits."""

    _A = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0x2545F4914F6CDD1D,
         0xA24BAED4963EE407, 0x9FB21C651E98DF25],
        dtype=np.uint64,
    )

    def __init__(self, width: int = 2048, depth: int = 4):
        if not (1 <= depth <= len(self._A)):
            raise ValueError(f"depth must be in 1..{len(self._A)}")
        self.width, self.depth = width, depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0

    def _rows(self, h: np.ndarray) -> np.ndarray:
        # (depth, len(h)) column indices via multiply-shift
        prod = h[None, :] * self._A[: self.depth, None]
        return ((prod >> np.uint64(17)) % np.uint64(self.width)).astype(
            np.int64
        )

    def add(self, values, counts=None) -> "CountMin":
        values = np.asarray(values)
        if counts is None:
            values, counts = np.unique(values, return_counts=True)
        counts = np.asarray(counts, dtype=np.int64)
        h = md5_u64_batch(values.astype(str))
        idx = self._rows(h)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], counts)
        self.n += int(counts.sum())
        return self

    def estimate(self, values) -> np.ndarray:
        values = np.asarray(values)
        h = md5_u64_batch(values.astype(str))
        idx = self._rows(h)
        ests = np.stack(
            [self.table[r][idx[r]] for r in range(self.depth)]
        )
        return ests.min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("sketch shapes differ")
        out = CountMin(self.width, self.depth)
        out.table = self.table + other.table
        out.n = self.n + other.n
        return out

    def serialize(self) -> bytes:
        import struct

        return struct.pack("<qqq", self.width, self.depth, self.n) + (
            self.table.astype("<i8").tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "CountMin":
        import struct

        w, d, n = struct.unpack_from("<qqq", data, 0)
        obj = cls(w, d)
        obj.n = n
        obj.table = (
            np.frombuffer(data[24:], dtype="<i8").reshape(d, w).copy()
        )
        return obj
