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
