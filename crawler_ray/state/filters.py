"""Approximate-membership filters: counting-free Bloom and a bucketized cuckoo
filter, both numpy-backed, batch-oriented and serializable (checkpointable).

North-rule structure (BASELINE.json): the URL/image seen-set is a *sharded
cuckoo filter with bloom fallback for cold shards*, replacing the reference's
in-process ``ConcurrentBag`` MD5 bag + disabled Redis hash
(``HZ.Crawler.DataSpider/BaseSpider.cs:34,50-59``;
``HZ.Crawler.RedisService/RedisHashService.cs:21-118`` —
``SetEntryInHashIfNotExists`` is exactly ``check_and_insert`` semantics).

Sizing note for the 10^10-URL design point: one cuckoo shard at
``capacity=2**27`` (~128 Mi slots × uint16 = 256 MiB) holds ~1.2e8 keys at
<0.96 load; 10^10 keys ⇒ ~96 shards spread across the cluster's actor pool —
far below a 256-node cluster's memory. False-positive rate with 16-bit
fingerprints and bucket size 4 is ~2^-13, and exact verification (the
``SeenShard`` dict) removes even those for correctness-critical paths.
"""

from __future__ import annotations

import numpy as np

from crawler_ray.functions.hashing import md5_u64_batch


def keys_to_u64(keys) -> np.ndarray:
    """Normalize a batch of string/bytes keys to uint64 via md5 (stable)."""
    if isinstance(keys, np.ndarray) and keys.dtype == np.uint64:
        return keys
    return md5_u64_batch(list(keys))


class BloomFilter:
    """Plain Bloom filter, k derived from bits-per-key; batch add/contains."""

    def __init__(self, capacity: int, bits_per_key: int = 10):
        self.capacity = capacity
        self.n_bits = 1 << int(np.ceil(np.log2(max(64, capacity * bits_per_key))))
        self.k = max(1, int(round(bits_per_key * 0.693)))
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        # double hashing: h1 + i*h2 (Kirsch–Mitzenmacher)
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).astype(np.int64)

    def add(self, h: np.ndarray) -> None:
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    def state(self) -> dict:
        return {"capacity": self.capacity, "k": self.k, "bits": self.bits}

    @classmethod
    def from_state(cls, st: dict) -> "BloomFilter":
        f = cls.__new__(cls)
        f.capacity = int(st["capacity"])
        f.k = int(st["k"])
        # copy: state may arrive zero-copy (read-only) from the object store
        f.bits = np.array(st["bits"], dtype=np.uint8, copy=True)
        f.n_bits = f.bits.size * 8
        return f


class CuckooFilter:
    """Bucketized cuckoo filter (Fan et al., CoNEXT'14): 4-slot buckets,
    16-bit fingerprints, partial-key cuckoo hashing. Batch ``contains`` is
    fully vectorized; insert loops only over missing keys."""

    SLOTS = 4
    MAX_KICKS = 500

    STASH_LIMIT = 128

    def __init__(self, capacity: int, seed: int = 7):
        n_buckets = 1 << int(np.ceil(np.log2(max(16, capacity // self.SLOTS))))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)  # 0 = empty
        self.count = 0
        # victim stash: a failed kick loop leaves one *previously inserted*
        # fingerprint homeless; dropping it would create a false negative.
        # Stash (bucket_idx, fp) pairs; `full` flips when the stash saturates
        # and the caller should route new keys to its bloom fallback.
        self.stash: list[tuple[int, int]] = []
        self.full = False
        self._rng = np.random.Generator(np.random.PCG64(seed))

    # fingerprint: low 16 bits of the key hash, avoiding 0 (the empty marker)
    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return ((h >> np.uint64(16)) % np.uint64(self.n_buckets)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # alt index = i1 xor hash(fp); multiply-shift hash of the fingerprint
        fh = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFF)
        return (i1 ^ fh.astype(np.int64)) % self.n_buckets

    def contains(self, h: np.ndarray) -> np.ndarray:
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        for idx_s, fp_s in self.stash:
            hit |= (fp == fp_s) & ((i1 == idx_s) | (i2 == idx_s))
        return hit

    def _insert_one(self, i1: int, i2: int, fp: int) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # kick loop
        idx = int(i1 if self._rng.integers(2) else i2)
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            fh = (fp * 0x5BD1E995) & 0xFFFFFFFF
            idx = (idx ^ fh) % self.n_buckets
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self.count += 1
                return True
        # homeless VICTIM fingerprint (already-inserted key) → stash it so no
        # false negative appears; the new key was placed during the kicks.
        self.stash.append((idx, fp))
        self.count += 1
        if len(self.stash) >= self.STASH_LIMIT:
            self.full = True
        return True

    def add(self, h: np.ndarray) -> np.ndarray:
        """Insert each key; returns a bool mask of successful inserts. Keys
        rejected (``full`` filter) must go to the caller's fallback filter."""
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        ok = np.empty(h.size, dtype=bool)
        for j in range(h.size):
            if self.full:
                ok[j] = False
                continue
            ok[j] = self._insert_one(int(i1[j]), int(i2[j]), int(fp[j]))
        return ok

    @property
    def load_factor(self) -> float:
        return self.count / (self.n_buckets * self.SLOTS)

    def state(self) -> dict:
        return {
            "table": self.table,
            "count": self.count,
            "stash": list(self.stash),
            "full": self.full,
        }

    @classmethod
    def from_state(cls, st: dict, seed: int = 7) -> "CuckooFilter":
        f = cls.__new__(cls)
        # copy: state may arrive zero-copy (read-only) from the object store
        f.table = np.array(st["table"], dtype=np.uint16, copy=True)
        f.n_buckets = f.table.shape[0]
        f.count = int(st["count"])
        f.stash = [tuple(x) for x in st.get("stash", [])]
        f.full = bool(st.get("full", False))
        f._rng = np.random.Generator(np.random.PCG64(seed))
        return f
