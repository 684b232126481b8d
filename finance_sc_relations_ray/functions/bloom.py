"""Compact Bloom filter for broadcast semi/anti joins.

At 10^12-row scale a raw key SET is too large to broadcast; a Bloom
filter at ~10 bits/key (<1% false positives) ships a key-membership
summary in ~1/30 the bytes (ray_guide 'Joins and lookups': "broadcast
the key set (or a Bloom filter of it)"). Semi-joins stay exact when
false positives are acceptable or re-checked downstream; anti-joins
use the no-false-NEGATIVE guarantee (a key reported absent is truly
absent).

Deterministic hashing (crc32 double-hashing, Kirsch-Mitzenmacher 2006)
— stable across processes.
"""

from __future__ import annotations

import math
import zlib

import numpy as np


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, capacity)
        self.m = max(8, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.k = max(1, int(round(self.m / capacity * math.log(2))))
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def _hashes(self, key: str) -> list[int]:
        data = key.encode("utf-8")
        h1 = zlib.crc32(data)
        h2 = zlib.crc32(data, 0x9E3779B9) | 1
        return [(h1 + i * h2) % self.m for i in range(self.k)]

    def add(self, key: str) -> None:
        for h in self._hashes(key):
            self.bits[h >> 3] |= 1 << (h & 7)

    def __contains__(self, key: str) -> bool:
        return all(
            self.bits[h >> 3] & (1 << (h & 7)) for h in self._hashes(key)
        )

    @classmethod
    def build(cls, keys, fp_rate: float = 0.01) -> "BloomFilter":
        keys = list(keys)
        bf = cls(len(keys), fp_rate)
        for k in keys:
            bf.add(str(k))
        return bf

    @property
    def nbytes(self) -> int:
        return int(self.bits.nbytes)
