"""Misra-Gries heavy-hitters sketch (Misra & Gries 1982; merge rule
from Agarwal et al., "Mergeable Summaries", PODS 2012).

Guarantee: after summarizing a stream of n items with capacity k, every
item with true frequency > n/k is present in the sketch, and estimates
undercount by at most n/k. Sketches MERGE associatively, so each batch
builds one locally and a small reduce combines them — the sketch-shaped
aggregation pattern from ray_guide 'Aggregation at scale'. The exact
heavy-hitter query (`relational.heavy_hitter_tokens`) is the verifier;
the sketch is the 100 TB path where exact per-token counting is a
shuffle too far."""

from __future__ import annotations


class MisraGries:
    def __init__(self, k: int = 1024):
        self.k = k
        self.counts: dict[str, int] = {}
        self.n = 0

    def add(self, item: str, weight: int = 1) -> None:
        self.n += weight
        c = self.counts
        if item in c:
            c[item] += weight
            return
        # classic MG step, looped until the full weight is absorbed: a
        # weighted add either lands in a free slot or decrements every
        # counter by min(remaining, min_count); dropped zeros free a
        # slot for the residual, preserving the ≤ n/k undercount bound
        # even for weight ≫ 1.
        while weight > 0:
            if len(c) < self.k - 1:
                c[item] = weight
                return
            dec = min(weight, min(c.values()))
            for key in list(c.keys()):
                c[key] -= dec
                if c[key] <= 0:
                    del c[key]
            weight -= dec

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.k)
        out.n = self.n + other.n
        merged = dict(self.counts)
        for item, cnt in other.counts.items():
            merged[item] = merged.get(item, 0) + cnt
        if len(merged) >= out.k:
            # keep top k-1 by count, subtracting the k-th largest
            # (mergeable-summaries reduction)
            ordered = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))
            cut = ordered[out.k - 1][1] if len(ordered) >= out.k else 0
            merged = {
                item: cnt - cut
                for item, cnt in ordered[: out.k - 1]
                if cnt - cut > 0
            }
        out.counts = merged
        return out

    def candidates(self, min_fraction: float) -> list[str]:
        """Items that MAY exceed ``min_fraction`` of the stream — a
        SUPERSET of the true heavy hitters when k > 1/min_fraction."""
        floor = self.n * min_fraction - self.n / self.k
        return sorted(i for i, c in self.counts.items() if c >= floor)


class HyperLogLog:
    """HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007),
    mergeable by per-register max — the approximate counterpart of the
    exact ``relational.distinct_user_count`` (its verifier). ``2^p``
    one-byte registers bound sketch size regardless of cardinality;
    standard error ≈ 1.04/sqrt(2^p) (~1.6% at p=12). Deterministic
    md5-derived 64-bit hash, so runs reproduce bit-identically.

    Small-range correction: linear counting when the raw estimate is
    below 2.5·m and empty registers remain (the original paper's
    regime switch); no large-range correction is needed with 64-bit
    hashes."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = bytearray(self.m)

    def add(self, item) -> None:
        import hashlib

        h = int.from_bytes(
            hashlib.md5(str(item).encode("utf-8")).digest()[:8], "big"
        )
        idx = h >> (64 - self.p)
        rest = h << self.p & ((1 << 64) - 1)
        # rank = leading zeros of the remaining 64-p bits, +1
        rank = 1
        bit = 1 << 63
        while rank <= 64 - self.p and not (rest & bit):
            rest <<= 1
            rank += 1
        if rank > self.registers[idx]:
            self.registers[idx] = rank

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = bytearray(
            max(a, b) for a, b in zip(self.registers, other.registers)
        )
        return out

    def estimate(self) -> float:
        import math

        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / sum(2.0 ** -r for r in self.registers)
        zeros = self.registers.count(0)
        if raw <= 2.5 * m and zeros:
            return m * math.log(m / zeros)
        return raw

    def to_bytes(self) -> bytes:
        return bytes(self.registers)

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        out = cls(p)
        out.registers = bytearray(data)
        return out
