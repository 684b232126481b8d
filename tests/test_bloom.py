"""Bloom filter: no false negatives, bounded false positives, compact
vs the raw key set."""

import sys

from finance_sc_relations_ray.functions.bloom import BloomFilter


def test_no_false_negatives_and_fp_bound():
    keys = [f"https://example{i}.com/page/{i}" for i in range(20_000)]
    bf = BloomFilter.build(keys, fp_rate=0.01)
    assert all(k in bf for k in keys)  # no false negatives, ever
    probes = [f"https://absent{i}.org/x/{i}" for i in range(20_000)]
    fp = sum(1 for p in probes if p in bf) / len(probes)
    assert fp < 0.03, fp


def test_compactness():
    keys = [f"https://example{i}.com/page/{i}" for i in range(50_000)]
    bf = BloomFilter.build(keys)
    raw = sum(sys.getsizeof(k) for k in keys)
    assert bf.nbytes < raw / 20  # ≥20× smaller than the string set


def test_deterministic_across_builds():
    keys = [str(i) for i in range(1000)]
    a, b = BloomFilter.build(keys), BloomFilter.build(keys)
    assert (a.bits == b.bits).all()
