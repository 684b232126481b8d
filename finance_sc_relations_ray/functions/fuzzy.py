"""Fuzzy entity recovery + sampling/splitting helpers (training-data
preparation operators, SURVEY.md §2.2 M15 / §2.7 O4-O6)."""

from __future__ import annotations

import random
import zlib
from collections import defaultdict


def hamming_score(query: str, text: str) -> float:
    """Normalized character-overlap composite used by the reference's
    fuzzy entity recovery (src/utils/preprocess.py:22-48 semantics):
    positional character agreement over the shorter length, blended with
    a length ratio."""
    if not query or not text:
        return 0.0
    q, t = query.lower(), text.lower()
    m = min(len(q), len(t))
    agree = sum(1 for i in range(m) if q[i] == t[i])
    return 0.5 * (agree / m) + 0.5 * (m / max(len(q), len(t)))


def hamming_search(query: str, candidates: list[str], threshold: float = 0.6):
    """Best candidate above threshold, else None
    (preprocess.py:22-48: accept max > 0.6)."""
    if not candidates:
        return None
    scored = sorted(
        ((hamming_score(query, c), c) for c in candidates),
        key=lambda x: (-x[0], x[1]),
    )
    best_score, best = scored[0]
    return best if best_score > threshold else None


def _rng(seed_key: str) -> random.Random:
    return random.Random(zlib.crc32(seed_key.encode("utf-8")))


def stratified_doc_split(
    doc_ids: list[int],
    strata: list[str],
    valid_frac: float = 0.2,
    seed_key: str = "split-42",
) -> dict[int, str]:
    """Doc-level stratified train/valid split (reference
    src/utils/preprocess.py:397-447: split at document granularity,
    stratified by label, then rows expand back). Deterministic: the
    within-stratum shuffle is the md5 order of ``seed|stratum|doc_id``
    — a stateless pseudo-random permutation, so the assignment is
    independent of input order AND SQL-checkable (row_number() over
    the same md5 order; see oracle_sql). Returns doc_id →
    'train'|'valid'."""
    import hashlib

    by_stratum: dict[str, list[int]] = defaultdict(list)
    for d, s in zip(doc_ids, strata):
        by_stratum[s].append(d)
    out: dict[int, str] = {}
    for s in sorted(by_stratum):
        ids = sorted(by_stratum[s])
        ids.sort(
            key=lambda d: (
                hashlib.md5(f"{seed_key}|{s}|{d}".encode("utf-8")).hexdigest(),
                d,
            )
        )
        n_valid = int(round(len(ids) * valid_frac))
        for i, d in enumerate(ids):
            out[d] = "valid" if i < n_valid else "train"
    return out


def hash_split(key, valid_frac: float = 0.2, seed_key: str = "split-42") -> str:
    """Stateless doc-level split: ``valid`` iff
    ``crc32(seed|key) / 2^32 < valid_frac``. A pure function of the key,
    so the assignment needs NO driver-side map, no broadcast, and no
    shuffle — and is independent of Ray block boundaries (the round-1
    broadcast-dict split depended on them). Because the hash is
    independent of any label, every stratum's valid fraction
    concentrates to ``valid_frac`` (hash-stratified); for exact small-n
    per-stratum counts use ``stratified_doc_split``."""
    h = zlib.crc32(f"{seed_key}|{key}".encode("utf-8"))
    return "valid" if h < valid_frac * 4294967296.0 else "train"


def md5_hash_split(
    key, valid_frac: float = 0.2, seed_key: str = "split-42"
) -> str:
    """``hash_split`` with md5 as the hash so the assignment is
    SQL-expressible (DuckDB: ``('0x' || substr(md5(seed||'|'||key),1,8))
    ::UBIGINT < frac * 2^32``) and oracle-checkable end-to-end. Same
    stateless no-broadcast/no-shuffle property as ``hash_split``; use
    the crc32 variant where speed matters and this one where parity
    must be provable."""
    import hashlib

    h = int(
        hashlib.md5(f"{seed_key}|{key}".encode("utf-8")).hexdigest()[:8], 16
    )
    return "valid" if h < valid_frac * 4294967296.0 else "train"


def k_fold_assign(
    doc_ids: list[int], k: int = 5, seed_key: str = "fold-42"
) -> dict[int, int]:
    """Simple deterministic k-fold assignment (seeded shuffle then
    round-robin). See ``weighted_k_fold`` for the reference's per-class
    weighted slicing."""
    ids = sorted(doc_ids)
    _rng(seed_key).shuffle(ids)
    return {d: i % k for i, d in enumerate(ids)}


def weighted_k_fold(
    doc_ids: list,
    strata: list[str],
    k: int = 5,
    seed_key: str = "fold-42",
) -> dict:
    """Per-class weighted k-fold (reference
    src/data_cleansing/cross_cleaner.py:119-141): per stratum s with
    weight w_s = |s|/N, each of the first k-1 folds takes a contiguous
    slice of ``int((N/k) * w_s)`` of that stratum's docs and the LAST
    fold takes the remainder — every fold mirrors the global class
    mix. The reference slices in input order (load-order dependent);
    we seed-shuffle within stratum first so the assignment is
    deterministic and independent of row arrival order. Returns
    doc_id → fold index."""
    by_stratum: dict[str, list] = defaultdict(list)
    for d, s in zip(doc_ids, strata):
        by_stratum[s].append(d)
    n = len(doc_ids)
    fold_num = n // k
    out: dict = {}
    for s in sorted(by_stratum):
        ids = sorted(by_stratum[s])
        _rng(f"{seed_key}|{s}").shuffle(ids)
        w = int(fold_num * (len(ids) / n))
        for i in range(k):
            chunk = ids[w * i :] if i == k - 1 else ids[w * i : w * (i + 1)]
            for d in chunk:
                out[d] = i
    return out


def negative_sample(
    items: list, max_others: int, seed_key: str
) -> list:
    """Cap "other"-class pairs with a seeded sample (reference
    src/labels_generator/data_aggregation.py:250-253 uses unseeded
    random.sample — a documented nondeterminism we fix)."""
    if len(items) <= max_others:
        return list(items)
    return _rng(seed_key).sample(list(items), max_others)
