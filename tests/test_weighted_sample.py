"""Weighted consistent sample (A-ES): SQL parity runs in the oracle
gate; these tests pin the sampling-theory properties the SQL can't
express."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from finance_sc_relations_ray.pipelines.mlops import (
    sample_documents_weighted,
)


def _key(doc_id: int, w: float) -> float:
    h = int(
        hashlib.md5(f"wsample-42|{doc_id}".encode("utf-8")).hexdigest()[:8],
        16,
    )
    return ((h + 0.5) / 4294967296.0) ** (1.0 / w)


def _write_docs(tmp_path, n_chars_by_id):
    ids = sorted(n_chars_by_id)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["x" * n_chars_by_id[i] for i in ids]),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["src1"] * len(ids)),
            "n_chars": pa.array([n_chars_by_id[i] for i in ids], pa.int64()),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")


def test_matches_local_replica_and_is_weight_biased(ray_session, tmp_path):
    """Exact top-k-by-key parity with a local replica, and the
    weighting actually bites: with 100 heavy docs (w=10000) and 900
    light docs (w=10), the k=100 sample must be dominated by heavy
    docs (A-ES inclusion probability rises with weight)."""
    rng = np.random.RandomState(3)
    n_chars = {i: (10_000 if i < 100 else 10) for i in range(1000)}
    _write_docs(tmp_path, n_chars)
    got = sample_documents_weighted(str(tmp_path), k=100)["doc_id"].tolist()
    keys = {i: _key(i, n_chars[i]) for i in n_chars}
    exp = sorted(sorted(keys, key=lambda i: -keys[i])[:100])
    assert got == exp
    heavy = sum(1 for d in got if d < 100)
    assert heavy > 80, heavy  # ~uniform would give ~10


def test_shard_topk_merge_equals_global(ray_session, tmp_path):
    """Mergeability: the global sample equals the top-k over the union
    of per-shard top-ks — the property that makes the combiner-first
    distributed plan correct under ANY partitioning."""
    n_chars = {i: 10 + (i * 37) % 500 for i in range(500)}
    _write_docs(tmp_path, n_chars)
    got = sample_documents_weighted(str(tmp_path), k=50)["doc_id"].tolist()
    keys = {i: _key(i, n_chars[i]) for i in n_chars}
    shards = [list(range(s, 500, 7)) for s in range(7)]
    pooled = []
    for shard in shards:
        pooled.extend(sorted(shard, key=lambda i: -keys[i])[:50])
    exp = sorted(sorted(pooled, key=lambda i: -keys[i])[:50])
    assert got == exp
