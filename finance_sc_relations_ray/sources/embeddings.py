"""Deterministic synthetic embedding tables with SKEWED cluster
structure — the SemDeDup-regime fixture (r3 verdict #8): the driver's
sf tables top out at 2k vectors, far below the "k scales with the
corpus" regime the paper's k≈110k targets, and their label column is
not geometric. This generator plants Zipf-sized clusters so the
``groupby(cluster)`` exchange in ``semantic_dedup_ds`` sees a genuinely
hot key and the within-cluster O(m²) prune sees a realistic m.

Same input-hint shape as ``sf_dir/embeddings.parquet``
(vec_id int64, embedding list<float32>[d], label int32 = planted
center), deterministic in (n, d, n_centers, seed) — repeated runs and
both bench parallelism levels read identical bytes (the
``pages_parquet_for`` caching contract)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate_skewed_embeddings(
    n_vecs: int,
    d: int = 64,
    n_centers: int = 300,
    seed: int = 42,
    noise: float = 0.02,
    zipf_a: float = 1.2,
) -> pa.Table:
    """Unit-ish vectors around ``n_centers`` random unit centers with
    Zipf(``zipf_a``) cluster sizes (rank-1 center holds ~1/H(n_centers)
    of all rows — the hot-key case). ``noise=0.02`` keeps within-center
    cosines ≈0.99 (the noise VECTOR norm is σ·√d ≈ 0.16, so cos ≈
    1/√(1+0.16²) — above the usual 0.95 dedup eps, so pruning fires)
    while cross-center cosines stay near 0. vec_ids are a seeded
    permutation, so
    ids are uncorrelated with clusters (greedy keep-lowest-id picks a
    'random' representative, as in the paper)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_centers, d)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    weights = 1.0 / np.arange(1, n_centers + 1) ** zipf_a
    weights /= weights.sum()
    sizes = np.floor(weights * n_vecs).astype(np.int64)
    # distribute the rounding remainder to the largest clusters
    for i in range(int(n_vecs - sizes.sum())):
        sizes[i % n_centers] += 1
    labels = np.repeat(np.arange(n_centers, dtype=np.int32), sizes)
    vecs = centers[labels] + noise * rng.randn(n_vecs, d)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    order = rng.permutation(n_vecs)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(
                    vecs[order].astype(np.float32).reshape(-1),
                    pa.float32(),
                ),
                d,
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(labels[order], pa.int32()),
        }
    )


def embeddings_parquet_for(
    n_vecs: int,
    d: int = 64,
    n_centers: int = 300,
    seed: int = 42,
    out_dir: str | None = None,
    zipf_a: float = 1.2,
) -> str:
    """Materialize (once, cached) a skewed embedding table and return
    its SF-DIR (the directory containing ``embeddings.parquet``), so
    every ``mlops`` operator accepts it as a drop-in ``sf_dir``."""
    out_dir = out_dir or (
        f"/tmp/fscr_emb/n{n_vecs}-d{d}-c{n_centers}-s{seed}-a{zipf_a}"
    )
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.isfile(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(
        generate_skewed_embeddings(
            n_vecs, d, n_centers, seed, zipf_a=zipf_a
        ),
        tmp,
        row_group_size=4096,
    )
    os.replace(tmp, path)  # atomic: concurrent bench levels can race
    return out_dir
