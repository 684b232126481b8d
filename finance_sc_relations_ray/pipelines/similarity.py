"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the exact baseline: the (tiny) query matrix
is broadcast via ``ray.put`` once; each batch computes a float64 matmul
and emits only its LOCAL top-k rows per query (per-batch combiner), so
the final per-query reduction sees ≤ k × n_batches rows — the scale
path swaps the per-batch scan for an IVF/LSH bucket probe with the same
output contract (see ``lsh_bucketed_knn``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..sources.io import sized_read_parquet


def _read(sf_dir: str) -> "ray.data.Dataset":
    return sized_read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def _query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, list[int]]:
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    df = t.to_pandas().sort_values("vec_id").head(n_queries)
    q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return q, df["vec_id"].tolist()


def knn_cosine(sf_dir: str, n_queries: int = 8, k: int = 5) -> pd.DataFrame:
    """For the first ``n_queries`` vec_ids (the query set): top-k most
    cosine-similar OTHER vectors. Output (query_id, rank, vec_id,
    cosine) with rank by (cosine desc, vec_id asc) — deterministic and
    mirrored by the DuckDB oracle."""
    qmat, qids = _query_matrix(sf_dir, n_queries)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    q_ref = ray.put((qnorm, qids))

    class LocalTopK:
        def __init__(self):
            self.q, self.qids = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            m = np.stack(
                batch["embedding"].to_pandas().to_numpy()
            ).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = self.q @ m.T  # (n_queries, batch)
            out_q, out_v, out_c = [], [], []
            for i, qid in enumerate(self.qids):
                mask = vids != qid  # exclude self
                order = np.lexsort((vids[mask], -sims[i][mask]))[:k]
                sel = np.flatnonzero(mask)[order]
                out_q.extend([qid] * len(sel))
                out_v.extend(vids[sel].tolist())
                out_c.extend(sims[i][sel].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    partials = _read(sf_dir).map_batches(
        LocalTopK, batch_format="pyarrow", concurrency=(1, 4), num_cpus=0.5
    ).to_pandas()
    # final reduction: tiny (≤ k × n_batches × n_queries rows)
    partials = partials.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    top = partials.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    top["cosine"] = top["cosine"].round(6)
    return top[["query_id", "rank", "vec_id", "cosine"]].reset_index(drop=True)


def lsh_bucketed_knn(
    sf_dir: str, n_queries: int = 8, k: int = 5, n_planes: int = 8
) -> pd.DataFrame:
    """Approximate scale path: random-hyperplane LSH — only vectors
    whose sign-bucket matches a query's bucket are scored (candidate
    pruning), then exact cosine on candidates. Deterministic planes
    (seed 42). Same output columns as knn_cosine; recall measured in
    tests, not guaranteed 100%."""
    qmat, qids = _query_matrix(sf_dir, n_queries)
    dim = qmat.shape[1]
    rng = np.random.RandomState(42)
    planes = rng.normal(size=(n_planes, dim))
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qbuckets = (qnorm @ planes.T > 0).astype(np.uint8)
    q_ref = ray.put((qnorm, qids, planes, qbuckets))

    class BucketTopK:
        def __init__(self):
            self.q, self.qids, self.planes, self.qb = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            m = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            mb = (m @ self.planes.T > 0).astype(np.uint8)
            out_q, out_v, out_c = [], [], []
            for i, qid in enumerate(self.qids):
                cand = np.flatnonzero(
                    ((mb == self.qb[i]).all(axis=1)) & (vids != qid)
                )
                if len(cand) == 0:
                    continue
                sims = m[cand] @ self.q[i]
                order = np.lexsort((vids[cand], -sims))[:k]
                sel = cand[order]
                out_q.extend([qid] * len(sel))
                out_v.extend(vids[sel].tolist())
                out_c.extend(sims[order].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    partials = _read(sf_dir).map_batches(
        BucketTopK, batch_format="pyarrow", concurrency=(1, 4), num_cpus=0.5
    ).to_pandas()
    if len(partials) == 0:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64"),
             "vec_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    partials = partials.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    top = partials.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    top["cosine"] = top["cosine"].round(6)
    return top[["query_id", "rank", "vec_id", "cosine"]].reset_index(drop=True)


def _train_coarse_centroids(
    mat: np.ndarray, n_lists: int, iters: int = 5, seed: int = 42
) -> np.ndarray:
    """Deterministic mini k-means (fixed seed + iteration count) for
    the IVF coarse quantizer. Empty clusters re-seed from the farthest
    points so every list stays populated."""
    rng = np.random.RandomState(seed)
    n = len(mat)
    cent = mat[rng.choice(n, size=min(n_lists, n), replace=False)].copy()
    for _ in range(iters):
        sims = mat @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
            else:
                cent[c] = mat[int(sims.max(axis=1).argmin())]
    return cent


def ivf_knn(
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
) -> pd.DataFrame:
    """IVF scale path (the FAISS-IVF shape of reference
    src/matcher/core.py's `faiss_fast` variant, model-free): a tiny
    deterministic k-means codebook is trained on a bounded sample and
    broadcast; each batch assigns its vectors to their nearest centroid
    VECTORIZED and scores only the rows whose list one of the query's
    ``n_probe`` nearest lists probes — candidate pruning without any
    shuffle, same local-top-k combiner + tiny driver reduce as the
    exact path. At 10^12 rows only the codebook training reads a
    sample; the scan stays one streaming pass."""
    qmat, qids = _query_matrix(sf_dir, n_queries)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    # bounded training sample (whole table here; .limit() sample at scale)
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    sample = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cent = _train_coarse_centroids(sample, n_lists)
    # per-query probed lists
    probes = np.argsort(-(qnorm @ cent.T), axis=1)[:, :n_probe]
    q_ref = ray.put((qnorm, qids, cent, probes))

    class IvfTopK:
        def __init__(self):
            self.q, self.qids, self.cent, self.probes = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            m = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            lists = (m @ self.cent.T).argmax(axis=1)
            out_q, out_v, out_c = [], [], []
            for i, qid in enumerate(self.qids):
                cand = np.flatnonzero(
                    np.isin(lists, self.probes[i]) & (vids != qid)
                )
                if len(cand) == 0:
                    continue
                sims = m[cand] @ self.q[i]
                order = np.lexsort((vids[cand], -sims))[:k]
                sel = cand[order]
                out_q.extend([qid] * len(sel))
                out_v.extend(vids[sel].tolist())
                out_c.extend(sims[order].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    partials = _read(sf_dir).map_batches(
        IvfTopK, batch_format="pyarrow", concurrency=(1, 4), num_cpus=0.5
    ).to_pandas()
    if len(partials) == 0:
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int64"),
             "vec_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    partials = partials.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    top = partials.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    top["cosine"] = top["cosine"].round(6)
    return top[["query_id", "rank", "vec_id", "cosine"]].reset_index(drop=True)
