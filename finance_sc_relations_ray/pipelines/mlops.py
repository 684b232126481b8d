"""Training-data preparation operators (SURVEY.md §2.6 A4, §2.7 O4-O6,
§2.8 embedding near-dup) as distributed queries with DuckDB oracles
where SQL-expressible."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ..functions.fuzzy import stratified_doc_split
from ..functions.rounding import round_half_away
from ..functions.textops import token_count


def _read(sf_dir: str, table: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def segment_class_weights(sf_dir: str) -> pd.DataFrame:
    """Normalized class weights from value counts (reference
    preprocessing_funcs.py:390-400 semantics on a neutral column)."""
    counts = (
        _read(sf_dir, "customer", ["c_mktsegment"])
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    total = counts["n"].sum()
    counts["weight"] = round_half_away(counts["n"] / total, 6)
    return counts.sort_values("c_mktsegment").reset_index(drop=True)


def token_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """0.95 / 0.99 token-length quantiles — the reference's max_len
    sizing statistic (sc_classifier/trainer.py:212).

    Distributed EXACT form: token lengths are small integers, so each
    batch combines to a (n_tokens → count) histogram, a bounded
    groupby merges the partials, and the linear-interpolated quantile
    (identical to numpy 'linear' / DuckDB quantile_cont) is computed
    from cumulative counts on the driver — the only thing ever
    materialized is the histogram (≤ distinct lengths rows), never the
    per-document vector (which at 10^12 docs IS the dataset)."""

    def hist(batch: pa.Table) -> pa.Table:
        vals: dict[int, int] = {}
        for t in batch["text"].to_pylist():
            n = token_count(t)
            vals[n] = vals.get(n, 0) + 1
        return pa.table(
            {
                "n_tokens": pa.array(list(vals.keys()), pa.int64()),
                "c": pa.array(list(vals.values()), pa.int64()),
            }
        )

    h = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(hist, batch_format="pyarrow")
        .groupby("n_tokens")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("n_tokens")
        .reset_index(drop=True)
    )
    values = h["n_tokens"].to_numpy()
    counts = h["c"].to_numpy()
    cum = np.cumsum(counts)
    n_total = int(cum[-1])

    def interp_quantile(q: float) -> float:
        # numpy 'linear': value at fractional order-statistic q*(N-1)
        pos = q * (n_total - 1)
        lo_idx, frac = int(np.floor(pos)), pos - np.floor(pos)
        lo = values[np.searchsorted(cum, lo_idx + 1)]
        hi = values[np.searchsorted(cum, min(lo_idx + 1, n_total - 1) + 1)]
        return float(lo) + frac * (float(hi) - float(lo))

    q95, q99 = interp_quantile(0.95), interp_quantile(0.99)
    return pd.DataFrame(
        {"quantile": [0.95, 0.99],
         "n_tokens": round_half_away(np.array([q95, q99]), 6)}
    )


def stratified_split_documents(sf_dir: str, valid_frac: float = 0.2) -> pd.DataFrame:
    """Deterministic doc-level stratified split by lang (O4). Seeded —
    not SQL-expressible; checked by its own pytest invariants."""
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    )
    ids = t["doc_id"].to_pylist()
    langs = t["lang"].to_pylist()
    assign = stratified_doc_split(ids, langs, valid_frac)
    out = pd.DataFrame(
        {"doc_id": ids, "lang": langs, "split": [assign[d] for d in ids]}
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def hash_split_documents(sf_dir: str, valid_frac: float = 0.2) -> pd.DataFrame:
    """Stateless hash-based doc split (O4's 100-TB form): the assignment
    is a pure function of ``doc_id`` computed inside ``map_batches`` —
    no driver map, no broadcast, no shuffle, independent of block
    boundaries. Uses the md5 variant so a DuckDB oracle can verify the
    exact per-document assignment (see ``oracle_sql``)."""
    from ..functions.fuzzy import md5_hash_split

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "split": pa.array(
                    [md5_hash_split(d, valid_frac) for d in ids], pa.string()
                ),
            }
        )

    out = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(assign, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs (vec_id_a < vec_id_b with cosine
    ≥ threshold). The full matrix is broadcast once (small side); each
    batch emits only its above-threshold pairs — at scale the broadcast
    side becomes the LSH-bucketed index (similarity.lsh_bucketed_knn)."""
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            m = np.stack(batch["embedding"].to_pandas().to_numpy()).astype(np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ self.mat.T
            rows_a, rows_b, cos = [], [], []
            for i, va in enumerate(vids):
                hit = np.flatnonzero((sims[i] >= threshold) & (self.ids > va))
                rows_a.extend([va] * len(hit))
                rows_b.extend(self.ids[hit].tolist())
                cos.extend(sims[i][hit].tolist())
            return pa.table(
                {
                    "vec_id_a": pa.array(rows_a, pa.int64()),
                    "vec_id_b": pa.array(rows_b, pa.int64()),
                    "cosine": pa.array(np.round(cos, 6), pa.float64()),
                }
            )

    out = (
        _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(PairFinder, batch_format="pyarrow",
                     concurrency=(1, 4), num_cpus=0.5)
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {"vec_id_a": pd.Series([], dtype="int64"),
             "vec_id_b": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}
        )
    return out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


def sample_documents_consistent(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Deterministic uniform k-sample: keep the k documents with the
    SMALLEST md5(seed|doc_id) — a consistent ("bottom-k") sample. Fully
    distributed and mergeable: each batch emits only its local k
    smallest hashes, the driver reduce sees ≤ k × n_batches rows, and
    the result is independent of partitioning, batch order and
    parallelism (unlike reservoir sampling, whose state depends on
    arrival order). Also composable: the union of two tables' bottom-k
    samples contains the union's bottom-k. Oracle: ORDER BY md5 LIMIT k
    — exact."""
    import hashlib

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = [
            hashlib.md5(f"sample-42|{d}".encode("utf-8")).hexdigest()
            for d in ids
        ]
        order = sorted(range(len(ids)), key=lambda i: hs[i])[:k]
        return pa.table(
            {
                "doc_id": pa.array([ids[i] for i in order], pa.int64()),
                "h": pa.array([hs[i] for i in order], pa.string()),
            }
        )

    cand = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    out = cand.sort_values("h").head(k)[["doc_id"]]
    return out.sort_values("doc_id").reset_index(drop=True)
