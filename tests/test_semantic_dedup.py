"""Exact local oracles for the iterative embedding operators
(k-means, SemDeDup): the integer-quantized formulation makes the
distributed fit bit-identical to a single-process NumPy replica, so
these tests assert EXACT equality of assignments and kept ids — the
same oracle style as unigram_logprob, for an algorithm SQL can't
express (hence pytest-oracled in the driver gate)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines.mlops import (
    _EMB_SCALE,
    kmeans_embeddings,
    semantic_dedup,
)

SF = "/root/testdata/sf0.01"


def _unit(q: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(q, axis=1, keepdims=True)
    return np.divide(q, n, out=np.zeros_like(q), where=n > 0)


def _load_ints(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    return vids, np.rint(m * _EMB_SCALE).astype(np.int64)


def _ref_maximin(sample: np.ndarray, k: int) -> np.ndarray:
    chosen = [0]
    best = sample @ sample[0]
    for _ in range(k - 1):
        nxt = int(best.argmin())
        chosen.append(nxt)
        best = np.maximum(best, sample @ sample[nxt])
    return sample[chosen].copy()


def _ref_kmeans(sf_dir: str, k: int, iters: int) -> pd.DataFrame:
    """Single-process Lloyd's replica of pipelines.mlops.kmeans_fit:
    same maximin init over the 2048 lowest vec_ids, same integer
    sums, same spherical update, same first-max tie break."""
    vids, ints = _load_ints(sf_dir)
    order = np.argsort(vids, kind="stable")
    vids, ints = vids[order], ints[order]
    sample = _unit(ints[:2048].astype(np.float64) / _EMB_SCALE)
    cent = _ref_maximin(sample, k)
    mn = _unit(ints.astype(np.float64) / _EMB_SCALE)
    for _ in range(iters):
        a = (mn @ cent.T).argmax(axis=1)
        new = cent.copy()
        for c in range(k):
            members = ints[a == c]
            if len(members):
                s = members.sum(axis=0, dtype=np.int64)
                new[c] = _unit(
                    (s.astype(np.float64) / (len(members) * _EMB_SCALE))[None]
                )[0]
        cent = new
    a = (mn @ cent.T).argmax(axis=1)
    return pd.DataFrame({"vec_id": vids, "cluster": a.astype(np.int32)}), cent


def test_kmeans_matches_local_replica_exactly(ray_session):
    got = kmeans_embeddings(SF, k=10, iters=5)
    exp, _ = _ref_kmeans(SF, k=10, iters=5)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )


def test_kmeans_recovers_planted_clusters(ray_session, tmp_path):
    """Planted geometry (the sf tables' label column is NOT geometric —
    members average cosine ~0.14 to their label centroid, so it can't
    oracle a clustering): 10 well-separated centers × 20 noisy members
    must come back with purity 1.0, proving the operator clusters
    MEANING, not just that it is deterministic."""
    import pyarrow as pa

    rng = np.random.RandomState(7)
    centers = _unit(rng.randn(10, 64))
    vecs, labels = [], []
    for c in range(10):
        members = _unit(centers[c] + 0.03 * rng.randn(20, 64))
        vecs.extend(members)
        labels.extend([c] * 20)
    order = rng.permutation(200)  # ids uncorrelated with clusters
    tbl = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array(
                [np.asarray(vecs[i], dtype=np.float32) for i in order],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([labels[i] for i in order], pa.int32()),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    got = kmeans_embeddings(str(tmp_path), k=10, iters=5)
    df = got.assign(label=[labels[i] for i in order])
    purity = (
        df.groupby("cluster")["label"]
        .agg(lambda s: s.value_counts().iloc[0])
        .sum()
        / len(df)
    )
    assert purity == 1.0, purity


def test_semantic_dedup_matches_local_replica_exactly(ray_session):
    got = semantic_dedup(SF, k=10, iters=5, eps=0.95)
    exp_assign, _ = _ref_kmeans(SF, k=10, iters=5)
    vids, ints = _load_ints(SF)
    mn = _unit(ints.astype(np.float64) / _EMB_SCALE)
    by_vid = {v: i for i, v in enumerate(vids)}
    kept_rows = []
    for c, g in exp_assign.groupby("cluster"):
        idx = [by_vid[v] for v in sorted(g["vec_id"])]
        m = mn[idx]
        sims = m @ m.T
        kept: list[int] = []
        for i in range(len(idx)):
            if not kept or sims[i, kept].max() < 0.95:
                kept.append(i)
                kept_rows.append((vids[idx[i]], c))
    exp = (
        pd.DataFrame(kept_rows, columns=["vec_id", "cluster"])
        .astype({"cluster": "int32"})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_semantic_dedup_greedy_invariants(ray_session):
    """Structural invariants, independent of the replica: kept set is
    an eps-separated dominating set per cluster in greedy vec_id
    order."""
    kept = semantic_dedup(SF, k=10, iters=5, eps=0.95)
    assign, _ = _ref_kmeans(SF, k=10, iters=5)
    vids, ints = _load_ints(SF)
    mn = _unit(ints.astype(np.float64) / _EMB_SCALE)
    by_vid = {v: i for i, v in enumerate(vids)}
    kept_set = set(kept["vec_id"])
    for c, g in assign.groupby("cluster"):
        members = sorted(g["vec_id"])
        km = [v for v in members if v in kept_set]
        k_mat = mn[[by_vid[v] for v in km]]
        # pairwise eps-separation among kept
        if len(km) > 1:
            s = k_mat @ k_mat.T
            np.fill_diagonal(s, 0.0)
            assert s.max() < 0.95
        # every dropped member is eps-close to an EARLIER kept one
        for v in members:
            if v in kept_set:
                continue
            earlier = [u for u in km if u < v]
            e_mat = mn[[by_vid[u] for u in earlier]]
            assert len(earlier) and (e_mat @ mn[by_vid[v]]).max() >= 0.95


def test_semantic_dedup_cluster_cap_raises(ray_session):
    with pytest.raises(Exception, match="max_cluster"):
        from finance_sc_relations_ray.pipelines.mlops import semantic_dedup_ds

        semantic_dedup_ds(SF, k=1, iters=1, max_cluster=10).to_pandas()


def test_kmeans_refit_modes_bit_identical(ray_session):
    """r3 verdict #1: "reread" (the 100-TB default above the size
    gate) must be BIT-identical to "materialize" — same rows, exact
    integer sums, so the source mode cannot change the fit."""
    mat = kmeans_embeddings(SF, k=10, iters=5, refit_source="materialize")
    rr = kmeans_embeddings(SF, k=10, iters=5, refit_source="reread")
    pd.testing.assert_frame_equal(
        mat.reset_index(drop=True), rr.reset_index(drop=True)
    )


def test_kmeans_sample_fit_matches_replica_exactly(ray_session):
    """refit_source="sample" fits on the fit_sample_rows lowest-md5
    vec_ids (bounded, consistent); the local replica reproduces the
    selection + fit + full-corpus assignment exactly."""
    import hashlib

    from finance_sc_relations_ray.pipelines.mlops import kmeans_fit

    k, iters, n_sample = 10, 5, 256
    cent, quant = kmeans_fit(
        SF, k=k, iters=iters, refit_source="sample", fit_sample_rows=n_sample
    )

    vids, ints = _load_ints(SF)
    # replica of the maximin init (full-table lowest 2048 vec_ids —
    # init is mode-independent)
    sample0 = _unit(ints[:2048].astype(np.float64) / _EMB_SCALE)
    ref_cent = _ref_maximin(sample0, k)
    # replica of the bottom-k md5 sample selection
    hs = np.array(
        [hashlib.md5(f"kmfit-42|{v}".encode()).hexdigest() for v in vids]
    )
    sel = np.argsort(hs, kind="stable")[:n_sample]
    s_ints = ints[sel]
    s_mn = _unit(s_ints.astype(np.float64) / _EMB_SCALE)
    for _ in range(iters):
        a = (s_mn @ ref_cent.T).argmax(axis=1)
        new = ref_cent.copy()
        for c in range(k):
            members = s_ints[a == c]
            if len(members):
                s = members.sum(axis=0, dtype=np.int64)
                new[c] = _unit(
                    (s.astype(np.float64) / (len(members) * _EMB_SCALE))[None]
                )[0]
        ref_cent = new
    assert np.array_equal(cent, ref_cent)
    # the returned quant stream still covers the FULL corpus
    assert quant.count() == len(vids)


def test_semantic_dedup_reread_mode_exact(ray_session):
    """semantic_dedup under the scale-safe mode equals the
    materialized-mode output (both ride the bit-identical fit)."""
    a = semantic_dedup(SF, k=10, iters=5, eps=0.95, refit_source="materialize")
    b = semantic_dedup(SF, k=10, iters=5, eps=0.95, refit_source="reread")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_kmeans_unknown_refit_source_raises(ray_session):
    from finance_sc_relations_ray.pipelines.mlops import kmeans_fit

    with pytest.raises(ValueError, match="refit_source"):
        kmeans_fit(SF, refit_source="bogus")


def test_greedy_prune_blocked_equals_full():
    """The blocked memory-safe form of _greedy_prune (r3 verdict #8)
    must make decisions identical to the full-matrix form."""
    from finance_sc_relations_ray.pipelines.mlops import _greedy_prune

    rng = np.random.RandomState(11)
    m = rng.randn(500, 16)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    # inject near-dups so pruning fires
    m[100::50] = m[0] + 1e-4 * rng.randn(len(m[100::50]), 16)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    for eps in (0.5, 0.9, 0.999):
        full = _greedy_prune(m, eps, block=10**9)
        blocked = _greedy_prune(m, eps, block=64)
        assert full == blocked, eps


def test_semantic_dedup_realistic_k_skewed(ray_session, tmp_path):
    """r3 verdict #8: the paper regime — k≥256 with Zipf-skewed
    cluster sizes — must exercise the groupby(cluster) exchange with a
    genuinely hot key, prune inside every planted near-dup cluster,
    and still raise loudly when a cluster exceeds max_cluster."""
    import pytest as _pytest

    from finance_sc_relations_ray.pipelines.mlops import (
        kmeans_embeddings,
        semantic_dedup_ds,
    )
    from finance_sc_relations_ray.sources.embeddings import (
        embeddings_parquet_for,
    )

    sfdir = embeddings_parquet_for(
        3000, d=64, n_centers=300, out_dir=str(tmp_path / "emb")
    )
    assign = kmeans_embeddings(sfdir, k=256, iters=3)
    sizes = assign.groupby("cluster").size()
    # skew is real: the hot planted center dominates the median cluster
    assert sizes.max() >= 10 * max(1, int(sizes.median())), sizes.describe()

    kept = (
        semantic_dedup(sfdir, k=256, iters=3, eps=0.95)
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # noise=0.02 ⇒ within-center cosines ≈0.99: heavy pruning must
    # occur overall, and the hot cluster must collapse hardest
    assert len(kept) < 1500, len(kept)
    kept_per_cluster = kept.groupby("cluster").size()
    hot = int(sizes.idxmax())
    assert kept_per_cluster.get(hot, 0) <= max(10, sizes[hot] // 20)
    # every cluster retains at least one representative
    assert set(kept_per_cluster.index) == set(sizes.index)

    # the raise path at realistic k: cap below the hot cluster
    with _pytest.raises(Exception, match="max_cluster"):
        semantic_dedup_ds(
            sfdir, k=256, iters=3, eps=0.95,
            max_cluster=int(sizes.max()) - 1,
        ).to_pandas()
