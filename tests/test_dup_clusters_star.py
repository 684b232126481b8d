"""Alternating large-star/small-star connected components (Kiveris et
al. 2014) — the deep-graph fallback for dup_clusters (r2 verdict #7).

The hash-to-min propagation default needs diameter-many rounds, so its
max_iter guard RAISES on adversarially deep graphs; the alternating
variant must cluster them correctly in O(log² n) rounds.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from finance_sc_relations_ray.pipelines.text import (
    _alternating_star_labels,
    dup_clusters,
)


def _edges_ds(pairs):
    """(a, b) undirected pairs -> both-orientation (src, dst) Dataset,
    the shape dup_clusters hands to the label stage."""
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    t = pa.table(
        {
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
        }
    )
    return ray.data.from_arrow(t).repartition(4)


def _labels_of(pairs, k=4):
    out = _alternating_star_labels(_edges_ds(pairs), k).to_pandas()
    return dict(zip(out["node"].tolist(), out["label"].tolist()))


def _expected_components(pairs, nodes):
    # union-find oracle
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _check(pairs, nodes, k=4):
    labels = _labels_of(pairs, k)
    exp = _expected_components(pairs, nodes)
    for n in nodes:
        got = labels.get(n, n)  # component minima are absent -> self
        assert got == exp[n], (n, got, exp[n])


def test_chain_deeper_than_propagation_max_iter(ray_session):
    """A 64-node chain (diameter 63 > propagation's max_iter=30)
    clusters to ONE component labelled by its minimum."""
    nodes = list(range(100, 164))
    pairs = [(nodes[i], nodes[i + 1]) for i in range(len(nodes) - 1)]
    labels = _labels_of(pairs)
    for n in nodes[1:]:
        assert labels[n] == 100
    assert 100 not in labels  # the center appears only as a label


def test_chain_descending_ids(ray_session):
    """Worst case for min-propagation direction: ids DECREASE along
    the chain, so the min is at the far end."""
    nodes = list(range(163, 99, -1))
    pairs = [(nodes[i], nodes[i + 1]) for i in range(len(nodes) - 1)]
    _check(pairs, nodes)


def test_mixed_components_and_singletons(ray_session):
    pairs = (
        [(i, i + 1) for i in range(0, 40)]          # 41-chain
        + [(1000, 1001), (1001, 1002), (1000, 1003)]  # small star-ish
        + [(2000, 2001)]                              # pair
    )
    nodes = sorted({x for p in pairs for x in p})
    _check(pairs, nodes)


def test_binary_tree_and_ring(ray_session):
    # ring of 37 (odd cycle) + a 63-node binary tree
    ring = [(i, (i + 1) % 37) for i in range(37)]
    # avoid 0 collisions: offset tree ids
    tree = [(500 + (i - 1) // 2, 500 + i) for i in range(1, 63)]
    pairs = ring + tree
    nodes = sorted({x for p in pairs for x in p})
    _check(pairs, nodes)


def test_propagation_raises_where_star_succeeds(tmp_path, ray_session):
    """E2E over a documents table whose near-dup graph is a deep
    chain: propagation hits max_iter and raises; alternating_star
    returns the correct single cluster. Chain construction: sliding
    40-token windows over distinct tokens give adjacent docs Jaccard
    38/40 = 0.95 and distance-2 docs 37/41 ≈ 0.90, so threshold 0.93
    keeps ONLY the i↔i+1 edges — a true 40-node chain (diameter 39 >
    max_iter)."""
    toks = [f"tok{i:03d}" for i in range(80)]
    texts = [" ".join(toks[i : i + 40]) for i in range(0, 40)]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pa_tbl = pa.Table.from_pandas(df, preserve_index=False)
    import pyarrow.parquet as pq

    pq.write_table(pa_tbl, str(tmp_path / "documents.parquet"))

    kwargs = dict(threshold=0.93, n=2, max_iter=5)
    with pytest.raises(RuntimeError, match="no convergence"):
        dup_clusters(str(tmp_path), **kwargs)
    out = dup_clusters(str(tmp_path), method="alternating_star", **kwargs)
    assert out["cluster_id"].nunique() == 1
    assert out["cluster_id"].eq(0).all()
    assert out.loc[out["doc_id"] == 0, "is_canonical"].item() == 1


def test_methods_agree_on_real_documents(ray_session):
    a = dup_clusters("/root/testdata/sf0.001")
    b = dup_clusters("/root/testdata/sf0.001", method="alternating_star")
    pd.testing.assert_frame_equal(a, b)
