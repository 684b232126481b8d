"""Corpus-curation operators (cap_per_source / pack_token_offsets /
resample_by_source): invariants the SQL oracle cannot express —
independence from physical partitioning, and the cap/mix semantics on
planted inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines.text import (
    cap_per_source,
    pack_token_offsets,
    resample_by_source,
)

SF = "/root/testdata/sf0.001"


def test_pack_offsets_partitioning_independent():
    """The distributed exclusive prefix sum must not depend on how
    doc_ids fall into range buckets: num_buckets=1 (single cumsum) and
    num_buckets=29 (prime — ragged, uneven buckets) must agree row for
    row."""
    a = pack_token_offsets(SF, num_buckets=1)
    b = pack_token_offsets(SF, num_buckets=29)
    pd.testing.assert_frame_equal(a, b)


def test_pack_offsets_contiguous():
    out = pack_token_offsets(SF)
    # offsets tile the concatenated token stream exactly, in doc order
    assert (
        out["start_tok"].to_numpy()[1:]
        == (out["start_tok"] + out["n_tokens"]).to_numpy()[:-1]
    ).all()
    assert int(out["start_tok"].iloc[0]) == 0
    # chunk arithmetic consistent with seq_len=512
    nt = out["n_tokens"].to_numpy()
    st = out["start_tok"].to_numpy()
    exp_n = np.where(nt > 0, (st + nt - 1) // 512 - st // 512 + 1, 0)
    assert (out["n_chunks"].to_numpy() == exp_n).all()


def test_cap_per_source_planted(tmp_path):
    """One mega-source with 50 docs, one tiny source with 2: the cap
    keeps exactly n of the former (the longest, doc_id tiebreak) and
    both of the latter."""
    rows = [(i, "hub", 1000 - (i % 3)) for i in range(50)]
    rows += [(100, "tail", 10), (101, "tail", 5)]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = cap_per_source(str(tmp_path), n=10)
    assert (out["source"] == "tail").sum() == 2
    hub = out[out["source"] == "hub"]
    assert len(hub) == 10
    # longest first (n_chars == 1000 → doc_ids ≡ 0 mod 3), doc_id ties
    expected = sorted(i for i in range(50) if i % 3 == 0)[:10]
    assert sorted(hub["doc_id"].tolist()) == expected


def test_resample_by_source_is_stateless_subset():
    """Every kept row exists in the input, the decision is a pure
    function of doc_id (rerun → identical), and each source's keep
    rate tracks its weight."""
    a = resample_by_source(SF)
    b = resample_by_source(SF)
    pd.testing.assert_frame_equal(a, b)
    full = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"]).to_pandas()
    merged = a.merge(full, on=["doc_id", "source"], how="left", indicator=True)
    assert (merged["_merge"] == "both").all()
    # src9/src19 end in 9 → weight 1.0 → every doc kept
    for s in ("src9", "src19"):
        assert (a["source"] == s).sum() == (full["source"] == s).sum()


# ----------------------------------------------- composed curation ------
def _md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode("utf-8")).hexdigest()


class TestCurateDocuments:
    """Invariants of the composed curate pipeline that the DuckDB
    oracle (tests/test_queries_vs_duckdb.py::curate_documents) does
    not spell out structurally: stage containment, exact-distinctness
    of survivors, and keep-one-representative via an INDEPENDENT
    union-find over the engine's own verified pair graph."""

    @pytest.fixture(scope="class")
    def cur(self):
        from finance_sc_relations_ray.pipelines.text import curate_documents

        return curate_documents(SF, on_degenerate="raise")

    @pytest.fixture(scope="class")
    def docs(self):
        return pq.read_table(
            SF + "/documents.parquet", columns=["doc_id", "text", "lang"]
        ).to_pandas()

    def test_subset_of_quality_gate(self, cur, docs):
        from finance_sc_relations_ray.pipelines.text import (
            filter_quality_documents,
        )

        fq = filter_quality_documents(SF).to_pandas()
        assert set(cur["doc_id"]) <= set(fq["doc_id"])

    def test_survivor_texts_distinct(self, cur, docs):
        kept = docs[docs["doc_id"].isin(cur["doc_id"])]
        assert kept["text"].map(_md5).is_unique

    def test_n_words_exact(self, cur, docs):
        import re

        m = docs.set_index("doc_id")["text"]
        for doc_id, nw in zip(cur["doc_id"], cur["n_words"]):
            assert nw == len(re.findall(r"\S+", m[doc_id]))

    def test_keep_one_representative_union_find(self, cur, docs):
        """Independent oracle for stages 2+4+5: rebuild the winner set
        in pandas, take the ENGINE's verified pair graph over it, run
        a plain union-find (different algorithm than the distributed
        label propagation), and check kept == component minima plus
        singletons."""
        import ray
        import re

        from finance_sc_relations_ray.pipelines.text import _minhash_pairs_ds

        elig = docs[docs["lang"] == "en"].copy()
        elig["n_words"] = elig["text"].map(
            lambda t: len(re.findall(r"\S+", t))
        )
        elig["punct"] = elig["text"].map(
            lambda t: len(re.findall(r"[.,;:!?]", t)) / len(t) if t else 0.0
        )
        elig = elig[(elig["n_words"] >= 20) & (elig["punct"] <= 0.05)]
        win = elig.loc[
            elig.groupby(elig["text"].map(_md5))["doc_id"].idxmin()
        ].sort_values("doc_id")

        pairs = _minhash_pairs_ds(
            SF,
            on_degenerate="raise",
            docs_ds=ray.data.from_pandas(
                win[["doc_id", "text"]].reset_index(drop=True)
            ),
        ).to_pandas()

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        comp_min: dict[int, int] = {}
        for d in win["doc_id"]:
            r = find(int(d))
            comp_min[r] = min(comp_min.get(r, int(d)), int(d))
        expected = sorted(
            int(d) for d in win["doc_id"] if comp_min[find(int(d))] == int(d)
        )
        assert sorted(cur["doc_id"].tolist()) == expected


def test_curate_keep_text_same_survivors(ray_session):
    """keep_text=True (the pretrain_export composition input) must not
    change WHICH documents survive — only add the text column."""
    import os

    from finance_sc_relations_ray.pipelines.text import curate_documents_ds

    sf = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
    bare = (
        curate_documents_ds(sf, on_degenerate="raise")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    with_text = (
        curate_documents_ds(sf, on_degenerate="raise", keep_text=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(with_text.columns) == ["doc_id", "text", "n_words"]
    assert with_text["doc_id"].tolist() == bare["doc_id"].tolist()
    assert with_text["n_words"].tolist() == bare["n_words"].tolist()
    assert with_text["text"].notna().all()
