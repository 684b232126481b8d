"""BPE tokenizer training (pipelines/bpe.py).

- planted fixtures pin the statistics semantics: overlap counting,
  word-frequency weighting, deterministic tie order, greedy
  left-to-right merge application;
- `bpe_learn_merges` is checked against an INDEPENDENT single-process
  BPE (dict-based Sennrich learn_bpe semantics over a Counter word
  histogram read straight from parquet) at sf0.001 — the pytest
  oracle for the iterative loop, which is not SQL-expressible;
- `bpe_pair_counts`' exact DuckDB oracle runs with every other SQL
  oracle in tests/test_queries_vs_duckdb.py.
"""

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from finance_sc_relations_ray.functions import textops
from finance_sc_relations_ray.pipelines.bpe import (
    apply_merge,
    bpe_learn_merges,
    bpe_pair_counts,
)

SF = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def reference_bpe(texts, n_merges):
    """Independent oracle: single-process Sennrich-style learn_bpe
    over a Counter histogram (same tokenization, same tie rule)."""
    vocab = Counter()
    for t in texts:
        vocab.update(textops.tokens_lower(t))
    words = {w: (list(w), c) for w, c in vocab.items()}
    merges = []
    for rank in range(n_merges):
        stats = Counter()
        for syms, c in words.values():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        # max count, then lexicographic (left, right)
        (left, right), n = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, n))
        words = {
            w: (apply_merge(syms, left, right), c)
            for w, (syms, c) in words.items()
        }
    return merges


def test_pair_counts_planted(tmp_path):
    # "aaa" x2 docs + "ab aaa" → words: aaa:3 (pairs aa x2 each = 6),
    # ab:1 (pair ab = 1)
    d = _write_docs(tmp_path, ["aaa", "aaa ab", "aaa"])
    out = bpe_pair_counts(d, top_n=10)
    assert out[["pair", "n"]].values.tolist() == [["aa", 6], ["ab", 1]]


def test_pair_counts_tie_order(tmp_path):
    # equal counts → lexicographic pair order decides
    d = _write_docs(tmp_path, ["zy zy", "ab ab"])
    out = bpe_pair_counts(d, top_n=2)
    assert out["pair"].tolist() == ["ab", "zy"]
    assert out["n"].tolist() == [2, 2]


def test_apply_merge_overlap_and_greedy():
    assert apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert apply_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert apply_merge(["ab", "c", "ab"], "ab", "c") == ["abc", "ab"]
    assert apply_merge(list("xyz"), "q", "r") == ["x", "y", "z"]


def test_learn_merges_planted(tmp_path):
    # banana x3: pairs an:6, na:6(overlap? b-a,a-n,n-a,a-n,n-a → an:2,
    # na:2, ba:1 per word) → an==na tie → 'an' first (lexicographic);
    # after merge(a,n): b,an,an,a → pairs (b,an):1,(an,an):1,(an,a):1
    d = _write_docs(tmp_path, ["banana banana banana"])
    out = bpe_learn_merges(d, n_merges=2)
    assert out.iloc[0][["left", "right", "n"]].tolist() == ["a", "n", 6]
    # second merge: three pairs each count 3 → (an,a) < (an,an) < (b,an)
    assert out.iloc[1][["left", "right", "n"]].tolist() == ["an", "a", 3]


def test_learn_merges_early_stop(tmp_path):
    # single-char words only → no adjacent pairs → empty result
    d = _write_docs(tmp_path, ["a b c", "a"])
    out = bpe_learn_merges(d, n_merges=5)
    assert len(out) == 0


def test_learn_merges_vs_reference_sf():
    texts = (
        pq.read_table(os.path.join(SF, "documents.parquet"), columns=["text"])
        .column("text")
        .to_pylist()
    )
    exp = reference_bpe(texts, n_merges=12)
    got = bpe_learn_merges(SF, n_merges=12)
    assert [tuple(r) for r in got.values.tolist()] == exp


def test_encode_word_rank_order():
    from finance_sc_relations_ray.pipelines.bpe import encode_word

    # merge rank order matters: (a,b) before (ab,c) composes; the
    # reverse list can never build 'abc'
    assert encode_word("abc", [("a", "b"), ("ab", "c")]) == ["abc"]
    assert encode_word("abc", [("ab", "c"), ("a", "b")]) == ["ab", "c"]


def test_encode_documents_vs_reference(tmp_path):
    from finance_sc_relations_ray.pipelines.bpe import (
        bpe_encode_documents,
        encode_word,
    )

    texts = [
        "the cat sat on the mat",
        "the theme then there",
        "a aa aaa aaaa",
        "",
    ]
    sf = _write_docs(tmp_path, texts)
    got = (
        bpe_encode_documents(sf, n_merges=6)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    merges = [(l, r) for _, l, r, _ in reference_bpe(texts, 6)]
    for i, t in enumerate(texts):
        toks = textops.tokens_lower(t)
        exp_sub = sum(len(encode_word(w, merges)) for w in toks)
        assert got["n_words"].iloc[i] == len(toks)
        assert got["n_subwords"].iloc[i] == exp_sub, (i, t)
    # merges fuse: subwords never exceed characters, never below words
    assert (got["n_subwords"] >= got["n_words"]).all()
