"""Distributed BPE tokenizer training: merge-pair counting and the
iterative merge-learning loop (Sennrich, Haddow & Birch, ACL 2016 —
"Neural Machine Translation of Rare Words with Subword Units"; the
same byte-pair idea as Gage 1994). Public-knowledge algorithm,
implemented Ray-Data-first.

The reference ships a *pickled pretrained* HF tokenizer as a stage
artifact (`/root/reference/src/relation_extraction/
preprocessing_funcs.py:360-381`, SURVEY.md ST5); this module adds the
operator that PRODUCES such an artifact from a raw corpus — the
canonical missing piece of a training-data pipeline (every LLM corpus
run ends in "now train the tokenizer on it").

Scale shape — the one insight that makes BPE training feasible at
100 TB: BPE statistics are a function of the WORD HISTOGRAM, not the
corpus. The corpus is read exactly once (per-batch vectorized
factorize+bincount partials → one groupby — the heavy_hitter_tokens
funnel with the DSIR factorize kernel); every merge
iteration after that touches only the vocabulary-bounded
(word, count, symbols) table, which stays a distributed Dataset
(web-scale vocabularies run to billions of noise tokens — never
collected to the driver). Per iteration: one map-only recount pass
emitting per-batch (left, right, n) partials bounded by the symbol
alphabet, one bounded groupby, and a top-1 sort of the tiny pair
table; the argmax pair (one row) is the only thing the driver sees.
Applying the merge is map-only. A Sennrich-style incremental-stats
index would avoid the recount pass but needs a shared mutable
structure; the recount is embarrassingly parallel and its cost is
vocab-bounded, so it is the right trade at cluster scale.

Determinism: ties in the argmax break on (left, right) lexicographic
order (Sennrich's dict-order tie-break is arbitrary; ours is fixed),
so the learned merge list is bit-stable under any partitioning.
All counts are int64 — no float policy needed.

Tokenization matches the repo-wide convention (functions/textops
`tokens_lower`: ASCII-whitespace split + lower), so the
`bpe_pair_counts` DuckDB oracle reuses the established
`regexp_extract_all(lower(text), '\\S+')` mirror; `length`/`substr`
are character-based in both engines, so multi-byte symbols agree.
"""

from __future__ import annotations

import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions import textops
from ..sources.io import sized_read_parquet


def _word_counts(sf_dir: str) -> "ray.data.Dataset":
    """Corpus pass → distributed (word, c) histogram. Combiner-first:
    each batch emits one row per DISTINCT word it saw, so the exchange
    moves vocab-bounded partials, never token occurrences."""

    def partial(batch: pa.Table) -> pa.Table:
        # batch tokenize + hash-based factorize (same kernel choice as
        # the DSIR vocab dedup: pd.factorize over the flat token
        # array; np.unique on object arrays comparison-sorts and
        # measured slower there)
        flat, _ = textops.tokens_lower_batch(batch["text"].to_pylist())
        codes, uniques = pd.factorize(flat, sort=False)
        counts = np.bincount(codes, minlength=len(uniques))
        return pa.table(
            {
                "word": pa.array(uniques, pa.string()),
                "c": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        sized_read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["text"],
            fanout=True,
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("c", alias_name="c"))
    )


def _pair_partials(words: list[list[str]], counts: list[int]) -> pa.Table:
    """Adjacent-pair counts over one batch of symbol sequences,
    weighted by word count. Overlapping occurrences all count
    (Sennrich's get_stats: 'aaa' → (a,a) twice). Python loop is
    deliberate: this stage runs over the vocab-bounded word table
    (post-combiner), not the corpus — same class as the
    heavy_hitter_tokens Counter."""
    c: Counter = Counter()
    for syms, n in zip(words, counts):
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += n
    keys = sorted(c)
    return pa.table(
        {
            "left": pa.array([k[0] for k in keys], pa.string()),
            "right": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([c[k] for k in keys], pa.int64()),
        }
    )


def apply_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (left, right) —
    classic BPE application: 'a a a' under (a,a) → 'aa a'."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_pair_counts(sf_dir: str, top_n: int = 30) -> pd.DataFrame:
    """First-iteration BPE statistics: the top adjacent CHARACTER
    pairs over the word histogram (pair string = the 2-char
    concatenation; count = occurrences weighted by word frequency).
    Exactly SQL-replayable — the oracle explodes substr(word, i, 2)
    over generate_series — and the planted fixture in
    tests/test_bpe.py pins the semantics (overlap counting, weighting,
    tie order)."""

    def pairs(batch: pa.Table) -> pa.Table:
        t = _pair_partials(
            [list(w) for w in batch["word"].to_pylist()],
            batch["c"].to_pylist(),
        )
        return pa.table(
            {
                "pair": pa.array(
                    [
                        l + r
                        for l, r in zip(
                            t["left"].to_pylist(), t["right"].to_pylist()
                        )
                    ],
                    pa.string(),
                ),
                "n": t["n"],
            }
        )

    ds = (
        _word_counts(sf_dir)
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "pair"], descending=[True, False])
        .limit(top_n)
    )
    return ds.to_pandas()


def bpe_learn_merges(sf_dir: str, n_merges: int = 20) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus. Returns
    (rank, left, right, n) — rank 0 is the first merge learned. The
    iterative loop is not SQL-expressible (each argmax feeds the next
    recount); the pytest oracle is an independent single-process BPE
    over the same histogram (tests/test_bpe.py), exact at sf0.001 and
    on planted fixtures.

    Working state between iterations is the (c, symbols) table —
    vocabulary-bounded, kept in the object store via materialize()
    (bounded state by construction: it can only SHRINK as merges fuse
    symbols; this is NOT the whole-corpus materialize the kmeans
    refit_source work removed — the corpus itself is read once by
    _word_counts and never again). Stops early when no adjacent pair
    remains."""

    def to_symbols(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c": batch["c"],
                "symbols": pa.array(
                    [list(w) for w in batch["word"].to_pylist()],
                    pa.list_(pa.string()),
                ),
            }
        )

    words = (
        _word_counts(sf_dir)
        .map_batches(to_symbols, batch_format="pyarrow")
        .materialize()
    )

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):

        def partials(batch: pa.Table) -> pa.Table:
            return _pair_partials(
                batch["symbols"].to_pylist(), batch["c"].to_pylist()
            )

        top = (
            words.map_batches(partials, batch_format="pyarrow")
            .groupby(["left", "right"])
            .aggregate(Sum("n", alias_name="n"))
            .sort(["n", "left", "right"], descending=[True, False, False])
            .limit(1)
            .take_all()
        )
        if not top:
            break  # every word is a single symbol — nothing to merge
        left, right, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        merges.append((rank, left, right, n))

        def merge_batch(
            batch: pa.Table, left: str = left, right: str = right
        ) -> pa.Table:
            return pa.table(
                {
                    "c": batch["c"],
                    "symbols": pa.array(
                        [
                            apply_merge(s, left, right)
                            for s in batch["symbols"].to_pylist()
                        ],
                        pa.list_(pa.string()),
                    ),
                }
            )

        words = words.map_batches(
            merge_batch, batch_format="pyarrow"
        ).materialize()

    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "n"]
    ).astype({"rank": "int64", "n": "int64"})


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge list (rank order) to one word — the
    standard BPE encode: each merge is applied greedily left-to-right
    before the next rank is considered."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = apply_merge(syms, left, right)
    return syms


def bpe_encode_documents(
    sf_dir: str,
    n_merges: int = 32,
    merges: "pd.DataFrame | None" = None,
) -> "ray.data.Dataset":
    """Segment every document with a learned BPE merge list — the
    consumer half of the tokenizer-training story (train on the
    corpus, then ENCODE the corpus for packing/length stats; the
    reference applies its pickled pretrained tokenizer the same way,
    `/root/reference/src/relation_extraction/preprocessing_funcs.py:
    360-381`, SURVEY.md ST5/M10). Returns one row per doc:
    (doc_id, n_words, n_subwords).

    Scale shape: the merge list is tokenizer-sized (≤ vocab budget),
    broadcast ONCE via ``ray.put`` and resolved in each actor's
    ``__init__`` — never re-shipped per batch. The encode pass is
    map-only over the corpus; each batch factorizes its tokens and
    encodes only the UNIQUE words (an actor-resident word→length
    cache persists across batches, so hot words — Zipf's bulk — are
    encoded once per actor, not once per occurrence).
    """
    if merges is None:
        merges = bpe_learn_merges(sf_dir, n_merges=n_merges)
    merge_list = list(zip(merges["left"].tolist(), merges["right"].tolist()))
    merges_ref = ray.put(merge_list)

    class BPEEncoder:
        def __init__(self):
            self.merges: list[tuple[str, str]] = ray.get(merges_ref)
            self.cache: dict[str, int] = {}

        def _n_sub(self, word: str) -> int:
            n = self.cache.get(word)
            if n is None:
                n = len(encode_word(word, self.merges))
                self.cache[word] = n
            return n

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch["text"].to_pylist()
            doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            flat, counts = textops.tokens_lower_batch(texts)
            codes, uniques = pd.factorize(flat, sort=False)
            sub_per_unique = np.fromiter(
                (self._n_sub(w) for w in uniques),
                dtype=np.int64,
                count=len(uniques),
            )
            rep = np.repeat(
                np.arange(len(texts), dtype=np.int64), counts
            )
            n_sub = np.bincount(
                rep,
                weights=(
                    sub_per_unique[codes]
                    if len(codes)
                    else np.zeros(0, np.int64)
                ),
                minlength=len(texts),
            ).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "n_words": pa.array(counts, pa.int64()),
                    "n_subwords": pa.array(n_sub, pa.int64()),
                }
            )

    return sized_read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    ).map_batches(
        BPEEncoder,
        batch_format="pyarrow",
        concurrency=(1, 4),
        num_cpus=0.5,
    )
