"""Corpus retrieval: BM25 top-k search over the documents table.

Once a corpus has an inverted-index / TF-IDF surface
(``pipelines/graph.py``), ranked retrieval is the canonical next
consumer — the reference's entity-linking stage performs exactly this
shape of lookup (query terms -> best-matching candidate rows, see
`/root/reference/src/matcher/core.py:23-56`, graded ST2/J2 by
SURVEY.md §2) and web-scale training-data pipelines use BM25 both for
decontamination lookups and quality-biased sampling. Robertson &
Spärck Jones' Okapi BM25 (TREC-3, 1994) is public knowledge;
implemented Ray-Data-first here.

Cross-engine exactness policy (module docstring of
``pipelines/graph.py``): every compared float is produced by a FIXED
tree of IEEE +,-,*,/ ops on exactly-representable int64s. The two
BM25 transcendental-free substitutions:

- idf := N/df (the log-free variant used by ``tfidf_top_terms`` —
  per-term a strictly monotone transform of ln-idf; for multi-term
  queries the mix across terms differs from Okapi's ln weighting,
  which is a documented scoring-variant choice, not an approximation
  of this pipeline's own definition).
- the tf saturation with k1=1.2, b=0.75 is folded to a ratio of
  integers by multiplying numerator and denominator by 10·T (T =
  corpus token count, avgdl = T/N):

      tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    = 22·tf·T / (10·tf·T + 3·T + 9·dl·N)        exactly.

  Both sides are int64 (and ≤2^53 whenever tf·T ≤ 9·10^14 — a
  per-shard bound at 100 TB since T is then the SHARD token count;
  the operator asserts it), so CAST AS DOUBLE is exact and the
  score tree `(N/df) * (num/den)`, summed left-to-right in query
  order, is bit-identical in numpy and DuckDB.

Distributed plan (the rederive-over-materialize decision, BASELINE
r3): pass A is a map-only corpus scan emitting ONE partial-stats row
per batch (n_docs, total_tokens, per-term df) — only those scalars
reach the driver; pass B rederives per-doc (dl, tf_i) map-only,
scores, and keeps a batch-local top-k, so the driver sees
O(n_batches·k) candidate rows. ZERO all-to-all exchanges; the corpus
is never materialized.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import textops
from ..sources.io import sized_read_parquet

# BM25 free parameters k1=1.2, b=0.75, folded into the integer form
# above: numerator coefficient 22 = 10*(k1+1); denominator
# coefficients 10 (tf·T), 3 = 10*k1*(1-b) (T), 9 = 10*k1*b (dl·N).
_C_NUM = 22
_C_TF = 10
_C_T = 3
_C_DLN = 9

DEFAULT_QUERY = ("query", "vector", "stream")


def _read_docs(sf_dir: str, fanout: bool = False):
    return sized_read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        fanout=fanout,
    )


def _per_doc_tf(
    texts: list[str], terms: tuple[str, ...]
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (dl, tf-matrix) for one batch: dl[i] = token count of
    doc i; tf[j, i] = count of terms[j] in doc i."""
    flat, counts = textops.tokens_lower_batch(texts)
    n = len(texts)
    rep = np.repeat(np.arange(n, dtype=np.int64), counts)
    tf = np.zeros((len(terms), n), dtype=np.int64)
    if len(flat):
        for j, t in enumerate(terms):
            mask = flat == t
            if mask.any():
                tf[j] = np.bincount(rep[mask], minlength=n)
    return counts, tf


def bm25_search(
    sf_dir: str,
    query: tuple[str, ...] = DEFAULT_QUERY,
    k: int = 10,
) -> pd.DataFrame:
    """Top-``k`` documents for ``query`` by the integer-folded BM25
    score above. Returns (doc_id, dl, tf_1..tf_n, score) ordered by
    score DESC, doc_id ASC; docs matching no query term are excluded.
    """
    terms = tuple(query)
    nq = len(terms)

    # ---- pass A: corpus stats (map-only; one partial row per batch)
    def stats_partial(batch: pa.Table) -> pa.Table:
        counts, tf = _per_doc_tf(batch["text"].to_pylist(), terms)
        cols = {
            "n_docs": pa.array([len(counts)], pa.int64()),
            "total_tokens": pa.array([int(counts.sum())], pa.int64()),
        }
        for j in range(nq):
            cols[f"df_{j + 1}"] = pa.array(
                [int((tf[j] > 0).sum())], pa.int64()
            )
        return pa.table(cols)

    partials = (
        _read_docs(sf_dir)
        .map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()
    )
    n_docs = int(partials["n_docs"].sum())
    total_t = int(partials["total_tokens"].sum())
    df = np.array(
        [int(partials[f"df_{j + 1}"].sum()) for j in range(nq)],
        dtype=np.int64,
    )
    # exactness bound: every int entering a CAST AS DOUBLE must be
    # ≤ 2^53 (see module docstring; tf ≤ dl ≤ total_t)
    if _C_TF * total_t * total_t > 2**53:
        raise ValueError(
            "bm25_search exactness bound exceeded: shard token count "
            f"{total_t} too large — shard the corpus (10·tf·T must "
            "stay ≤ 2^53)"
        )

    # ---- pass B: rederive per-doc tf/dl, score, batch-local top-k
    fn = np.float64(n_docs)
    fdf = df.astype(np.float64)
    tt = total_t

    def score_topk(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dl, tf = _per_doc_tf(batch["text"].to_pylist(), terms)
        score = np.zeros(len(doc_ids), dtype=np.float64)
        for j in range(nq):
            num = (_C_NUM * tf[j] * tt).astype(np.float64)
            den = (
                _C_TF * tf[j] * tt + _C_T * tt + _C_DLN * dl * n_docs
            ).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                s_j = np.where(tf[j] > 0, (fn / fdf[j]) * (num / den), 0.0)
            # left-to-right sum in query order == the oracle's
            # ((s1 + s2) + s3) tree
            score = score + s_j
        keep = tf.sum(axis=0) > 0
        out = pd.DataFrame({"doc_id": doc_ids[keep], "dl": dl[keep]})
        for j in range(nq):
            out[f"tf_{j + 1}"] = tf[j][keep]
        out["score"] = score[keep]
        out = out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = (
        _read_docs(sf_dir)
        .map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()
    )
    if cand.empty:
        cols = ["doc_id", "dl", *[f"tf_{j + 1}" for j in range(nq)], "score"]
        return pd.DataFrame({c: [] for c in cols})
    return (
        cand.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        .head(k)
        .reset_index(drop=True)
    )


def bm25_oracle_sql(
    query: tuple[str, ...] = DEFAULT_QUERY, k: int = 10
) -> str:
    """The DuckDB replay of :func:`bm25_search` for the parity gate —
    generated from the same query/coefficients so the two can never
    drift."""
    terms = tuple(query)
    esc = [t.replace("'", "''") for t in terms]
    tf_cases = ",\n                   ".join(
        f"sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END)::BIGINT AS tf_{j + 1}"
        for j, t in enumerate(esc)
    )
    df_cols = ",\n                   ".join(
        f"count(CASE WHEN tf_{j + 1} > 0 THEN 1 END)::BIGINT AS df_{j + 1}"
        for j in range(len(terms))
    )
    term_score = [
        f"""CASE WHEN q.tf_{j + 1} = 0 THEN 0.0 ELSE
                     (CAST(st.n_docs AS DOUBLE) / qdf.df_{j + 1})
                     * (CAST({_C_NUM} * q.tf_{j + 1} * st.tt AS DOUBLE)
                        / CAST({_C_TF} * q.tf_{j + 1} * st.tt
                               + {_C_T} * st.tt
                               + {_C_DLN} * d.dl * st.n_docs AS DOUBLE))
                 END"""
        for j in range(len(terms))
    ]
    # left-to-right tree: ((s1 + s2) + s3) ...
    score_expr = term_score[0]
    for s in term_score[1:]:
        score_expr = f"({score_expr}\n                 + {s})"
    tf_sum = " + ".join(f"q.tf_{j + 1}" for j in range(len(terms)))
    tf_out = ", ".join(f"q.tf_{j + 1}" for j in range(len(terms)))
    return f"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '\\S+')) AS term
                FROM documents
            ), dl AS (
                SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1
            ), st AS (
                SELECT (SELECT count(*)::BIGINT FROM documents) AS n_docs,
                       (SELECT sum(dl)::BIGINT FROM dl) AS tt
            ), qtf AS (
                SELECT doc_id,
                   {tf_cases}
                FROM toks GROUP BY 1
            ), qdf AS (
                SELECT {df_cols}
                FROM qtf
            )
            SELECT d.doc_id, d.dl, {tf_out},
                   {score_expr} AS score
            FROM qtf q JOIN dl d USING (doc_id), st, qdf
            WHERE {tf_sum} > 0
            ORDER BY score DESC, d.doc_id
            LIMIT {k}
    """
