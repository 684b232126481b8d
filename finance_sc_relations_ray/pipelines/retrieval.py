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


def _bm25_scores(
    tf: np.ndarray,
    dl: np.ndarray,
    n_docs: int,
    total_t: int,
    df: np.ndarray,
) -> np.ndarray:
    """The shared scoring kernel: tf is (n_terms, n_rows) int64, dl is
    (n_rows,) int64. Both retrieval paths (corpus scan and index read)
    call THIS function, so their doubles are bit-identical by
    construction — and both match the generated SQL oracle's fixed
    IEEE tree."""
    fn = np.float64(n_docs)
    fdf = df.astype(np.float64)
    score = np.zeros(tf.shape[1], dtype=np.float64)
    for j in range(tf.shape[0]):
        num = (_C_NUM * tf[j] * total_t).astype(np.float64)
        den = (
            _C_TF * tf[j] * total_t
            + _C_T * total_t
            + _C_DLN * dl * n_docs
        ).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            s_j = np.where(tf[j] > 0, (fn / fdf[j]) * (num / den), 0.0)
        # left-to-right sum in query order == the oracle's
        # ((s1 + s2) + s3) tree
        score = score + s_j
    return score


def _check_exactness_bound(total_t: int, n_docs: int) -> None:
    # every int entering a CAST AS DOUBLE must be ≤ 2^53 (see module
    # docstring). Worst cases over tf ≤ dl ≤ T: numerator 22·T·T,
    # denominator 10·T·T + 3·T + 9·T·N (N is not bounded by T — empty
    # docs — so it enters separately).
    t, n = total_t, n_docs
    if max(_C_NUM * t * t, _C_TF * t * t + _C_T * t + _C_DLN * t * n) > 2**53:
        raise ValueError(
            "bm25 exactness bound exceeded: shard token count "
            f"{t} (n_docs {n}) too large — shard the corpus (both "
            "score operands must stay ≤ 2^53)"
        )


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
    _check_exactness_bound(total_t, n_docs)

    # ---- pass B: rederive per-doc tf/dl, score, batch-local top-k
    def score_topk(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dl, tf = _per_doc_tf(batch["text"].to_pylist(), terms)
        score = _bm25_scores(tf, dl, n_docs, total_t, df)
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


def build_bm25_index(sf_dir: str, out_dir: str | None = None) -> str:
    """Persist the retrieval artifacts once (cached like the pages
    fixture): the sharded inverted index (``postings/`` — one parquet
    directory from `graph.inverted_index`, the Lucene segmented-
    postings layout), a doc-length norms sidecar (``norms/`` —
    (doc_id, dl), Lucene's norms file analog), and a one-row
    ``stats`` parquet (n_docs, total_tokens). All three writes are
    distributed ``write_parquet``; only the output PATH touches the
    driver. The directory is committed atomically (tmp + rename) so a
    killed build never leaves a half-index a later search would
    trust."""
    import pyarrow.parquet as pq

    from .graph import inverted_index

    # cache key includes the source size AND mtime so a changed corpus
    # under the same sf name never reuses a stale index (same-size
    # rewrites still bump mtime; callers passing an explicit out_dir
    # own invalidation themselves)
    src = os.path.join(sf_dir, "documents.parquet")
    tag = (os.path.basename(os.path.normpath(sf_dir)) or "sf") + (
        f"-{os.path.getsize(src)}-{int(os.path.getmtime(src))}"
        if os.path.exists(src)
        else ""
    )
    out_dir = out_dir or f"/tmp/fscr_bm25_index/{tag}"
    if os.path.isdir(out_dir) and os.path.exists(
        os.path.join(out_dir, "stats.parquet")
    ):
        return out_dir
    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    inverted_index(sf_dir).write_parquet(os.path.join(tmp, "postings"))

    def norms(batch: pa.Table) -> pa.Table:
        _, counts = textops.tokens_lower_batch(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "dl": pa.array(counts, pa.int64()),
            }
        )

    norms_ds = _read_docs(sf_dir).map_batches(norms, batch_format="pyarrow")
    norms_ds.write_parquet(os.path.join(tmp, "norms"))
    # n_docs/total_tokens roll up from the norms WRITE's own output:
    # row counts from parquet FOOTER metadata only (free, no scan —
    # the merge_parts gate pattern), the token total via a distributed
    # sum over the dl column (the driver sees two scalars, never the
    # corpus-sized norms rows)
    nd = os.path.join(tmp, "norms")
    n_docs = sum(
        pq.read_metadata(os.path.join(nd, f)).num_rows
        for f in os.listdir(nd)
        if f.endswith(".parquet")
    )
    total = int(sized_read_parquet(nd, columns=["dl"]).sum("dl") or 0)
    pq.write_table(
        pa.table(
            {
                "n_docs": pa.array([n_docs], pa.int64()),
                "total_tokens": pa.array([total], pa.int64()),
            }
        ),
        os.path.join(tmp, "stats.parquet"),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir


def update_bm25_index(
    index_dir: str,
    delta_sf_dir: str,
    out_dir: str,
    n_shards: int = 16,
) -> str:
    """Merge a DELTA corpus into a persisted index — the incremental
    ingest shape (the reference's overwrite-partition semantics, S10,
    applied to the retrieval artifact; Lucene calls this a segment
    merge). The result is byte-equal in CONTENT to rebuilding from the
    concatenated corpus (pytest-enforced: merged index rows and search
    results match a from-scratch build row-for-row).

    Distributed plan: the delta postings are built by the normal
    sharded-index path over the delta docs only; base ∪ delta then
    merge per (term, shard) through ONE exchange over index rows
    (vocab × shards — never corpus-sized; a term's two posting strings
    merge by doc_id, each already sorted). Norms union is a pure
    write-through; stats add. Duplicate doc_ids between base and delta
    are detected by a candidate-funnel scan of the base norms
    restricted to the delta ids (bounded by the DELTA size) and raise
    — re-crawled urls must be deduplicated upstream, silently merging
    them would double-count tf.
    """
    import pyarrow.dataset as _pads  # noqa: F401 (filter exprs below)
    import pyarrow.parquet as pq

    from ..sources.io import candidate_filtered_read
    from .graph import inverted_index

    delta_docs = _read_docs(delta_sf_dir)

    # ---- duplicate-id guard (bounded by delta size)
    def just_ids(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"]})

    ids_ds = delta_docs.map_batches(just_ids, batch_format="pyarrow")
    n_delta = int(ids_ds.count())
    dup = candidate_filtered_read(
        os.path.join(index_dir, "norms"),
        key="doc_id",
        columns=["doc_id"],
        ids_ds=ids_ds,
        n_need=max(n_delta, 1),
    )
    n_dup = int(dup.count())
    if n_dup:
        raise ValueError(
            f"update_bm25_index: {n_dup} delta doc_ids already exist in "
            "the base index — dedup the delta upstream (merging would "
            "double-count term frequencies)"
        )

    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    # ---- delta postings via the normal index path, then merge
    delta_post_dir = os.path.join(tmp, "_delta_postings")
    inverted_index(delta_sf_dir, n_shards=n_shards).write_parquet(
        delta_post_dir
    )

    base_post = sized_read_parquet(
        os.path.join(index_dir, "postings"),
        columns=["term", "shard", "df", "postings", "tfs"],
    )
    delta_post = sized_read_parquet(
        delta_post_dir, columns=["term", "shard", "df", "postings", "tfs"]
    )

    n_coarse = 64

    def add_key(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch["term"].to_pandas(), index=False
        ).to_numpy()
        b = (
            (h % np.uint64(n_coarse)).astype(np.int64)
            + batch["shard"].to_numpy(zero_copy_only=False)
        ) % n_coarse
        return batch.append_column(
            "__b", pa.array(b.astype(np.int32), pa.int32())
        )

    def merge_group(g: pa.Table) -> pa.Table:
        df_ = g.select(["term", "shard", "df", "postings", "tfs"]).to_pandas()
        out_rows = {
            "term": [],
            "shard": [],
            "df": [],
            "postings": [],
            "tfs": [],
        }
        for (term, shard), rows in df_.groupby(["term", "shard"], sort=False):
            if len(rows) == 1:
                r = rows.iloc[0]
                ids_s, tfs_s, dfv = r["postings"], r["tfs"], int(r["df"])
            else:
                ids = np.concatenate(
                    [
                        np.array(p.split(","), dtype=np.int64)
                        for p in rows["postings"]
                    ]
                )
                tfv = np.concatenate(
                    [np.array(t.split(","), dtype=np.int64) for t in rows["tfs"]]
                )
                order = np.argsort(ids, kind="mergesort")
                ids, tfv = ids[order], tfv[order]
                ids_s = ",".join(map(str, ids))
                tfs_s = ",".join(map(str, tfv))
                dfv = len(ids)
            out_rows["term"].append(term)
            out_rows["shard"].append(int(shard))
            out_rows["df"].append(dfv)
            out_rows["postings"].append(ids_s)
            out_rows["tfs"].append(tfs_s)
        return pa.table(
            {
                "term": pa.array(out_rows["term"], pa.string()),
                "shard": pa.array(out_rows["shard"], pa.int64()),
                "df": pa.array(out_rows["df"], pa.int64()),
                "postings": pa.array(out_rows["postings"], pa.string()),
                "tfs": pa.array(out_rows["tfs"], pa.string()),
            }
        )

    from ..stages.joins import NO_FUSE_NUM_CPUS

    (
        base_post.union(delta_post)
        .map_batches(add_key, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(
            merge_group, batch_format="pyarrow", num_cpus=NO_FUSE_NUM_CPUS
        )
        .write_parquet(os.path.join(tmp, "postings"))
    )
    shutil.rmtree(delta_post_dir, ignore_errors=True)

    # ---- norms union: base copies through, delta appends
    def norms(batch: pa.Table) -> pa.Table:
        _, counts = textops.tokens_lower_batch(batch["text"].to_pylist())
        return pa.table(
            {"doc_id": batch["doc_id"], "dl": pa.array(counts, pa.int64())}
        )

    delta_norms = delta_docs.map_batches(norms, batch_format="pyarrow")
    base_norms = sized_read_parquet(
        os.path.join(index_dir, "norms"), columns=["doc_id", "dl"]
    )
    base_norms.union(delta_norms).write_parquet(os.path.join(tmp, "norms"))

    # ---- stats add: base scalars + distributed delta sums
    st = pq.read_table(os.path.join(index_dir, "stats.parquet"))
    delta_total = int(delta_norms.sum("dl") or 0)
    pq.write_table(
        pa.table(
            {
                "n_docs": pa.array(
                    [int(st["n_docs"][0].as_py()) + n_delta], pa.int64()
                ),
                "total_tokens": pa.array(
                    [int(st["total_tokens"][0].as_py()) + delta_total],
                    pa.int64(),
                ),
            }
        ),
        os.path.join(tmp, "stats.parquet"),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir


def bm25_search_indexed(
    sf_dir: str,
    query: tuple[str, ...] = DEFAULT_QUERY,
    k: int = 10,
    index_dir: str | None = None,
) -> pd.DataFrame:
    """BM25 over the PERSISTED index — the serving-path twin of
    :func:`bm25_search` (same query, same scoring kernel, identical
    output and SQL oracle; pair-exactness is pytest-enforced). Where
    the scan path reads the corpus twice, this reads O(Σ df) index
    rows: a term-predicate pushdown scan of ``postings/`` (the term
    column is the parquet sort/stats key, so non-matching row groups
    never leave storage), the (term, df)-only column-pruned pass for
    the idf scalars, then a posting explode joined to the norms
    sidecar on doc-id buckets. The corpus itself is never touched —
    at 100 TB that is the difference between a query and a job.
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ..stages.joins import bucket_lookup_join

    terms = tuple(query)
    nq = len(terms)
    idx = index_dir or build_bm25_index(sf_dir)

    st = pq.read_table(os.path.join(idx, "stats.parquet"))
    n_docs = int(st["n_docs"][0].as_py())
    total_t = int(st["total_tokens"][0].as_py())
    _check_exactness_bound(total_t, n_docs)

    # idf scalars: column-pruned (term, df) read, summed across shards
    df_tbl = (
        sized_read_parquet(
            os.path.join(idx, "postings"),
            columns=["term", "df"],
            filter=pads.field("term").isin(terms),
        )
        .to_pandas()
        .groupby("term")["df"]
        .sum()
    )
    df = np.array(
        [int(df_tbl.get(t, 0)) for t in terms], dtype=np.int64
    )

    # a duplicated query term contributes once to the index rows but
    # TWICE to the score (matching the scan path and the oracle, where
    # each position gets its own tf_j column): explode only the FIRST
    # position of each distinct term, and let score_group copy tf to
    # the duplicate positions
    first_pos: dict[str, int] = {}
    canon = [first_pos.setdefault(t, j) for j, t in enumerate(terms)]

    def explode(batch: pa.Table) -> pa.Table:
        ids_out: list[np.ndarray] = []
        tfs_out: list[np.ndarray] = []
        js_out: list[np.ndarray] = []
        for t, p, tfs in zip(
            batch["term"].to_pylist(),
            batch["postings"].to_pylist(),
            batch["tfs"].to_pylist(),
        ):
            ids = np.array(p.split(","), dtype=np.int64)
            tfv = np.array(tfs.split(","), dtype=np.int64)
            ids_out.append(ids)
            tfs_out.append(tfv)
            js_out.append(np.full(len(ids), first_pos[t], np.int64))
        if not ids_out:
            return _EXPLODED_SCHEMA.empty_table()
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ids_out), pa.int64()),
                "tj": pa.array(np.concatenate(js_out), pa.int64()),
                "tf": pa.array(np.concatenate(tfs_out), pa.int64()),
            }
        )

    def exploded_ds():
        return sized_read_parquet(
            os.path.join(idx, "postings"),
            columns=["term", "postings", "tfs"],
            filter=pads.field("term").isin(terms),
        ).map_batches(explode, batch_format="pyarrow")

    exploded = exploded_ds()

    # norms are corpus-cardinality: read ONLY the rows the candidate
    # docs need through the shared candidate funnel (isin pushdown
    # below the 100k gate, Bloom semi-join above — any Bloom false
    # positives are dropped by the INNER bucket join). The id stream
    # is rederived from the postings read (cheap, bounded by Σdf),
    # mirroring the minhash verify funnel.
    from ..sources.io import candidate_filtered_read

    def batch_ids(batch: pa.Table) -> pa.Table:
        u = np.unique(batch["doc_id"].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pa.array(u, pa.int64())})

    ids_ds = exploded_ds().map_batches(batch_ids, batch_format="pyarrow")
    n_need = int(ids_ds.count())  # distributed; per-batch-unique
    # overcount only makes the funnel more conservative
    norms_ds = candidate_filtered_read(
        os.path.join(idx, "norms"),
        key="doc_id",
        columns=["doc_id", "dl"],
        ids_ds=ids_ds,
        n_need=max(n_need, 1),
    )
    joined = bucket_lookup_join(
        exploded,
        norms_ds,
        on="doc_id",
        right_key="doc_id",
        payload={"dl": "dl"},
        left_schema=_EXPLODED_SCHEMA,
        payload_types={"dl": pa.int64()},
    )

    from ..config import exchange_fanout

    n_buckets = exchange_fanout(floor=32)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = batch["doc_id"].to_numpy(zero_copy_only=False) % n_buckets
        return batch.append_column(
            "__db", pa.array(b.astype(np.int32), pa.int32())
        )

    def score_group(g: pa.Table) -> pa.Table:
        gdf = g.select(["doc_id", "tj", "tf", "dl"]).to_pandas()
        piv = gdf.pivot_table(
            index=["doc_id", "dl"],
            columns="tj",
            values="tf",
            aggfunc="first",
            fill_value=0,
        ).reset_index()
        doc_ids = piv["doc_id"].to_numpy(np.int64)
        dl = piv["dl"].to_numpy(np.int64)
        tf = np.zeros((nq, len(piv)), dtype=np.int64)
        for j in range(nq):
            if canon[j] in piv.columns:  # duplicates copy the canonical
                tf[j] = piv[canon[j]].to_numpy(np.int64)
        score = _bm25_scores(tf, dl, n_docs, total_t, df)
        out = pd.DataFrame({"doc_id": doc_ids, "dl": dl})
        for j in range(nq):
            out[f"tf_{j + 1}"] = tf[j]
        out["score"] = score
        out = out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__db")
        .map_groups(score_group, batch_format="pyarrow")
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
        .reset_index(drop=True)[
            ["doc_id", "dl", *[f"tf_{j + 1}" for j in range(nq)], "score"]
        ]
    )


_EXPLODED_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("tj", pa.int64()), ("tf", pa.int64())]
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
