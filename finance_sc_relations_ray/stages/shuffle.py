"""Skew-safe shuffle helpers: salted / two-phase aggregation.

A bare ``groupby(key).map_groups`` ships every row of a hot key to one
task (the Apple/Samsung-hub problem, SURVEY.md §7.4). These helpers
implement the combiner pattern the north rule asks for explicitly:

- ``partial_dedup_batch``: inside ``map_batches``, collapse each batch
  to one row per key (a per-batch combiner — this is the "salt": the
  partial key-space is (key × batch), so no single reducer sees more
  than #batches rows per key);
- a final small ``groupby(keys).map_groups`` merges the partials with
  the same merge function (the merge is associative + commutative, so
  combiner-then-merge equals a single global pass).

Merge semantics per key (matching the reference's per-item payload,
reference src/relation_extraction/reporter.py:39-73 — ``sentenceIds``,
``extractedNameId``, ``extractedNameCandidateIds``):

- ``score``        → max
- ``n_mentions``   → sum
- ``subj_id`` / ``obj_id`` → min non-null (a deterministic
  "first non-null": linking is name-keyed so ids agree across
  mentions; min makes the pick independent of batch order)
- ``url``          → min (deterministic witness document)
- ``sentence_ids`` → sorted union, capped at ``SENTENCE_IDS_CAP``
  (bounded: a mega-triple mentioned on 10^9 pages must not grow an
  unbounded list; ``n_mentions`` keeps the true count)

Payload columns are merged only if present, so the same helper serves
the partitioned runner (extra ``part`` key) and bare (subj,pred,obj)
dedup.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

SENTENCE_IDS_CAP = 64

# payload columns (merged when present); anything else non-key is dropped
_PAYLOAD = ("score", "n_mentions", "subj_id", "obj_id", "url", "sentence_ids")

_PAYLOAD_TYPES = {
    "score": pa.float32(),
    "n_mentions": pa.int64(),
    "subj_id": pa.string(),
    "obj_id": pa.string(),
    "url": pa.string(),
    "sentence_ids": pa.list_(pa.int64()),
}


def _min_nonnull(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def partial_dedup_batch(batch: pa.Table, keys: list[str]) -> pa.Table:
    """Per-batch combiner: one row per key with merged payload."""
    present = [c for c in _PAYLOAD if c in batch.column_names]
    agg: dict[tuple, dict] = {}
    key_cols = [batch[k].to_pylist() for k in keys]
    val_cols = {c: batch[c].to_pylist() for c in present}
    has_n = "n_mentions" in val_cols
    for i in range(batch.num_rows):
        k = tuple(col[i] for col in key_cols)
        cur = agg.get(k)
        if cur is None:
            cur = agg[k] = {c: val_cols[c][i] for c in present}
            if not has_n:
                cur["n_mentions"] = 1
            sids = cur.get("sentence_ids")
            if sids is not None:
                cur["sentence_ids"] = set(sids)
            continue
        if "score" in cur:
            cur["score"] = max(cur["score"], val_cols["score"][i])
        cur["n_mentions"] += val_cols["n_mentions"][i] if has_n else 1
        for c in ("subj_id", "obj_id"):
            if c in cur:
                cur[c] = _min_nonnull(cur[c], val_cols[c][i])
        if "url" in cur:
            cur["url"] = _min_nonnull(cur["url"], val_cols["url"][i])
        if "sentence_ids" in cur:
            cur["sentence_ids"].update(val_cols["sentence_ids"][i] or ())

    out_names = [c for c in present if c != "n_mentions"]
    cols: dict[str, list] = {k: [] for k in keys}
    for c in out_names:
        cols[c] = []
    cols["n_mentions"] = []
    for k, v in agg.items():
        for name, kv in zip(keys, k):
            cols[name].append(kv)
        for c in out_names:
            if c == "sentence_ids":
                cols[c].append(sorted(v[c])[:SENTENCE_IDS_CAP])
            else:
                cols[c].append(v[c])
        cols["n_mentions"].append(v["n_mentions"])
    key_types = {k: batch.schema.field(k).type for k in keys}
    arrays = {k: pa.array(cols[k], type=key_types[k]) for k in keys}
    for c in out_names:
        arrays[c] = pa.array(cols[c], type=_PAYLOAD_TYPES[c])
    arrays["n_mentions"] = pa.array(cols["n_mentions"], type=pa.int64())
    return pa.table(arrays)


def _merge_bucket(g, keys: list[str]):
    """Vectorized within-bucket merge (pandas group aggregation): the
    per-KEY map_groups variant paid Arrow-table-construction overhead
    once per key — 29 s of UDF time for 74.5k keys at the 20k-page
    bench (ds.stats() audit) vs ~1 s for this bucketed form.

    Fast path: a key that occurs in exactly ONE partial row (the vast
    majority — a key only repeats when it was seen in more than one
    upstream batch) needs no merging at all; one vectorized
    ``duplicated`` mask passes those rows through and the per-key
    Python aggregation (min-non-null lambdas, sentence-id set union)
    runs only on the multi-row remainder. The 200k-page ds.stats()
    audit measured 412 s total UDF in this stage without the split —
    ~3.5M Python lambda calls for keys that needed none."""
    import pandas as pd

    present = [c for c in _PAYLOAD if c in g.columns]
    cols = keys + [c for c in ("score",) if c in present] + [
        c for c in ("subj_id", "obj_id", "url", "sentence_ids")
        if c in present
    ] + ["n_mentions"]

    dup_mask = g.duplicated(keys, keep=False)
    singles = g[~dup_mask]
    multi = g[dup_mask]
    if "sentence_ids" in present and len(singles):
        # Arrow→pandas turns list cells into numpy arrays; left as-is,
        # Ray re-encodes the output block as a ragged TENSOR column
        # (and rejects empty ones) instead of list<int64> — normalize
        # to plain lists like the agg path produces
        singles = singles.assign(
            sentence_ids=[list(x) for x in singles["sentence_ids"]]
        )
    if len(multi) == 0:
        return singles.sort_values(keys, kind="mergesort")[cols]

    grouped = multi.groupby(keys, sort=False)
    parts = {}
    if "score" in present:
        parts["score"] = grouped["score"].max()
    parts["n_mentions"] = grouped["n_mentions"].sum()
    for c in ("subj_id", "obj_id", "url"):
        if c in present:
            # min over non-null (pandas min skips NaN/None on object
            # series via dropna)
            parts[c] = grouped[c].agg(
                lambda s: None if s.dropna().empty else s.dropna().min()
            )
    if "sentence_ids" in present:
        parts["sentence_ids"] = grouped["sentence_ids"].agg(
            lambda s: sorted(set().union(*(list(x) for x in s)))[
                :SENTENCE_IDS_CAP
            ]
        )
    merged = pd.DataFrame(parts).reset_index()
    out = pd.concat([singles[cols], merged[cols]], ignore_index=True)
    return out.sort_values(keys, kind="mergesort").reset_index(drop=True)


def salted_dedup(
    ds: "ray.data.Dataset", keys: list[str], num_buckets: int = 64
) -> "ray.data.Dataset":
    """Two-phase exact dedup: per-batch combiner → bucketed final merge.

    The final all-to-all only moves one row per (key, batch) — bounded
    regardless of key skew. The merge groups by ``crc32(key) % B``
    coarse buckets (NOT per key — per-group overhead is paid per
    bucket) and merges each bucket with one vectorized pandas
    aggregation; the merge is associative+commutative, so
    combiner-then-merge equals a single global pass."""
    import zlib

    from .joins import NO_FUSE_NUM_CPUS

    partial = ds.map_batches(
        lambda b: partial_dedup_batch(b, keys), batch_format="pyarrow"
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        key_cols = [batch[k].to_pylist() for k in keys]
        hb = [
            zlib.crc32("|".join(map(str, kv)).encode("utf-8")) % num_buckets
            for kv in zip(*key_cols)
        ]
        return batch.append_column("__dbucket", pa.array(hb, pa.int32()))

    def merge(g):
        return _merge_bucket(g.drop(columns=["__dbucket"]), keys)

    # num_cpus blocks downstream-map fusion: a fused map re-bundles the
    # sorted blocks and the merge fn would see partial groups →
    # duplicate keys (stages/joins.py NO_FUSE_NUM_CPUS rationale)
    return partial.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "__dbucket"
    ).map_groups(
        merge,
        batch_format="pandas",
        num_cpus=NO_FUSE_NUM_CPUS,
    )


# -------------------------------------------- distributed DISTINCT -----
_PAIR_H1 = 0x9E3779B97F4A7C15
_PAIR_H2 = 0xC2B2AE3D27D4EB4F


def distinct_pairs_ds(
    pairs: "ray.data.Dataset",
    col_a: str = "doc_id_a",
    col_b: str = "doc_id_b",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distributed DISTINCT over int64 (col_a, col_b) pair rows — the
    combiner pattern above specialized to candidate-pair streams:
    per-batch ``drop_duplicates`` → numpy-hashed bucket exchange →
    per-bucket distinct. At most one row per (pair, batch) crosses the
    exchange; nothing touches the driver (r2 verdict item #1)."""
    import numpy as np
    import pandas as pd

    from .joins import NO_FUSE_NUM_CPUS

    h1, h2 = np.uint64(_PAIR_H1), np.uint64(_PAIR_H2)

    def local(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.drop_duplicates().astype({col_a: "int64", col_b: "int64"})
        a = df[col_a].to_numpy().astype(np.uint64)
        b = df[col_b].to_numpy().astype(np.uint64)
        # wrapping uint64 mix; bucket skew is irrelevant here (each
        # bucket only runs a vectorized drop_duplicates)
        df["__dbucket"] = (((a * h1) ^ (b * h2)) % num_buckets).astype(
            np.int32
        )
        return df

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.drop(columns="__dbucket").drop_duplicates()

    return (
        pairs.map_batches(local, batch_format="pandas")
        .groupby("__dbucket")
        .map_groups(merge, batch_format="pandas", num_cpus=NO_FUSE_NUM_CPUS)
    )


def distinct_pair_ids_ds(
    pairs: "ray.data.Dataset",
    col_a: str = "doc_id_a",
    col_b: str = "doc_id_b",
    out_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Distinct ids appearing on either side of a pair stream, as a
    Dataset (same combiner-first shape as ``distinct_pairs_ds``)."""
    import numpy as np
    import pandas as pd

    from .joins import NO_FUSE_NUM_CPUS

    h1 = np.uint64(_PAIR_H1)

    def local(df: "pd.DataFrame") -> "pd.DataFrame":
        ids = pd.unique(
            np.concatenate([df[col_a].to_numpy(), df[col_b].to_numpy()])
        )
        out = pd.DataFrame({out_col: ids.astype("int64")})
        out["__dbucket"] = (
            (out[out_col].to_numpy().astype(np.uint64) * h1) % num_buckets
        ).astype(np.int32)
        return out

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.drop(columns="__dbucket").drop_duplicates()

    return (
        pairs.map_batches(local, batch_format="pandas")
        .groupby("__dbucket")
        .map_groups(merge, batch_format="pandas", num_cpus=NO_FUSE_NUM_CPUS)
    )
