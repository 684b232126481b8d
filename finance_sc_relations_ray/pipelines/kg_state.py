"""Incremental ingest for the KG triple store — the persisted-artifact
lifecycle of the FLAGSHIP output itself.

The north rule's production shape: crawls arrive incrementally, so the
deduplicated triple table (the reference's DynamoDB relation items,
``/root/reference/src/relation_extraction/reporter.py:39-73``, here the
partitioned-parquet KV sink of pipelines/kg.py) must be a PERSISTED
sharded artifact each new crawl merges into — never a whole-corpus
re-extract + re-dedup. This module closes that lifecycle the same way
``retrieval.update_bm25_index`` closed the index's and
``web.update_url_state`` closed the url state's:

- state = one folded row per canonical ``(subj, pred, obj)`` triple
  with the exact payload-merge semantics of the in-pipeline dedup
  (stages/shuffle.py module docstring: score max, n_mentions sum, ids
  min-non-null, witness url min, sentence_ids bottom-64 union), keyed
  into ``shard=<k>/`` hive dirs by a STABLE md5 of the triple key;
- each crawl delta runs the normal KG pipeline (actor pools and all),
  folds crawl-locally, then merges SHARD-PRUNED: shards the delta's
  triples do not touch are carried forward at file level (copy — never
  read, decoded, or shuffled), touched shards pay a path-pruned read +
  one re-fold. Ingest cost scales with the delta, not the KG.

Update == rebuild row-for-row (pytest-enforced) because every payload
fold is associative + commutative — including the sentence_ids cap,
which keeps the 64 SMALLEST ids (a bottom-k fold: the bottom-64 of a
union equals the bottom-64 of the per-side bottom-64s). Meta rows
(pred beginning ``_``: dead letters, marker-drop accounting) are
pipeline bookkeeping, not knowledge — they are excluded from the state
(the partitioned runner routes them to ``_dead_letter/`` instead).

Non-SQL (triples come from the actor-pool extraction pipeline): the
driver records a rows-only check for ``kg_state_update``; exactness is
pytest-oracled (tests/test_kg_state.py) against both a from-scratch
rebuild and the one-shot pipeline over the concatenated crawls.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

STATE_KEYS = ["subj", "pred", "obj"]
STATE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("subj_id", pa.string()),
        ("obj_id", pa.string()),
        ("score", pa.float32()),
        ("url", pa.string()),
        ("sentence_ids", pa.list_(pa.int64())),
        ("n_mentions", pa.int64()),
        ("shard", pa.int64()),
    ]
)
STATE_COLS = [
    "subj",
    "pred",
    "obj",
    "subj_id",
    "obj_id",
    "score",
    "url",
    "sentence_ids",
    "n_mentions",
]


def _triple_shards(df: "pd.DataFrame", n_shards: int) -> np.ndarray:
    """Stable PERSISTED shard routing: md5 of the joined triple key
    (functions/textops.fingerprint — the repo's cross-process-stable
    key hash, same contract as web._url_shards)."""
    from ..functions import textops

    keys = (
        df["subj"].astype(str)
        + "\x1f"
        + df["pred"].astype(str)
        + "\x1f"
        + df["obj"].astype(str)
    )
    return np.fromiter(
        (int(textops.fingerprint(k)[:8], 16) % n_shards for k in keys),
        dtype=np.int64,
        count=len(df),
    )


def _crawl_partials(
    pages_path: str, n_shards: int, config=None
) -> "object":
    """One crawl → crawl-folded (STATE_COLS + shard) triple rows: the
    normal flagship pipeline (actor pools, combiner-first dedup), meta
    rows dropped, stable shard attached."""
    import pyarrow.compute as pc

    from .kg import DEFAULT_CONFIG, build_kg_pipeline

    triples = build_kg_pipeline(
        pages_path, config=config or DEFAULT_CONFIG
    )

    def shard(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.invert(pc.starts_with(batch["pred"], "_"))
        )
        df = batch.select(STATE_COLS).to_pandas()
        out = pa.table(
            {
                **{c: batch[c] for c in STATE_COLS},
                "shard": pa.array(
                    _triple_shards(df, n_shards), pa.int64()
                ),
            }
        )
        return out

    return triples.map_batches(shard, batch_format="pyarrow")


def _fold_shards(ds: "object", n_shards: int) -> "object":
    """(STATE_COLS + shard) rows → one folded row per triple, grouped
    by shard: the identical vectorized merge kernel as the in-pipeline
    dedup (stages/shuffle._merge_bucket), so state folding and
    pipeline dedup cannot drift apart."""
    from ..stages.joins import NO_FUSE_NUM_CPUS
    from ..stages.shuffle import _merge_bucket

    def fold(g: "pd.DataFrame") -> "pd.DataFrame":
        out = _merge_bucket(g.drop(columns=["shard"]), STATE_KEYS)
        out["shard"] = _triple_shards(out, n_shards)
        return out[STATE_COLS + ["shard"]]

    def to_arrow(batch: pa.Table) -> pa.Table:
        # normalize the pandas map_groups blocks to Arrow with the
        # exact state schema — union/sort over mixed pandas+arrow
        # blocks trips Ray's block-type assertion
        return batch.select(STATE_SCHEMA.names).cast(STATE_SCHEMA)

    return (
        ds.groupby("shard")
        .map_groups(fold, batch_format="pandas", num_cpus=NO_FUSE_NUM_CPUS)
        .map_batches(to_arrow, batch_format="pyarrow")
    )


def build_kg_state(
    pages_path: str, out_dir: str, n_shards: int = 16, config=None
) -> str:
    """Persist the triple store from a base crawl: hive-partitioned
    ``shard=<k>/`` parquet dirs + a one-row ``_meta.parquet`` recording
    n_shards. Atomic tmp+rename, so a killed build never leaves a
    half-state a later merge would trust."""
    import shutil

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    _fold_shards(
        _crawl_partials(pages_path, n_shards, config), n_shards
    ).write_parquet(tmp, partition_cols=["shard"])
    pq.write_table(
        pa.table({"n_shards": pa.array([n_shards], pa.int64())}),
        os.path.join(tmp, "_meta.parquet"),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir


def update_kg_state(
    state_dir: str, delta_pages_path: str, out_dir: str, config=None
) -> str:
    """Merge a DELTA crawl into a persisted triple store — shard-pruned
    incremental ingest (module docstring). Overlapping triples between
    base and delta MERGE (recrawled or re-reported relations bump
    n_mentions, advance score max, extend evidence) — that is the
    operator's purpose, mirroring update_url_state; contrast
    update_bm25_index, where base∩delta doc overlap raises."""
    import shutil

    import ray.data

    meta = pq.read_table(os.path.join(state_dir, "_meta.parquet"))
    n_shards = int(meta["n_shards"][0].as_py())

    # delta triples, crawl-folded, materialized (delta-bounded) —
    # consumed twice: the touched-shard probe and the merge union
    delta = _fold_shards(
        _crawl_partials(delta_pages_path, n_shards, config), n_shards
    ).materialize()
    touched = sorted(
        delta.groupby("shard")
        .count()
        .to_pandas()["shard"]
        .astype(int)
        .tolist()
    )
    touched_set = set(touched)

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    # untouched shards: file-level carry-forward (never read)
    for name in os.listdir(state_dir):
        if not name.startswith("shard="):
            continue
        if int(name.split("=", 1)[1]) not in touched_set:
            shutil.copytree(
                os.path.join(state_dir, name), os.path.join(tmp, name)
            )

    # touched shards: path-pruned read of ONLY those dirs, union with
    # the delta rows, one re-fold, write back
    if touched:
        base_paths = [
            os.path.join(state_dir, f"shard={k}", f)
            for k in touched
            if os.path.isdir(os.path.join(state_dir, f"shard={k}"))
            for f in sorted(
                os.listdir(os.path.join(state_dir, f"shard={k}"))
            )
            if f.endswith(".parquet")
        ]
        parts = delta
        if base_paths:
            base = ray.data.read_parquet(base_paths, columns=STATE_COLS)

            def reshard(batch: pa.Table) -> pa.Table:
                df = batch.select(STATE_KEYS).to_pandas()
                return pa.table(
                    {
                        **{c: batch[c] for c in STATE_COLS},
                        "shard": pa.array(
                            _triple_shards(df, n_shards), pa.int64()
                        ),
                    }
                ).cast(STATE_SCHEMA)

            parts = base.map_batches(
                reshard, batch_format="pyarrow"
            ).union(delta.select_columns(STATE_COLS + ["shard"]))
        _fold_shards(parts, n_shards).write_parquet(
            tmp, partition_cols=["shard"]
        )

    shutil.copy2(
        os.path.join(state_dir, "_meta.parquet"),
        os.path.join(tmp, "_meta.parquet"),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir


def read_kg_state(state_dir: str) -> pd.DataFrame:
    """All state rows (STATE_COLS), sorted by triple key — the
    comparison/reporting shim."""
    import ray.data

    paths = [
        os.path.join(state_dir, n, f)
        for n in sorted(os.listdir(state_dir))
        if n.startswith("shard=")
        for f in sorted(os.listdir(os.path.join(state_dir, n)))
        if f.endswith(".parquet")
    ]
    out = ray.data.read_parquet(paths, columns=STATE_COLS).to_pandas()
    out["sentence_ids"] = [list(x) for x in out["sentence_ids"]]
    return out.sort_values(STATE_KEYS).reset_index(drop=True)


def kg_delta_pages_parquet_for(sf_dir: str) -> str:
    """The 'next crawl' fixture (cached): deterministic pages for FRESH
    doc ids directly after the base range — new documents reporting
    relations over the same entity universe, so a realistic fraction of
    delta triples MERGE into existing state rows while others create
    new ones."""
    from ..sources.pages import doc_ids_from_documents, generate_pages

    base_ids = doc_ids_from_documents(
        os.path.join(sf_dir, "documents.parquet")
    )
    start = max(base_ids) + 1
    n_delta = max(50, len(base_ids) // 10)
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/fscr_pages/{tag}-{len(base_ids)}-s42-delta{n_delta}"
    marker = os.path.join(out_dir, "pages.parquet")
    if os.path.isfile(marker):
        return marker
    t = generate_pages(list(range(start, start + n_delta)))
    os.makedirs(out_dir, exist_ok=True)
    tmp = marker + ".tmp"
    pq.write_table(t, tmp, row_group_size=1024)
    os.replace(tmp, marker)
    return marker


def kg_state_update(sf_dir: str) -> pd.DataFrame:
    """Driver-gate shim (rows-only; non-SQL — actor-pipeline triples):
    build the persisted triple store from the base pages (cached, like
    the bm25 index and url state), merge the delta-crawl fixture
    through the shard-pruned path, read the merged state back.
    Equality with a from-scratch rebuild and with the one-shot
    pipeline over the concatenated crawls is pytest-enforced."""
    import shutil
    import tempfile

    from ..sources.pages import pages_parquet_for

    base = pages_parquet_for(sf_dir)
    delta = kg_delta_pages_parquet_for(sf_dir)
    state_dir = os.path.normpath(base) + "-kgstate"
    if not os.path.isfile(os.path.join(state_dir, "_meta.parquet")):
        build_kg_state(base, state_dir)
    out = tempfile.mkdtemp(prefix="fscr_kgstate_upd_") + "/state"
    try:
        update_kg_state(state_dir, delta, out)
        merged = read_kg_state(out)
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    return merged
