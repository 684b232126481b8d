"""Incremental KG triple-store ingest (pipelines/kg_state.py): the
shard-pruned merge must equal a from-scratch rebuild row-for-row
(fold associativity, incl. the sentence_ids bottom-64 cap), untouched
shards must be carried forward at file level (byte-identical — never
read or re-folded), overlapping triples must MERGE, and meta rows must
never enter the state."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines import kg_state as K
from finance_sc_relations_ray.sources.pages import generate_pages


@pytest.fixture(scope="module")
def crawls(tmp_path_factory):
    d = tmp_path_factory.mktemp("kgstate")
    base = str(d / "base.parquet")
    delta = str(d / "delta.parquet")
    both = str(d / "both.parquet")
    pq.write_table(generate_pages(list(range(120))), base)
    pq.write_table(generate_pages(list(range(120, 160))), delta)
    pq.write_table(generate_pages(list(range(160))), both)
    return {"dir": d, "base": base, "delta": delta, "both": both}


@pytest.fixture(scope="module")
def base_state(crawls):
    out = str(crawls["dir"] / "state_base")
    K.build_kg_state(crawls["base"], out)
    return out


def _shard_bytes(state_dir):
    out = {}
    for name in sorted(os.listdir(state_dir)):
        if not name.startswith("shard="):
            continue
        blobs = []
        sd = os.path.join(state_dir, name)
        for f in sorted(os.listdir(sd)):
            with open(os.path.join(sd, f), "rb") as fh:
                blobs.append((f, fh.read()))
        out[name] = blobs
    return out


def test_update_equals_rebuild(crawls, base_state):
    upd = str(crawls["dir"] / "state_upd")
    K.update_kg_state(base_state, crawls["delta"], upd)
    merged = K.read_kg_state(upd)

    reb = str(crawls["dir"] / "state_rebuild")
    K.build_kg_state(crawls["both"], reb)
    rebuilt = K.read_kg_state(reb)

    pd.testing.assert_frame_equal(merged, rebuilt)
    # the delta genuinely added triples
    base = K.read_kg_state(base_state)
    assert len(merged) > len(base)
    assert merged["n_mentions"].sum() > base["n_mentions"].sum()


def test_untouched_shards_carried_forward_byte_identical(crawls, base_state):
    # a tiny delta (3 pages → a handful of triples) leaves most of the
    # 16 shards untouched — those shard files must be byte-identical
    # (proving they were copied, never read / re-folded / re-written)
    tiny = str(crawls["dir"] / "tiny.parquet")
    pq.write_table(generate_pages([500, 501, 502]), tiny)
    upd = str(crawls["dir"] / "state_tiny_upd")
    K.update_kg_state(base_state, tiny, upd)

    before = _shard_bytes(base_state)
    after = _shard_bytes(upd)
    identical = [k for k in before if after.get(k) == before[k]]
    changed = [k for k in before if after.get(k) != before[k]]
    assert identical, "tiny delta should leave some shards untouched"
    # and the update is still exact vs rebuild over base+tiny
    both = str(crawls["dir"] / "base_plus_tiny.parquet")
    pq.write_table(
        generate_pages(list(range(120)) + [500, 501, 502]), both
    )
    reb = str(crawls["dir"] / "state_tiny_rebuild")
    K.build_kg_state(both, reb)
    pd.testing.assert_frame_equal(K.read_kg_state(upd), K.read_kg_state(reb))
    assert changed or K.read_kg_state(upd).equals(K.read_kg_state(base_state))


def test_overlapping_triples_merge_not_duplicate(crawls, base_state):
    # re-ingesting the SAME crawl must keep one row per triple with
    # n_mentions doubled and identical evidence (same sentence ids,
    # same score, same witness url)
    upd = str(crawls["dir"] / "state_selfmerge")
    K.update_kg_state(base_state, crawls["base"], upd)
    base = K.read_kg_state(base_state)
    merged = K.read_kg_state(upd)
    assert len(merged) == len(base)
    assert merged[K.STATE_KEYS].equals(base[K.STATE_KEYS])
    assert (
        merged["n_mentions"].to_numpy() == 2 * base["n_mentions"].to_numpy()
    ).all()
    assert merged["score"].equals(base["score"])
    assert merged["url"].equals(base["url"])
    assert [list(x) for x in merged["sentence_ids"]] == [
        list(x) for x in base["sentence_ids"]
    ]


def test_no_meta_rows_in_state(base_state):
    state = K.read_kg_state(base_state)
    assert not state["pred"].str.startswith("_").any()


def test_driver_shim_runs_and_is_folded():
    out = K.kg_state_update("/root/testdata/sf0.001")
    assert len(out) > 0
    # folded: one row per triple key
    assert not out.duplicated(K.STATE_KEYS).any()
    assert (out["n_mentions"] >= 1).all()
