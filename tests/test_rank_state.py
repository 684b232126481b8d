"""Incremental rank state (pipelines/linkgraph.build_rank_state /
update_rank_state) — the frontier's persisted importance artifact —
plus the r4-advice regressions on crawl_frontier: sub-second last_ts
carry, per-row overflow guard, auto-now derivation, and the capped
path exercised across MULTIPLE blocks."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from finance_sc_relations_ray.pipelines import linkgraph as L
from finance_sc_relations_ray.pipelines import web as W
from tests.test_crawl_frontier import A, B, C, T0, _mk_pages, _u

NOW = "2024-06-01 00:00:00"


def _ranks_df(state_dir):
    return (
        L.read_rank_state(state_dir)
        .to_pandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )


def _edges_df(state_dir):
    import pyarrow.dataset as pads

    return (
        pads.dataset(L.rank_state_edge_paths(state_dir))
        .to_table()
        .to_pandas()[["src_domain", "dst_domain", "n_links"]]
        .sort_values(["src_domain", "dst_domain"])
        .reset_index(drop=True)
    )


def test_update_equals_rebuild(tmp_path, ray_session):
    """update(build(base), delta) == build(base + delta), for both the
    folded edge shards and the refreshed ranks — the edge fold is
    associative, the rank recurrence integer-exact."""
    base_rows = [
        (_u(A, 1), T0, [B, C, B]),
        (_u(B, 2), T0, [A]),
        (_u(C, 3), T0, [A, B]),
    ]
    delta_rows = [
        (_u(A, 4), dt.datetime(2024, 2, 1), [B]),  # bumps an existing edge
        (_u(C, 5), dt.datetime(2024, 2, 1), [C, A]),  # self-loop + repeat
    ]
    base = _mk_pages(tmp_path, base_rows, name="base.parquet")
    delta = _mk_pages(tmp_path, delta_rows, name="delta.parquet")
    both = _mk_pages(tmp_path, base_rows + delta_rows, name="both.parquet")

    s0 = str(tmp_path / "s0")
    s1 = str(tmp_path / "s1")
    full = str(tmp_path / "full")
    L.build_rank_state(base, s0, n_shards=4)
    L.update_rank_state(s0, delta, s1)
    L.build_rank_state(both, full, n_shards=4)

    pd.testing.assert_frame_equal(_edges_df(s1), _edges_df(full))
    pd.testing.assert_frame_equal(_ranks_df(s1), _ranks_df(full))
    # and the ranks equal the corpus-scanning one-shot pagerank
    one = (
        L.host_pagerank(both)
        .to_pandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(_ranks_df(s1), one)


def test_update_prunes_untouched_shards(tmp_path, ray_session):
    """Shards the delta does not touch are carried forward at FILE
    level — byte-identical, proving no read/decode/rewrite happened."""
    import os

    base_rows = [(_u(A, 1), T0, [B]), (_u(B, 2), T0, [A]), (_u(C, 3), T0, [B])]
    # delta only adds edges from host A -> its shard alone is touched
    delta_rows = [(_u(A, 9), dt.datetime(2024, 3, 1), [C])]
    base = _mk_pages(tmp_path, base_rows, name="base.parquet")
    delta = _mk_pages(tmp_path, delta_rows, name="delta.parquet")
    s0 = str(tmp_path / "s0")
    s1 = str(tmp_path / "s1")
    L.build_rank_state(base, s0, n_shards=8)
    touched = set(L._domain_shards(pd.Series([A]), 8).tolist())
    L.update_rank_state(s0, delta, s1)
    carried = 0
    for name in sorted(os.listdir(s0)):
        if not name.startswith("shard="):
            continue
        k = int(name.split("=", 1)[1])
        if k in touched:
            continue
        f0 = sorted(os.listdir(os.path.join(s0, name)))
        f1 = sorted(os.listdir(os.path.join(s1, name)))
        assert f0 == f1
        for f in f0:
            with open(os.path.join(s0, name, f), "rb") as a, open(
                os.path.join(s1, name, f), "rb"
            ) as b:
                assert a.read() == b.read(), f"{name}/{f} was rewritten"
            carried += 1
    assert carried >= 1  # the prune actually exercised


def test_frontier_carries_subsecond_last_ts(tmp_path, ray_session):
    """r4 advice #1: the frontier's last_ts column is the ORIGINAL
    snapshot timestamp (µs granularity), not a whole-second floor;
    priority still uses whole-hour staleness."""
    ts = dt.datetime(2024, 1, 1, 0, 0, 0, 123456)
    p = _mk_pages(tmp_path, [(_u(A, 1), ts, [B]), (_u(B, 2), T0, [A])])
    got = L.crawl_frontier(p, now=NOW, k=5)
    row = got[got["url"] == _u(A, 1)].iloc[0]
    assert row["last_ts"] == pd.Timestamp("2024-01-01 00:00:00.123456")
    # staleness floored to whole hours of the floored-seconds epoch
    now_e = int(pd.Timestamp(NOW).value // 10**9)
    t_e = int(pd.Timestamp(ts).value // 10**9)  # floor to seconds
    assert row["priority"] == row["rank_micro"] * ((now_e - t_e) // 3600)


def test_priority_guard_not_spurious():
    """r4 advice #2: the guard checks per-ROW products — a big rank on
    a fresh row plus a big staleness on a rank-0 row must NOT raise
    (the old max×max pairing did)."""
    rank = np.array([10**12, 0], dtype=np.int64)
    stale = np.array([1, 10**7], dtype=np.int64)
    assert L._priority(rank, stale).tolist() == [10**12, 0]
    # genuine per-row overflow still raises
    with pytest.raises(OverflowError, match="overflow"):
        L._priority(
            np.array([10**12], dtype=np.int64),
            np.array([10**7], dtype=np.int64),
        )


def test_frontier_auto_now(tmp_path, ray_session):
    """r4 advice #3: now=None derives now = max(warc_ts) + offset — no
    fixed-horizon cliff; equals the explicit-now run at that instant,
    for both the corpus and the persisted-state paths."""
    rows = [
        (_u(A, 1), T0, [B]),
        (_u(B, 2), dt.datetime(2024, 2, 1), [A]),
    ]
    p = _mk_pages(tmp_path, rows)
    mx = pd.Timestamp("2024-02-01")
    explicit = str(mx + pd.Timedelta(seconds=L.FRONTIER_AUTO_OFFSET_S))
    pd.testing.assert_frame_equal(
        L.crawl_frontier(p, now=None, k=5),
        L.crawl_frontier(p, now=explicit, k=5),
    )
    s = str(tmp_path / "state")
    W.build_url_state(p, s, n_shards=4)
    pd.testing.assert_frame_equal(
        L.crawl_frontier(p, now=None, k=5, state_dir=s),
        L.crawl_frontier(p, now=explicit, k=5, state_dir=s),
    )


def test_capped_frontier_multiblock_parity(ray_session):
    """r4 advice #4: the capped path's per-block prune + host-bucketed
    merge exercised across MULTIPLE input blocks (the sharded url
    state reads as ≥2 parquet files → ≥2 blocks), checked against the
    capped SQL oracle at sf0.001."""
    import duckdb
    import os

    sf = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
    links = L.pages_with_links_parquet_for(sf)
    state = os.path.normpath(os.path.dirname(links)) + "-urlstate8"
    if not os.path.isfile(os.path.join(state, "_meta.parquet")):
        W.build_url_state(links, state, n_shards=8)
    assert len(W.state_parquet_paths(state)) >= 2  # multi-block input
    got = L.crawl_frontier(
        links, now=NOW, k=100, per_host_cap=3, state_dir=state
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    exp = con.execute(
        L.crawl_frontier_capped_oracle(now=NOW, k=100, per_host_cap=3)
    ).fetchdf()
    assert got["url"].tolist() == exp["url"].tolist()
    assert got["priority"].tolist() == exp["priority"].tolist()
    assert got["rank_micro"].tolist() == exp["rank_micro"].tolist()


def test_stateful_frontier_and_pagerank_state_queries(ray_session):
    """The two driver-gate shims run and agree with their corpus-scan
    twins at sf0.001 (the gate itself hash-checks them against the
    recursive-CTE oracles)."""
    import os

    sf = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")
    links = L.pages_with_links_parquet_for(sf)
    inc = L.host_pagerank_state(sf)
    one = (
        L.host_pagerank(links)
        .to_pandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(inc, one)
    st = L.crawl_frontier_stateful(sf, k=50)
    base = L.crawl_frontier(links, now=None, k=50)
    pd.testing.assert_frame_equal(st, base)


def test_update_with_linkless_delta_is_noop(tmp_path, ray_session):
    """Regression: a delta crawl whose pages carry NO links (empty edge
    partials) must carry every shard forward unchanged instead of
    KeyError-ing on the schema-less empty Dataset; same guard covers
    web.update_url_state's empty-delta path."""
    base = _mk_pages(
        tmp_path, [(_u(A, 1), T0, [B]), (_u(B, 2), T0, [A])],
        name="base.parquet",
    )
    delta = _mk_pages(
        tmp_path, [(_u(A, 9), dt.datetime(2024, 3, 1), [])],
        name="delta.parquet",
    )
    s0 = str(tmp_path / "s0")
    s1 = str(tmp_path / "s1")
    L.build_rank_state(base, s0, n_shards=4)
    L.update_rank_state(s0, delta, s1)
    pd.testing.assert_frame_equal(_ranks_df(s0), _ranks_df(s1))
    pd.testing.assert_frame_equal(_edges_df(s0), _edges_df(s1))
