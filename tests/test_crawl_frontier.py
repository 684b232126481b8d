"""Structural invariants for the crawl-frontier scheduler
(pipelines/linkgraph.crawl_frontier) beyond the bit-exact DuckDB
parity test_queries_vs_duckdb enforces on the planted fixture:
composition wiring against an engine-rank replay, the recrawl-winner
staleness semantics (the url-state fold must feed the NEWEST snapshot
into the priority), the rank-0 (edgeless-host) path, and the two loud
guards (negative staleness, int64 overflow)."""

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines import linkgraph as L

NOW = "2024-06-01 00:00:00"


def _mk_pages(tmp_path, rows, name="pages.parquet"):
    """rows: list of (url, ts, [href hosts])."""
    urls, tss, htmls = [], [], []
    for url, ts, links in rows:
        urls.append(url)
        tss.append(ts)
        body = "<p>x</p>" + "".join(
            f'<a href="https://{h}/page/0">l</a>' for h in links
        )
        htmls.append(f"<html><body>{body}</body></html>".encode())
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(["x"] * len(urls), pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    )
    p = str(tmp_path / name)
    pq.write_table(t, p)
    return p


def _u(host, i):
    return f"https://{host}/page/{i}"


A, B, C = "examplea.com", "exampleb.com", "examplec.com"
T0 = dt.datetime(2024, 1, 1)


def test_frontier_matches_rank_times_staleness_replay(tmp_path):
    """Composition wiring: frontier rows == pandas replay of
    rank(engine pagerank, itself CTE-oracled) × staleness over the
    folded urls, cut by (priority DESC, url ASC)."""
    rows = [
        (_u(A, 1), T0, [B, C]),
        (_u(B, 2), dt.datetime(2024, 1, 3), [A]),
        (_u(C, 3), dt.datetime(2024, 2, 1), [A, B]),
        (_u(A, 4), dt.datetime(2024, 3, 1), [B]),
    ]
    p = _mk_pages(tmp_path, rows)
    got = L.crawl_frontier(p, now=NOW, k=3)

    ranks = L.host_pagerank(p).to_pandas().set_index("domain")["rank_micro"]
    now_e = int(pd.Timestamp(NOW).value // 10**9)
    exp = pd.DataFrame(
        {
            "url": [u for u, _, _ in rows],
            "domain": [u.split("/")[2] for u, _, _ in rows],
            "last_ts": [t for _, t, _ in rows],
        }
    )
    exp["rank_micro"] = (
        exp["domain"].map(ranks).fillna(0).astype("int64")
    )
    exp["priority"] = exp["rank_micro"] * (
        (now_e - exp["last_ts"].astype("int64") // 10**9) // 3600
    )
    exp = (
        exp.sort_values(["priority", "url"], ascending=[False, True])
        .head(3)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])


def test_frontier_uses_newest_snapshot_staleness(tmp_path):
    """A recrawled page enters the frontier ONCE, at the staleness of
    its NEWEST snapshot — the url-state fold (max warc_ts per
    canonical url) is what feeds the priority, including across the
    canonicalizer (http://www. variant folds into the https url)."""
    rows = [
        (_u(A, 1), T0, [B]),
        # same page, recrawled much later under a messy url variant
        ("http://www.examplea.com:80/page/1", dt.datetime(2024, 5, 1), [B]),
        (_u(B, 2), T0, [A]),
    ]
    p = _mk_pages(tmp_path, rows)
    got = L.crawl_frontier(p, now=NOW, k=10)
    assert len(got) == 2  # two canonical pages, not three snapshots
    row = got[got["url"] == _u(A, 1)].iloc[0]
    assert row["last_ts"] == pd.Timestamp("2024-05-01")
    # priority must be built from the NEWEST snapshot's staleness
    # (744 h to 2024-06-01), not the January one's (3648 h)
    assert row["priority"] == row["rank_micro"] * 744
    row_b = got[got["url"] == _u(B, 2)].iloc[0]
    assert row_b["priority"] == row_b["rank_micro"] * 3648


def test_frontier_rank_zero_hosts_still_scheduled(tmp_path):
    """A host with no edges at all gets rank 0 (LEFT join), priority 0
    — present in the output when k allows, cut deterministically by
    url ASC among the zeros."""
    rows = [
        (_u(A, 1), T0, [B]),
        (_u(B, 2), T0, [A]),
        (_u(C, 3), T0, []),  # edgeless host
    ]
    p = _mk_pages(tmp_path, rows)
    got = L.crawl_frontier(p, now=NOW, k=10)
    assert len(got) == 3
    c_row = got[got["url"] == _u(C, 3)].iloc[0]
    assert c_row["rank_micro"] == 0 and c_row["priority"] == 0
    assert got.iloc[-1]["url"] == _u(C, 3)  # zeros sort last


def test_frontier_per_host_cap_binds(tmp_path):
    """Politeness cap: at most c pages per host enter the ranking,
    and the winners are each host's HIGHEST-priority (= stalest)
    pages; the freed budget goes to other hosts."""
    rows = (
        # host A: 4 pages, staleness decreasing with the ts
        [(_u(A, i), dt.datetime(2024, 1, i), [B]) for i in range(1, 5)]
        + [(_u(B, 9), T0, [A])]
    )
    p = _mk_pages(tmp_path, rows)
    uncapped = L.crawl_frontier(p, now=NOW, k=4)
    capped = L.crawl_frontier(p, now=NOW, k=4, per_host_cap=2)
    got_a = capped[capped["domain"] == A]["url"].tolist()
    assert got_a == [_u(A, 1), _u(A, 2)]  # stalest two of host A
    # B/page/9 ties A/page/1 (equal rank by 2-node symmetry, equal
    # staleness hours) and cuts in by url ASC; A/page/3-4 are capped out
    assert capped["url"].tolist() == [_u(A, 1), _u(B, 9), _u(A, 2)]
    # the cap observably changed the answer: uncapped k=4 takes A3 too
    assert uncapped["url"].tolist() == [
        _u(A, 1), _u(B, 9), _u(A, 2), _u(A, 3)
    ]

    with pytest.raises(ValueError, match="per_host_cap"):
        L.crawl_frontier(p, now=NOW, k=3, per_host_cap=0)


def test_frontier_from_persisted_state_equals_one_shot(tmp_path):
    """Production shape: the frontier read from the PERSISTED url
    state (base build + a recrawl delta through the shard-pruned
    incremental merge) equals the one-shot corpus fold row-for-row —
    the state IS the fold, maintained delta by delta. With ``ranks=``
    supplied too (the persisted-rank production shape), no corpus
    input is consulted at all."""
    from finance_sc_relations_ray.pipelines import web as W

    base_rows = [
        (_u(A, 1), T0, [B, C]),
        (_u(B, 2), T0, [A]),
        (_u(C, 3), dt.datetime(2024, 2, 1), [A]),
    ]
    delta_rows = [
        # recrawl of A/page/1 under a messy variant, much later
        ("http://www.examplea.com:80/page/1", dt.datetime(2024, 5, 1), [B]),
    ]
    base = _mk_pages(tmp_path, base_rows, name="base.parquet")
    delta = _mk_pages(tmp_path, delta_rows, name="delta.parquet")
    all_pages = _mk_pages(tmp_path, base_rows + delta_rows, name="all.parquet")

    s0 = str(tmp_path / "state0")
    s1 = str(tmp_path / "state1")
    W.build_url_state(base, s0, n_shards=4)
    W.update_url_state(s0, delta, s1)

    # ranks come from the full crawl in both forms (the link graph is
    # host-bounded; only the url fold is what the state replaces)
    got = L.crawl_frontier(all_pages, now=NOW, k=10, state_dir=s1)
    exp = L.crawl_frontier(all_pages, now=NOW, k=10)
    pd.testing.assert_frame_equal(got, exp)

    # full production shape: persisted state + injected rank table —
    # pages_path is never read (proven by passing a bogus path)
    ranks = L.host_pagerank(all_pages).materialize()
    got2 = L.crawl_frontier(
        str(tmp_path / "does-not-exist.parquet"),
        now=NOW, k=10, state_dir=s1, ranks=ranks,
    )
    pd.testing.assert_frame_equal(got2, exp)
    assert got[got["url"] == _u(A, 1)].iloc[0]["last_ts"] == pd.Timestamp(
        "2024-05-01"
    )


def test_frontier_negative_staleness_raises(tmp_path):
    # the ValueError surfaces wrapped in RayTaskError; match on message
    p = _mk_pages(tmp_path, [(_u(A, 1), dt.datetime(2025, 1, 1), [B])])
    with pytest.raises(Exception, match="newer than"):
        L.crawl_frontier(p, now=NOW, k=5)


def test_priority_overflow_guard_raises():
    """rank × staleness-hours beyond int64 raises loudly instead of
    wrapping (numpy int64 mul wraps silently — a wrapped priority
    would silently re-order the frontier). Unreachable for any
    realistic rank/staleness after the whole-hours flooring, so the
    guard is unit-tested directly."""
    import numpy as np

    rank = np.array([10**12], dtype=np.int64)  # all mass on one host
    stale_h = np.array([10**7], dtype=np.int64)  # ~1,100 years
    with pytest.raises(OverflowError, match="overflow"):
        L._priority(rank, stale_h)
    # and the in-range path is exact
    assert L._priority(
        np.array([3, 0], dtype=np.int64), np.array([5, 9], dtype=np.int64)
    ).tolist() == [15, 0]
