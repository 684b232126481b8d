"""BM25 retrieval, domain stats and the bounded rolling window —
behavioral tests beyond the DuckDB parity gate (which covers all
three at sf0.001 in test_queries_vs_duckdb.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines.relational import events_rolling
from finance_sc_relations_ray.pipelines.retrieval import bm25_search
from finance_sc_relations_ray.pipelines.web import domain_stats

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- BM25 ----
def _mini_corpus(tmp_path, texts):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_bm25_ranks_stuffed_doc_first(tmp_path):
    texts = (
        ["filler words only nothing relevant here at all"] * 20
        + ["query vector stream query vector stream query"]
        + ["one query mention inside a fairly long padding document " * 3]
    )
    out = bm25_search(_mini_corpus(tmp_path, texts), k=5)
    assert out["doc_id"].iloc[0] == 20
    # only matching docs are returned, scores strictly positive & sorted
    assert (out["score"] > 0).all()
    assert list(out["score"]) == sorted(out["score"], reverse=True)
    assert len(out) == 2  # exactly the two docs containing query terms


def test_bm25_length_normalization(tmp_path):
    # same tf, shorter doc → higher score (the b·dl/avgdl term)
    texts = [
        "query short",
        "query " + "padding " * 50,
        "unrelated text " * 5,
    ]
    out = bm25_search(_mini_corpus(tmp_path, texts), query=("query",), k=3)
    assert list(out["doc_id"])[:2] == [0, 1]
    assert out["score"].iloc[0] > out["score"].iloc[1]


def test_bm25_no_match_returns_empty(tmp_path):
    out = bm25_search(
        _mini_corpus(tmp_path, ["nothing here", "still nothing"]),
        query=("zzzabsent",),
    )
    assert len(out) == 0


def test_bm25_exactness_bound_raises(tmp_path, monkeypatch):
    import finance_sc_relations_ray.pipelines.retrieval as rt

    # force the ≤2^53 guard to trip without a 10^8-token corpus
    monkeypatch.setattr(rt, "_C_TF", 2**60)
    with pytest.raises(ValueError, match="exactness bound"):
        bm25_search(_mini_corpus(tmp_path, ["query text"]))


# ----------------------------------------------------- domain stats ----
def test_domain_stats_unparseable_url_raises(tmp_path):
    p = tmp_path / "pages.parquet"
    pq.write_table(
        pa.table(
            {
                "url": pa.array(["not a url"], pa.string()),
                "warc_ts": pa.array(
                    [pd.Timestamp("2024-01-01")], pa.timestamp("us")
                ),
            }
        ),
        str(p),
    )
    with pytest.raises(Exception, match="unparseable page url"):
        domain_stats(str(p)).to_pandas()


def test_domain_stats_partitions_doc_ids(tmp_path):
    from finance_sc_relations_ray.sources.pages import pages_parquet_for

    out = domain_stats(pages_parquet_for(SF)).to_pandas()
    # every doc lands in exactly one domain; totals add up
    n_docs = len(pq.read_table(os.path.join(SF, "documents.parquet")))
    assert out["n_pages"].sum() == n_docs
    assert out["domain"].is_unique
    # doc-id ranges are consistent with the modulus partitioning
    for _, r in out.iterrows():
        d = int(r["domain"].removeprefix("example").removesuffix(".com"))
        assert r["min_doc_id"] % 127 == d
        assert r["max_doc_id"] % 127 == d


# ---------------------------------------------------- rolling window ---
def test_events_rolling_matches_bruteforce():
    got = (
        events_rolling(SF)
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    ev = (
        pq.read_table(os.path.join(SF, "events.parquet"))
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    cents = np.rint(ev["value"].to_numpy() * 100.0).astype(np.int64)
    exp_sum, exp_n, exp_max = [], [], []
    for uid, idx in ev.groupby("user_id", sort=False).indices.items():
        c = cents[idx]
        for i in range(len(c)):
            w = c[max(0, i - 6) : i + 1]
            exp_sum.append(w.sum())
            exp_n.append(len(w))
            exp_max.append(w.max())
    assert got["roll_n"].tolist() == exp_n
    assert np.array_equal(
        np.rint(got["roll_sum"].to_numpy() * 100.0).astype(np.int64),
        np.array(exp_sum),
    )
    assert np.array_equal(
        np.rint(got["roll_max"].to_numpy() * 100.0).astype(np.int64),
        np.array(exp_max),
    )


# ------------------------------------------------- indexed BM25 --------
def test_bm25_indexed_pair_exact_with_scan_path(tmp_path):
    from finance_sc_relations_ray.pipelines.retrieval import (
        bm25_search_indexed,
        build_bm25_index,
    )

    texts = [
        "query vector stream engine",
        "vector vector stream " + "pad " * 30,
        "no relevant terms at all",
        "query " * 5,
    ]
    sf = _mini_corpus(tmp_path, texts)
    idx = build_bm25_index(sf, out_dir=str(tmp_path / "idx"))
    a = bm25_search(sf)
    b = bm25_search_indexed(sf, index_dir=idx)
    pd.testing.assert_frame_equal(a, b)
    # a different query against the SAME cached index, still exact
    a2 = bm25_search(sf, query=("pad", "engine"), k=2)
    b2 = bm25_search_indexed(sf, query=("pad", "engine"), k=2, index_dir=idx)
    pd.testing.assert_frame_equal(a2, b2)


def test_bm25_index_build_is_cached_and_atomic(tmp_path):
    from finance_sc_relations_ray.pipelines.retrieval import build_bm25_index

    sf = _mini_corpus(tmp_path, ["query one", "query two"])
    out = str(tmp_path / "idx2")
    p1 = build_bm25_index(sf, out_dir=out)
    stats = os.path.join(p1, "stats.parquet")
    mtime = os.path.getmtime(stats)
    p2 = build_bm25_index(sf, out_dir=out)  # cache hit: no rebuild
    assert p1 == p2 and os.path.getmtime(stats) == mtime
    # a half-built directory (no stats.parquet) is NOT trusted
    import shutil

    os.remove(stats)
    build_bm25_index(sf, out_dir=out)
    assert os.path.exists(stats)
    shutil.rmtree(out)


def test_bm25_duplicate_query_terms_pair_exact(tmp_path):
    # a duplicated term doubles its contribution in the scan path and
    # the SQL oracle; the indexed path must agree (regression: the
    # first cut kept only the LAST position's index and zeroed tf_1)
    from finance_sc_relations_ray.pipelines.retrieval import (
        bm25_search_indexed,
        build_bm25_index,
    )

    texts = [
        "query query query padding",
        "query other words here",
        "nothing relevant",
        "query vector query stream",
    ]
    sf = _mini_corpus(tmp_path, texts)
    idx = build_bm25_index(sf, out_dir=str(tmp_path / "idxdup"))
    q = ("query", "query")
    a = bm25_search(sf, query=q, k=4)
    b = bm25_search_indexed(sf, query=q, k=4, index_dir=idx)
    pd.testing.assert_frame_equal(a, b)
    assert (a["tf_1"] == a["tf_2"]).all()
    assert a["tf_1"].iloc[0] > 0


def test_update_bm25_index_equals_rebuild(tmp_path):
    from finance_sc_relations_ray.pipelines.retrieval import (
        bm25_search_indexed,
        build_bm25_index,
        update_bm25_index,
    )

    base_texts = [
        "query vector stream alpha",
        "vector beta gamma",
        "plain filler words",
    ]
    delta_texts = ["query query delta stream", "epsilon vector"]

    def corpus(name, texts, start_id):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        range(start_id, start_id + len(texts)), pa.int64()
                    ),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        return str(d)

    base = corpus("base", base_texts, 0)
    delta = corpus("delta", delta_texts, len(base_texts))
    full = corpus("full", base_texts + delta_texts, 0)

    base_idx = build_bm25_index(base, out_dir=str(tmp_path / "base_idx"))
    merged = update_bm25_index(
        base_idx, delta, out_dir=str(tmp_path / "merged_idx")
    )
    rebuilt = build_bm25_index(full, out_dir=str(tmp_path / "full_idx"))

    def read_sorted(idx, sub):
        return (
            pq.read_table(os.path.join(idx, sub))
            .to_pandas()
            .sort_values(["term", "shard"] if sub == "postings" else ["doc_id"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(
        read_sorted(merged, "postings"), read_sorted(rebuilt, "postings")
    )
    pd.testing.assert_frame_equal(
        read_sorted(merged, "norms"), read_sorted(rebuilt, "norms")
    )
    assert pq.read_table(os.path.join(merged, "stats.parquet")).equals(
        pq.read_table(os.path.join(rebuilt, "stats.parquet"))
    )
    # serving results identical through either index
    a = bm25_search_indexed(full, index_dir=merged)
    b = bm25_search_indexed(full, index_dir=rebuilt)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_update_bm25_index_rejects_duplicate_ids(tmp_path):
    from finance_sc_relations_ray.pipelines.retrieval import (
        build_bm25_index,
        update_bm25_index,
    )

    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["query one", "two"], pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    idx = build_bm25_index(str(d), out_dir=str(tmp_path / "i"))
    with pytest.raises(ValueError, match="already exist"):
        update_bm25_index(idx, str(d), out_dir=str(tmp_path / "i2"))


# ------------------------------------------------ url-canonical dedup ---


def test_canonicalize_urls_policy():
    from finance_sc_relations_ray.pipelines.web import canonicalize_urls

    raw = pd.Series(
        [
            "http://WWW.Example5.COM:80/page/3?utm_source=x&fbclid=1#top",
            "https://example5.com:443/page/3/",
            "https://example5.com/page/3?a=1&utm_medium=m&b=2",
            "https://example5.com/page/3?ref=rss",
            "http://example5.com:8080/page/3",
            "https://example5.com/",
        ]
    )
    assert canonicalize_urls(raw).tolist() == [
        "https://example5.com/page/3",
        "https://example5.com/page/3",
        "https://example5.com/page/3?a=1&b=2",  # param order preserved
        "https://example5.com/page/3",
        "https://example5.com:8080/page/3",  # non-default port kept
        "https://example5.com",
    ]


def test_canonicalize_urls_unparseable_raises():
    from finance_sc_relations_ray.pipelines.web import canonicalize_urls

    with pytest.raises(ValueError, match="unparseable url"):
        canonicalize_urls(pd.Series(["ftp://x.com/a"]))


def _write_pages(path, rows):
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [pd.Timestamp(r[1]) for r in rows], pa.timestamp("us")
                ),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(path),
    )


def test_url_dedup_merges_across_files(tmp_path):
    """Snapshots of one page split across parquet FILES (hence read
    blocks) must still merge: the combiner exchange is what's under
    test, not the per-batch groupby."""
    from finance_sc_relations_ray.pipelines.web import url_dedup_pages

    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(
        d / "a.parquet",
        [("https://a.com/x", "2024-01-01", "old"),
         ("https://b.com/y", "2024-01-02", "only")],
    )
    _write_pages(
        d / "b.parquet",
        [("http://WWW.a.com:80/x?utm_source=f#s", "2024-01-03", "new")],
    )
    out = (
        url_dedup_pages(str(d))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert out["url"].tolist() == ["https://a.com/x", "https://b.com/y"]
    assert out["n_dups"].tolist() == [2, 1]
    assert pd.Timestamp(out["last_ts"][0]) == pd.Timestamp("2024-01-03")


def test_url_keep_latest_winner_rows(tmp_path):
    from finance_sc_relations_ray.pipelines.web import (
        url_keep_latest_pages_ds,
    )

    d = tmp_path / "pages"
    d.mkdir()
    # page A: later snapshot wins; page C: ts TIE -> lexicographically
    # larger RAW url wins (the https:// raw beats the http://WWW. raw)
    _write_pages(
        d / "a.parquet",
        [("https://a.com/x", "2024-01-01", "a-old"),
         ("https://c.com/x?a=1", "2024-01-05", "c-https")],
    )
    _write_pages(
        d / "b.parquet",
        [("http://WWW.a.com:80/x?utm_source=f", "2024-01-03", "a-new"),
         ("http://WWW.c.com:80/x?a=1&utm_source=t", "2024-01-05",
          "c-http-www")],
    )
    out = (
        url_keep_latest_pages_ds(str(d))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert out["url"].tolist() == ["https://a.com/x", "https://c.com/x?a=1"]
    assert out["text"].tolist() == ["a-new", "c-https"]
    assert pd.Timestamp(out["warc_ts"][0]) == pd.Timestamp("2024-01-03")


def test_url_dedup_variant_planting_end_to_end():
    """The driver-gated path: variant-planted pages at sf0.001 — every
    doc_id % 10 in (0, 5) group merges to n_dups=2, and keep-latest
    picks the recrawl text for %10==0 but the ORIGINAL for %10==5."""
    from finance_sc_relations_ray.pipelines.web import (
        pages_with_url_variants_parquet_for,
        url_dedup_pages,
        url_keep_latest_pages_ds,
    )

    p = pages_with_url_variants_parquet_for(SF)
    dd = url_dedup_pages(p).to_pandas()
    ids = dd["url"].str.extract(r"/page/(\d+)$")[0].astype(int)
    assert (dd["n_dups"] == 1 + (ids % 10).isin([0, 5])).all()
    kl = url_keep_latest_pages_ds(p).to_pandas()
    kids = kl["url"].str.extract(r"/page/(\d+)$")[0].astype(int)
    assert len(kl) == len(dd)
    assert (kl["text"].str.endswith(" (recrawl)") == (kids % 10 == 0)).all()
    assert not kl["text"].str.endswith(" (stale crawl)").any()


# --------------------------------------------- incremental url state ---


def test_url_state_update_equals_rebuild(tmp_path):
    """update(build(base), delta) must be row-identical to
    build(base ∪ delta) — including a url that RECRAWLS across the
    base/delta boundary (n_dups sums, last_ts advances)."""
    from finance_sc_relations_ray.pipelines.web import (
        build_url_state,
        read_url_state,
        update_url_state,
    )

    base_rows = [
        ("https://a.com/x", "2024-01-01", "a1"),
        ("https://b.com/y", "2024-01-02", "b1"),
        ("http://WWW.a.com:80/x?utm_source=f", "2024-01-03", "a2"),
    ]
    delta_rows = [
        ("https://a.com/x/", "2024-02-01", "a3"),  # recrawl of base url
        ("https://c.com/z", "2024-02-02", "c1"),  # brand-new url
    ]
    b = tmp_path / "base"
    d = tmp_path / "delta"
    both = tmp_path / "both"
    for p, rows in [(b, base_rows), (d, delta_rows),
                    (both, base_rows + delta_rows)]:
        p.mkdir()
        _write_pages(p / "pages.parquet", rows)
    s_base = build_url_state(str(b / "pages.parquet"),
                             str(tmp_path / "s_base"), n_shards=4)
    merged = update_url_state(s_base, str(d / "pages.parquet"),
                              str(tmp_path / "s_merged"))
    rebuilt = build_url_state(str(both / "pages.parquet"),
                              str(tmp_path / "s_rebuilt"), n_shards=4)
    got, exp = read_url_state(merged), read_url_state(rebuilt)
    pd.testing.assert_frame_equal(got, exp)
    a = got[got["url"] == "https://a.com/x"].iloc[0]
    assert a["n_dups"] == 3
    assert pd.Timestamp(a["last_ts"]) == pd.Timestamp("2024-02-01")


def test_url_state_update_prunes_untouched_shards(tmp_path):
    """Shards the delta does not touch must carry forward at FILE
    level: byte-identical files, proving they were copied — never
    read, re-folded, or re-written."""
    import os

    from finance_sc_relations_ray.pipelines.web import (
        _url_shards,
        build_url_state,
        update_url_state,
    )

    n_shards = 8
    base_rows = [
        (f"https://h{i}.com/p", "2024-01-01", f"t{i}") for i in range(40)
    ]
    b = tmp_path / "base"
    b.mkdir()
    _write_pages(b / "pages.parquet", base_rows)
    s_base = build_url_state(str(b / "pages.parquet"),
                             str(tmp_path / "s"), n_shards=n_shards)
    # a delta touching exactly one url (hence one shard)
    d = tmp_path / "delta"
    d.mkdir()
    _write_pages(d / "pages.parquet",
                 [("https://h0.com/p", "2024-03-01", "re")])
    touched = int(_url_shards(pd.Series(["https://h0.com/p"]), n_shards)[0])
    merged = update_url_state(s_base, str(d / "pages.parquet"),
                              str(tmp_path / "s2"))
    for k in range(n_shards):
        bd = os.path.join(s_base, f"shard={k}")
        md = os.path.join(merged, f"shard={k}")
        if not os.path.isdir(bd):
            continue
        if k == touched:
            continue
        assert os.path.isdir(md), k
        bf = sorted(os.listdir(bd))
        assert sorted(os.listdir(md)) == bf, k
        for f in bf:
            with open(os.path.join(bd, f), "rb") as f1, open(
                os.path.join(md, f), "rb"
            ) as f2:
                assert f1.read() == f2.read(), (k, f)


def test_url_state_matches_one_shot_dedup():
    """State content == url_dedup_pages output on the same input, and
    the driver's incremental query shim lands on the oracle rows."""
    from finance_sc_relations_ray.pipelines.web import (
        pages_with_url_variants_parquet_for,
        url_dedup_pages,
        url_state_update,
    )

    p = pages_with_url_variants_parquet_for(SF)
    one_shot = (
        url_dedup_pages(p).to_pandas().sort_values("url")
        .reset_index(drop=True)
    )
    incr = url_state_update(SF)
    assert incr["url"].tolist() == one_shot["url"].tolist()
    assert incr["n_dups"].tolist() == one_shot["n_dups"].tolist()
    assert [pd.Timestamp(t) for t in incr["last_ts"]] == [
        pd.Timestamp(t) for t in one_shot["last_ts"]
    ]
