"""Hyperlink-graph analytics over the Common-Crawl-style pages table.

The north-star corpus is a web crawl; after per-page text extraction
(the reference's ingest surface, ``/root/reference/src/data_loading/
loader.py`` + SURVEY.md S1/M1), the canonical *structural* signal a
crawl-scale KG pipeline mines is the hyperlink graph: host-level edge
lists feed crawl prioritization, spam/hub detection, and the same
PageRank/centrality scores that weight extracted entities. This module
adds that family over the synthesized pages:

- :func:`pages_with_links_parquet_for` — the ANCHOR-PLANTED fixture:
  deterministic ``<a href>`` tags derived 1:1 from ``doc_id`` are
  injected into the page html OUTSIDE the ``<p>`` blocks, so the
  byte-identity extraction invariant (stages/extract.py) is untouched
  (pytest-asserted) while the link formula is SQL-replayable from the
  ``documents`` table — the same variant-planting trick as the url
  dedup gate (web.pages_with_url_variants_parquet_for).
- :func:`host_link_graph` — vectorized href extraction + combiner-first
  host-edge aggregation (one row per (batch, src, dst) crosses the
  exchange).
- :func:`host_pagerank` — the integer-exact PageRank core
  (graph.pagerank_edges_ds) on the symmetrized host graph; the DuckDB
  oracle replays the planting formula AND the int64 recurrence, so
  ranks match bit-for-bit.
- :func:`triangle_count` — distributed triangle counting via
  degree-ordered orientation (compact-forward): out-degree under the
  orientation is bounded by O(sqrt(2m)) regardless of raw-degree skew,
  so the per-node wedge fan-out a hub host would otherwise explode is
  bounded by construction (the same skew argument as the minhash star
  cap, pipelines/text.py).

- :func:`anchor_entity_mentions` — anchor-TEXT mining: the classic
  entity-linking signal ("pages linking to host H call it entity E" —
  the web-scale alias evidence the reference's alias items capture
  in-document, reporter.py:347-385, lifted to the link graph). The
  fixture plants gazetteer entity names as the anchor text, so the SQL
  oracle replays both the target-host and the anchor-entity formula.

Planting formula (replayed verbatim by the SQL oracles): page
``doc_id`` carries ``k = 1 + doc_id % 3`` outlinks; link ``j``
(0-based) targets host ``example{(doc_id*31 + j*17 + 7) % 127}.com``
with anchor text ``POOL[(doc_id*13 + j*7) % 61]`` (the 61-name default
gazetteer, embedded as literals in the oracle the way the minhash
permutation constants are). Self-links (target host == source host)
occur naturally and are kept in the edge table; the graph ops
(pagerank/triangles) drop them, as does the oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..sources.io import sized_read_parquet
from ..stages.joins import NO_FUSE_NUM_CPUS, bucket_lookup_join
from ..stages.shuffle import bucketed_sum_ds, salted_dedup

_URL_RE = r"^https?://([^/]+)/page/(\d+)$"
# href target host: the fixture plants absolute http(s) urls only
_HREF_RE = r'<a href="https?://([^/"]+)/'


# ------------------------------------------------ planted fixture ----


def pages_with_links_parquet_for(sf_dir: str) -> str:
    """Anchor-planted pages table (cached): the synthesized pages with
    DETERMINISTIC outlink anchors appended before the footer, derived
    1:1 from doc_id (module docstring formula) — hence SQL-replayable
    from ``documents`` while the extracted text stays byte-identical
    (anchors live outside the ``<p>`` blocks the extractor reads)."""
    import pyarrow.dataset as pads

    from ..sources.pages import _DEFAULT_FULL_NAMES, pages_parquet_for

    base_path = pages_parquet_for(sf_dir)
    # cache version suffix: bump when the planting formula changes
    out_dir = os.path.normpath(base_path) + "-links2"
    marker = os.path.join(out_dir, "pages.parquet")
    if os.path.isfile(marker):
        return marker
    t = pads.dataset(base_path).to_table()
    df = t.to_pandas()
    doc_id = (
        df["url"].str.extract(_URL_RE)[1].astype(np.int64).to_numpy()
    )
    pool = _DEFAULT_FULL_NAMES
    html = df["html"].to_numpy(copy=False)
    out_html = []
    for i in range(len(df)):
        d = int(doc_id[i])
        k = 1 + d % 3
        anchors = "".join(
            f'<a href="https://example{(d * 31 + j * 17 + 7) % 127}.com'
            f'/page/{d * 1000 + j}">'
            f"{pool[(d * 13 + j * 7) % len(pool)]}</a>"
            for j in range(k)
        ).encode("utf-8")
        out_html.append(html[i].replace(b"<footer>", anchors + b"<footer>"))
    df["html"] = out_html
    out = pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)
    os.makedirs(out_dir, exist_ok=True)
    tmp = marker + ".tmp"
    pq.write_table(out, tmp, row_group_size=1024)
    os.replace(tmp, marker)
    return marker


# --------------------------------------------- host edge extraction ----


def _edge_partials(batch: pa.Table) -> pa.Table:
    """(url, html) batch → per-batch (src_domain, dst_domain, n_links)
    combiner rows. Vectorized: one ``str.extract`` for the source host,
    one ``str.extractall`` sweep for every anchor target host."""
    url = batch["url"].to_pandas()
    src = url.str.extract(_URL_RE)[0]
    if src.isna().any():
        raise ValueError(
            f"unparseable page url: {url[src.isna()].iloc[0]!r}"
        )
    html = batch["html"].to_pandas().str.decode("utf-8")
    m = html.str.extractall(_HREF_RE)
    if len(m) == 0:
        return pa.table(
            {
                "src_domain": pa.array([], pa.string()),
                "dst_domain": pa.array([], pa.string()),
                "n_links": pa.array([], pa.int64()),
            }
        )
    dst = m[0]
    src_m = src.to_numpy()[m.index.get_level_values(0).to_numpy()]
    g = (
        pd.DataFrame({"src_domain": src_m, "dst_domain": dst.to_numpy()})
        .groupby(["src_domain", "dst_domain"], as_index=False, sort=False)
        .size()
    )
    return pa.table(
        {
            "src_domain": pa.array(g["src_domain"], pa.string()),
            "dst_domain": pa.array(g["dst_domain"], pa.string()),
            "n_links": pa.array(g["size"].to_numpy(), pa.int64()),
        }
    )


def _host_edges(pages_path: str) -> "object":
    """Aggregated directed host edge list (src_domain, dst_domain,
    n_links): map-only extraction partials → ONE coarse-bucketed sum
    (at most one row per (edge, batch) crosses the exchange; the edge
    table is host²-bounded, never corpus-sized)."""
    ds = sized_read_parquet(pages_path, columns=["url", "html"])
    partials = ds.map_batches(_edge_partials, batch_format="pyarrow")
    return bucketed_sum_ds(
        partials, keys=["src_domain", "dst_domain"], value_cols=["n_links"]
    )


def host_link_graph(pages_path: str) -> "object":
    """Host-level link graph over the anchor-planted pages: one row per
    (src_domain, dst_domain) with the total anchor count. The SQL
    oracle replays the planting formula from ``documents``, so a
    mis-extracted or mis-attributed href hash-mismatches."""
    return _host_edges(pages_path)


# ------------------------------------------- anchor-text mining ----

_ANCHOR_RE = r'<a href="https?://([^/"]+)/[^"]*">([^<]*)</a>'


def anchor_entity_mentions(pages_path: str) -> "object":
    """(dst_domain, anchor_text, n_links): how the web DESCRIBES each
    target host — the aggregate anchor-text table entity linking mines
    (anchor text is the canonical off-page alias signal; the in-window
    twin of the reference's in-document alias items, lifted to the
    link graph). Same combiner-first shape as :func:`host_link_graph`:
    one extractall sweep per batch, one host×entity-bounded sum."""

    def partial(batch: pa.Table) -> pa.Table:
        html = batch["html"].to_pandas().str.decode("utf-8")
        m = html.str.extractall(_ANCHOR_RE)
        if len(m) == 0:
            return pa.table(
                {
                    "dst_domain": pa.array([], pa.string()),
                    "anchor_text": pa.array([], pa.string()),
                    "n_links": pa.array([], pa.int64()),
                }
            )
        g = (
            pd.DataFrame(
                {
                    "dst_domain": m[0].to_numpy(),
                    "anchor_text": m[1].to_numpy(),
                }
            )
            .groupby(["dst_domain", "anchor_text"], as_index=False, sort=False)
            .size()
        )
        return pa.table(
            {
                "dst_domain": pa.array(g["dst_domain"], pa.string()),
                "anchor_text": pa.array(g["anchor_text"], pa.string()),
                "n_links": pa.array(g["size"].to_numpy(), pa.int64()),
            }
        )

    ds = sized_read_parquet(pages_path, columns=["html"])
    return bucketed_sum_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["dst_domain", "anchor_text"],
        value_cols=["n_links"],
    )


# ----------------------------------------------------- pagerank ----


def host_pagerank(pages_path: str, iters: int = 8) -> "object":
    """Integer-exact PageRank over the undirected host graph: the
    directed edge aggregate, self-loops dropped, symmetrized, parallel
    edges MERGED (int64 floor-division makes merged vs unmerged weights
    observable — the oracle merges, so the engine must), then the
    shared :func:`...graph.pagerank_edges_ds` core. Returns
    ``(domain, rank_micro)`` bit-identical to the DuckDB recursive-CTE
    replay."""
    return _pagerank_from_directed(_host_edges(pages_path), iters)


def _pagerank_from_directed(directed: "object", iters: int = 8) -> "object":
    """(src_domain, dst_domain, n_links) directed aggregate →
    ``(domain, rank_micro)`` — the symmetrize+merge+recurrence core
    shared by :func:`host_pagerank` (corpus scan) and the persisted
    rank-state refresh (:func:`build_rank_state` /
    :func:`update_rank_state`, edge-shard read)."""
    from .graph import pagerank_edges_ds

    def symmetrize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["src_domain"] != df["dst_domain"]]
        w = df["n_links"].to_numpy()
        if len(w) and int(w.max()) > 9_000_000:
            raise ValueError(
                "host_pagerank: edge weight > 9e6 would overflow the "
                "int64 micro-rank product; rescale weights first"
            )
        s = df["src_domain"].to_numpy()
        d = df["dst_domain"].to_numpy()
        return pa.table(
            {
                "s": pa.array(np.concatenate([s, d]), pa.string()),
                "d": pa.array(np.concatenate([d, s]), pa.string()),
                "w": pa.array(np.concatenate([w, w]), pa.int64()),
            }
        )

    edges = bucketed_sum_ds(
        directed.map_batches(symmetrize, batch_format="pyarrow"),
        keys=["s", "d"],
        value_cols=["w"],
    )
    ranks = pagerank_edges_ds(edges, iters=iters, node_type=pa.string())

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"domain": batch["node"], "rank_micro": batch["r"]})

    return ranks.map_batches(rename, batch_format="pyarrow")


# ------------------------------------------------ crawl frontier ----

# fixed "now" for the driver gate / bench — strictly after every
# planted warc_ts (2024-01-01 + doc_id seconds; the largest gate corpus
# is ~200k pages ≈ 2024-01-03), so staleness is positive everywhere
FRONTIER_NOW = "2024-06-01 00:00:00"

# auto-now offset: ``now = max(last_ts) + this`` when the caller passes
# ``now=None`` (r4 advice: the fixed FRONTIER_NOW was a scale cliff —
# any corpus with doc_id ≥ ~13.13M plants warc_ts past it and the
# negative-staleness guard raised at bench/gate time). ~116 days; the
# oracle builders emit the same ``max + offset`` arithmetic in SQL, so
# engine and oracle derive the identical epoch for ANY corpus size.
FRONTIER_AUTO_OFFSET_S = 10_000_000


def _priority(rank: np.ndarray, stale_h: np.ndarray) -> np.ndarray:
    """int64 ``rank × staleness-hours`` with a loud overflow guard
    (numpy int64 multiplication wraps silently; a wrapped priority
    would silently re-order the frontier). The guard checks the
    PER-ROW products (via a float64 upper estimate, exact to ~2^10 at
    the 2^62 threshold — margin 2^62 vs the 2^63 wrap point absorbs
    it), not ``rank.max() × stale_h.max()``, which pairs values from
    different rows and raised spuriously on skewed data (r4 advice)."""
    if len(rank):
        est = rank.astype(np.float64) * stale_h.astype(np.float64)
        if float(est.max()) > float(2**62):
            raise OverflowError(
                "crawl_frontier: rank × staleness would overflow int64; "
                "rescale (coarser staleness unit or rank scale)"
            )
    return rank * stale_h


def crawl_frontier(
    pages_path: str,
    now: str | None = FRONTIER_NOW,
    k: int = 100,
    per_host_cap: int | None = None,
    state_dir: str | None = None,
    ranks: "object | None" = None,
) -> pd.DataFrame:
    """Crawl-scheduling frontier: the top-``k`` canonical pages to
    (re)crawl next, ``priority = host-PageRank × staleness-hours`` —
    the standard importance×freshness recrawl policy, and the
    composition that CLOSES the crawl lifecycle this repo builds
    (crawl → url-canonical dedup state → link graph → schedule the
    next crawl). The reference runs the same loop at feed granularity:
    its ingest stage keys S3 queue state by source feed and re-polls
    stale feeds first (``/root/reference/src/data_loading/loader.py``,
    SURVEY.md S4/S14); here the signal is per-page and the importance
    weight comes from the link graph.

    Distributed plan — every stage reuses an oracled core:

    1. canonical-url state fold (``web._url_state_partials`` +
       ``_fold_state`` — the url_dedup/url_state kernel): one row per
       canonical url with ``last_ts`` = newest snapshot; combiner-first,
       the only corpus-sized exchange.
    2. host PageRank (:func:`host_pagerank` — integer-exact core); the
       rank table is host-bounded, never corpus-sized.
    3. rank attach: :func:`...joins.bucket_lookup_join` (LEFT — an
       edgeless host ranks 0, it still gets recrawled once its
       staleness dominates) on the url's host; ``last_ts`` rides the
       join as int64 epoch seconds.
    4. ``priority = rank_micro × staleness_hours`` in int64 (staleness
       is floored to WHOLE HOURS on purpose: total rank mass is 1e12
       micro, so a host set small enough to concentrate it would
       overflow int64 against second-granularity staleness, and
       recrawl scheduling is not sub-hour sensitive; the residual
       overflow guard raises, never wraps), per-block local top-k,
       then a driver merge of ≤ blocks×k rows; ties cut
       deterministically by ``(priority DESC, url ASC)``.

    ``state_dir`` replaces the corpus-sized url fold with a read of
    the persisted canonical-url state (``web.build_url_state`` /
    ``update_url_state`` — the artifact each crawl delta merges
    SHARD-PRUNED); equality with the one-shot fold is pytest-enforced
    (the state IS the fold, persisted). NOTE: the RANK side still
    scans the corpus html to rebuild the link graph unless ``ranks``
    is also supplied — the full delta-cost production shape is
    ``state_dir=`` + ``ranks=`` (a precomputed ``(domain,
    rank_micro)`` Dataset, e.g. ``host_pagerank`` output persisted
    alongside the url state and refreshed at its own, slower
    cadence — rank moves far slower than staleness).

    ``per_host_cap`` adds the POLITENESS constraint every production
    scheduler carries (a crawler must not burn its whole budget on one
    important-but-huge host): at most ``per_host_cap`` pages per host
    enter the ranking. Distributed as per-block per-host top-c (sound
    local prune: the global per-host top-c is a subset of the union of
    per-block per-host top-c's) → ONE host-bucketed merge (≤ blocks×c
    rows per host cross; group count is host-bounded) → the same
    global top-k funnel.

    The DuckDB oracle (:func:`crawl_frontier_oracle`) replays the
    planting formula AND the pagerank recurrence bit-for-bit (the
    capped form adds a ``row_number() OVER (PARTITION BY domain …)``
    window), so a wrong rank, a mis-parsed host, a lost url, a leaked
    over-cap page, or a wrong cutoff all hash-mismatch.
    """
    import ray.data

    from .web import _fold_state, _url_state_partials, state_parquet_paths

    if now is None:
        # auto-now (r4 advice — no fixed-horizon scale cliff): ONE
        # cheap column-pruned map-only max — over the persisted
        # state's last_ts, or the raw pages' warc_ts (the state fold's
        # Max preserves the global max, so both derive the same epoch)
        if state_dir is not None:
            mx = ray.data.read_parquet(
                state_parquet_paths(state_dir), columns=["last_ts"]
            ).max("last_ts")
        else:
            mx = sized_read_parquet(
                pages_path, columns=["warc_ts"]
            ).max("warc_ts")
        now_epoch = (
            int(pd.Timestamp(mx).value // 10**9) + FRONTIER_AUTO_OFFSET_S
        )
    else:
        now_epoch = int(pd.Timestamp(now).value // 10**9)

    if state_dir is not None:
        state = ray.data.read_parquet(
            state_parquet_paths(state_dir), columns=["url", "last_ts"]
        )
    else:
        state = _fold_state(_url_state_partials(pages_path, n_shards=16))

    def to_left(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        dom = df["url"].str.extract(_URL_RE)[0]
        if dom.isna().any():
            raise ValueError(
                f"crawl_frontier: unparseable canonical url "
                f"{df['url'][dom.isna()].iloc[0]!r}"
            )
        # the ORIGINAL last_ts rides the join (r4 advice: deriving the
        # output timestamp from floored epoch-seconds silently lost
        # sub-second precision on real crawl data); the epoch-seconds
        # column exists only for the staleness computation
        epoch_s = (
            df["last_ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
            // 10**9
        )
        return pa.table(
            {
                "url": pa.array(df["url"], pa.string()),
                "domain": pa.array(dom, pa.string()),
                "last_ts": pa.array(
                    df["last_ts"].to_numpy().astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
                "last_epoch": pa.array(epoch_s, pa.int64()),
            }
        )

    left = state.map_batches(to_left, batch_format="pyarrow")
    joined = bucket_lookup_join(
        left,
        host_pagerank(pages_path) if ranks is None else ranks,
        on="domain",
        right_key="domain",
        payload={"rank_micro": "rank_micro"},
        left_schema=pa.schema(
            [("url", pa.string()), ("domain", pa.string()),
             ("last_ts", pa.timestamp("us")), ("last_epoch", pa.int64())]
        ),
        payload_types={"rank_micro": pa.int64()},
        how="left",
    )

    def add_priority(df: pd.DataFrame) -> pd.DataFrame:
        stale_s = now_epoch - df["last_epoch"].to_numpy()
        if len(stale_s) and stale_s.min() < 0:
            raise ValueError(
                "crawl_frontier: a snapshot is newer than `now` — pass "
                "a `now` at or after the crawl horizon"
            )
        rank = df["rank_micro"].fillna(0).to_numpy().astype(np.int64)
        return df.assign(
            rank_micro=rank, priority=_priority(rank, stale_s // 3600)
        )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["priority", "url"], ascending=[False, True]
        ).head(k)

    scored = joined.map_batches(add_priority, batch_format="pandas")
    if per_host_cap is not None:
        c = int(per_host_cap)
        if c < 1:
            raise ValueError("crawl_frontier: per_host_cap must be >= 1")

        def host_cap_local(df: pd.DataFrame) -> pd.DataFrame:
            return (
                df.sort_values(["priority", "url"], ascending=[False, True])
                .groupby("domain", sort=False)
                .head(c)
            )

        def host_cap_merge(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(
                ["priority", "url"], ascending=[False, True]
            ).head(c)

        scored = (
            scored.map_batches(host_cap_local, batch_format="pandas")
            .groupby("domain")
            .map_groups(
                host_cap_merge,
                batch_format="pandas",
                num_cpus=NO_FUSE_NUM_CPUS,
            )
        )
    parts = scored.map_batches(local_topk, batch_format="pandas")
    out = parts.to_pandas()  # ≤ n_blocks × k rows — never corpus-sized
    out = (
        out.sort_values(["priority", "url"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["last_ts"] = pd.to_datetime(out["last_ts"]).astype("datetime64[ns]")
    return out[["url", "domain", "last_ts", "rank_micro", "priority"]]


# -------------------------------------------- incremental rank state ----
# The production shape of the frontier's importance weight (r4 verdict
# "What's missing #2"): host rank moves far slower than staleness, so
# the rank table is a PERSISTED artifact with its own refresh cadence —
# never a per-schedule corpus re-scan. PageRank itself is not
# incremental, but the DIRECTED HOST EDGE AGGREGATE it derives from is
# (per-edge n_links sums are associative over any crawl-delta split),
# so the state persists the edge aggregate in hash-sharded dirs
# (mirroring web.build_url_state's shard-pruned merge) plus the ranks
# recomputed from it: a delta merge reads only the delta's shards
# (host²-bounded, never the corpus), and the rank refresh reads only
# the folded edge shards. ``update == rebuild`` holds bit-exactly
# (integer-exact recurrence over identical folded edges;
# pytest-enforced in tests/test_rank_state.py).

RANK_STATE_ITERS = 8


def _domain_shards(domains: "pd.Series", n_shards: int) -> np.ndarray:
    """Stable PERSISTED shard routing for edge rows keyed by
    src_domain — md5-based like web._url_shards (NOT
    pd.util.hash_pandas_object, whose stability contract is
    within-job)."""
    from ..functions import textops

    return np.fromiter(
        (int(textops.fingerprint(d)[:8], 16) % n_shards for d in domains),
        dtype=np.int64,
        count=len(domains),
    )


def _edge_state_partials(pages_path: str, n_shards: int) -> "object":
    """pages → per-batch (src_domain, dst_domain, n_links, shard)
    combiner rows (the _edge_partials kernel + persisted shard key)."""
    ds = sized_read_parquet(pages_path, columns=["url", "html"])

    def partial(batch: pa.Table) -> pa.Table:
        t = _edge_partials(batch)
        return t.append_column(
            "shard",
            pa.array(
                _domain_shards(t["src_domain"].to_pandas(), n_shards),
                pa.int64(),
            ),
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def _fold_edge_state(ds: "object") -> "object":
    """(src_domain, dst_domain, n_links, shard) rows → one summed row
    per directed edge, grouped by shard (per-group overhead paid per
    shard; the fold inside is one vectorized pandas sum)."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["shard", "src_domain", "dst_domain"], as_index=False, sort=False
        ).agg(n_links=("n_links", "sum"))
        out["n_links"] = out["n_links"].astype(np.int64)
        return out[["src_domain", "dst_domain", "n_links", "shard"]]

    return ds.groupby("shard").map_groups(
        fold, batch_format="pandas", num_cpus=NO_FUSE_NUM_CPUS
    )


def rank_state_edge_paths(state_dir: str) -> list[str]:
    """Parquet files of a rank state's ``shard=<k>/`` edge dirs."""
    return [
        os.path.join(state_dir, n, f)
        for n in sorted(os.listdir(state_dir))
        if n.startswith("shard=")
        for f in sorted(os.listdir(os.path.join(state_dir, n)))
        if f.endswith(".parquet")
    ]


def _refresh_ranks(tmp_dir: str, iters: int) -> None:
    """Recompute ``(domain, rank_micro)`` from the folded edge shards
    under ``tmp_dir`` and write them to ``tmp_dir/ranks/`` — the
    host²-bounded half of the state; the corpus is never touched."""
    import ray.data

    edges = ray.data.read_parquet(
        rank_state_edge_paths(tmp_dir),
        columns=["src_domain", "dst_domain", "n_links"],
    )
    _pagerank_from_directed(edges, iters=iters).write_parquet(
        os.path.join(tmp_dir, "ranks")
    )


def build_rank_state(
    pages_path: str, out_dir: str, n_shards: int = 16,
    iters: int = RANK_STATE_ITERS,
) -> str:
    """Persist the frontier's rank state: hash-sharded directed edge
    aggregate (``shard=<k>/`` dirs), the ranks recomputed from it
    (``ranks/``), and a one-row ``_meta.parquet``. Atomic tmp+rename
    (the build_url_state crash-safety contract)."""
    import shutil

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    _fold_edge_state(
        _edge_state_partials(pages_path, n_shards)
    ).write_parquet(tmp, partition_cols=["shard"])
    _refresh_ranks(tmp, iters)
    pq.write_table(
        pa.table(
            {
                "n_shards": pa.array([n_shards], pa.int64()),
                "iters": pa.array([iters], pa.int64()),
            }
        ),
        os.path.join(tmp, "_meta.parquet"),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir


def update_rank_state(
    state_dir: str, delta_pages_path: str, out_dir: str
) -> str:
    """Merge a DELTA crawl's links into a persisted rank state —
    shard-pruned exactly like web.update_url_state: edge shards the
    delta does not touch are carried forward at FILE level; touched
    shards pay a path-pruned read + one vectorized fold (Sum n_links
    per directed edge — associative, so state ∪ delta-partials folds
    to the same rows as one global pass over the concatenated crawls).
    The rank refresh then reads ONLY the folded edge shards
    (host²-bounded); ingest cost scales with the delta plus its
    shards' edge rows, never the corpus. Row-identical to rebuilding
    from the concatenated crawls (pytest-enforced)."""
    import shutil

    import ray.data

    meta = pq.read_table(os.path.join(state_dir, "_meta.parquet"))
    n_shards = int(meta["n_shards"][0].as_py())
    iters = int(meta["iters"][0].as_py())

    delta = _edge_state_partials(delta_pages_path, n_shards).materialize()
    # an EMPTY delta (no rows at all) loses its schema through the
    # groupby and KeyErrors — short-circuit to "no shards touched"
    # (every shard carries forward, ranks/state unchanged)
    if delta.count() == 0:
        touched = []
    else:
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

    for name in os.listdir(state_dir):
        if not name.startswith("shard="):
            continue
        k = int(name.split("=", 1)[1])
        if k not in touched_set:
            shutil.copytree(
                os.path.join(state_dir, name), os.path.join(tmp, name)
            )

    if touched:
        base_paths = [
            os.path.join(state_dir, f"shard={k}", f)
            for k in touched
            if os.path.isdir(os.path.join(state_dir, f"shard={k}"))
            for f in sorted(os.listdir(os.path.join(state_dir, f"shard={k}")))
            if f.endswith(".parquet")
        ]
        parts = delta
        if base_paths:
            base = ray.data.read_parquet(
                base_paths,
                columns=["src_domain", "dst_domain", "n_links"],
            )

            def reshard(batch: pa.Table) -> pa.Table:
                doms = batch["src_domain"].to_pandas()
                return batch.append_column(
                    "shard",
                    pa.array(_domain_shards(doms, n_shards), pa.int64()),
                )

            parts = base.map_batches(
                reshard, batch_format="pyarrow"
            ).union(delta)
        _fold_edge_state(parts).write_parquet(tmp, partition_cols=["shard"])

    _refresh_ranks(tmp, iters)
    shutil.copy2(
        os.path.join(state_dir, "_meta.parquet"),
        os.path.join(tmp, "_meta.parquet"),
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir


def read_rank_state(state_dir: str) -> "object":
    """``(domain, rank_micro)`` Dataset of a persisted rank state —
    what ``crawl_frontier(ranks=...)`` consumes (the full delta-cost
    frontier: ``state_dir=`` url state + ``ranks=`` rank state, zero
    corpus scans at schedule time)."""
    import ray.data

    ranks_dir = os.path.join(state_dir, "ranks")
    paths = [
        os.path.join(ranks_dir, f)
        for f in sorted(os.listdir(ranks_dir))
        if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(paths, columns=["domain", "rank_micro"])


def pages_links_split_parquet_for(sf_dir: str) -> tuple[str, str]:
    """(base, delta) split of the anchor-planted pages (cached):
    ``doc_id % 5 == 4`` rows form the delta crawl, the rest the base —
    a deterministic row partition, so the edge-aggregate fold over
    base ∪ delta equals the fold over the whole table and the
    incremental rank path shares host_pagerank's SQL oracle."""
    import pyarrow.dataset as pads

    links_path = pages_with_links_parquet_for(sf_dir)
    out_dir = os.path.normpath(os.path.dirname(links_path)) + "-split"
    base_marker = os.path.join(out_dir, "base.parquet")
    delta_marker = os.path.join(out_dir, "delta.parquet")
    if os.path.isfile(base_marker) and os.path.isfile(delta_marker):
        return base_marker, delta_marker
    t = pads.dataset(links_path).to_table()
    df = t.to_pandas()
    doc_id = df["url"].str.extract(_URL_RE)[1].astype(np.int64)
    sel = (doc_id % 5 == 4).to_numpy()
    os.makedirs(out_dir, exist_ok=True)
    for marker, part in ((base_marker, df[~sel]), (delta_marker, df[sel])):
        out = pa.Table.from_pandas(
            part.reset_index(drop=True), preserve_index=False
        ).cast(t.schema)
        tmp = marker + ".tmp"
        pq.write_table(out, tmp, row_group_size=1024)
        os.replace(tmp, marker)
    return base_marker, delta_marker


def host_pagerank_state(sf_dir: str) -> pd.DataFrame:
    """Driver-gate shim for the INCREMENTAL rank path (the
    url_state_update / bm25_search_indexed idiom — same SQL oracle as
    the one-shot twin): build the persisted rank state from the BASE
    link crawl (cached), merge the delta rows through
    :func:`update_rank_state` (shard-pruned), read the refreshed ranks
    back. Equals :func:`host_pagerank` over the full table by the edge
    fold's associativity — which HOST_PAGERANK_ORACLE then
    hash-checks."""
    import shutil
    import tempfile

    base, delta = pages_links_split_parquet_for(sf_dir)
    state_dir = os.path.normpath(os.path.dirname(base)) + "-rankstate"
    if not os.path.isfile(os.path.join(state_dir, "_meta.parquet")):
        build_rank_state(base, state_dir)
    out = tempfile.mkdtemp(prefix="fscr_rankstate_upd_") + "/state"
    try:
        update_rank_state(state_dir, delta, out)
        merged = read_rank_state(out).to_pandas()
    finally:
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    return merged.sort_values("domain").reset_index(drop=True)


def crawl_frontier_stateful(
    sf_dir: str, k: int = 100, per_host_cap: int | None = None
) -> pd.DataFrame:
    """The FULL delta-cost frontier composition: priorities computed
    from the two persisted artifacts alone — ``state_dir=`` (canonical
    url state) for staleness and ``ranks=`` (rank state) for
    importance — with ZERO corpus scans at schedule time. Both states
    are built (cached) over the same link-planted crawl, so the result
    equals the corpus-scanning :func:`crawl_frontier` row-for-row and
    shares its recursive-CTE oracle."""
    from .web import build_url_state

    links_path = pages_with_links_parquet_for(sf_dir)
    links_dir = os.path.normpath(os.path.dirname(links_path))
    url_state = links_dir + "-urlstate"
    if not os.path.isfile(os.path.join(url_state, "_meta.parquet")):
        build_url_state(links_path, url_state)
    rank_state = links_dir + "-fullrankstate"
    if not os.path.isfile(os.path.join(rank_state, "_meta.parquet")):
        build_rank_state(links_path, rank_state)
    return crawl_frontier(
        links_path,
        now=None,
        k=k,
        per_host_cap=per_host_cap,
        state_dir=url_state,
        ranks=read_rank_state(rank_state),
    )


def host_hits(pages_path: str, iters: int = 4) -> "object":
    """HITS hubs & authorities over the DIRECTED host graph (the
    link-analysis complement to PageRank: a good hub points at good
    authorities, a good authority is pointed at by good hubs — the
    natural crawl-seed / spam-farm signal). Distinct directed edges,
    self-loops dropped, then the integer-exact
    :func:`...graph.hits_edges_ds` core; the DuckDB oracle replays the
    planting formula AND the alternating half-step recurrence
    bit-for-bit (recursive CTE; normalization max comes from the
    previous level — the working table — referenced twice, which
    DuckDB permits). Returns ``(domain, hub_micro, auth_micro)``."""
    from ..stages.shuffle import salted_dedup
    from .graph import hits_edges_ds

    directed = _host_edges(pages_path)

    def distinct_edges(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["src_domain"] != df["dst_domain"]]
        return pa.table(
            {
                "s": pa.array(df["src_domain"], pa.string()),
                "d": pa.array(df["dst_domain"], pa.string()),
            }
        )

    edges = salted_dedup(
        directed.map_batches(distinct_edges, batch_format="pyarrow"),
        ["s", "d"],
    ).select_columns(["s", "d"])
    ranks = hits_edges_ds(edges, iters=iters, node_type=pa.string())

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "domain": batch["node"],
                "hub_micro": batch["hub_micro"],
                "auth_micro": batch["auth_micro"],
            }
        )

    return ranks.map_batches(rename, batch_format="pyarrow")


# ----------------------------------------------- triangle counting ----


def triangle_count(
    pages_path: str,
    num_buckets: int | None = None,
    local_edges_gate: int = 200_000,
):
    """Distributed triangle count over the undirected host graph
    (compact-forward with degree ordering).

    Plan — every stage is combiner-first and key-bucketed:

    1. distinct undirected edges: canonicalize (a, b) = (min, max),
       self-loops dropped, combiner dedup (salted_dedup).
    2. degrees: one bucketed sum over the exploded endpoints.
    3. ORIENT each edge from the endpoint with the smaller
       ``(degree, name)`` key to the larger (two bucket lookup joins
       attach degrees). Under this orientation every node's out-degree
       is ≤ O(sqrt(2m)) — a hub host with millions of in-links fans
       out only to neighbors of even higher degree — so step 4's
       per-node pair enumeration is bounded by construction, the skew
       guarantee that makes the wedge stage safe at web scale.
    4. wedges: bucket by source, enumerate out-neighbor pairs per node
       (numpy triu indices), each wedge emitted ordered by the same
       (degree, name) key.
    5. close: union (wedge count) with (oriented edge flag) rows, one
       bucketed sum per pair key, then sum wedge counts where the edge
       is present. Each triangle is counted exactly once — at its
       orientation-minimal vertex.

    Returns a one-row pandas DataFrame ``{n_triangles}``; the SQL
    oracle replays the planting formula with a three-way self-join.

    Gate-scale collapse (the merge_parts / minhash count-gated
    pattern): the distinct undirected edge table is host²-bounded and
    MATERIALIZED once; when it holds ≤ ``local_edges_gate`` rows, the
    five downstream exchanges are pure task-launch floor (~3 s at the
    127-host bench for 381 edges) — compute steps 2-5 locally with the
    SAME orientation algorithm (equality enforced by running both
    paths in tests). Above the gate — any real web graph — the
    distributed plan is unchanged. ``local_edges_gate=0`` disables the
    collapse."""
    from ..config import exchange_fanout

    num_buckets = exchange_fanout(num_buckets, floor=32)
    directed = _host_edges(pages_path)

    def canonical(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["src_domain"] != df["dst_domain"]]
        s = df["src_domain"].to_numpy()
        d = df["dst_domain"].to_numpy()
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.table(
            {"a": pa.array(lo, pa.string()), "b": pa.array(hi, pa.string())}
        )

    und = salted_dedup(
        directed.map_batches(canonical, batch_format="pyarrow"),
        ["a", "b"],
        num_buckets=num_buckets,
    ).select_columns(["a", "b"]).materialize()

    if local_edges_gate and int(und.count()) <= local_edges_gate:
        e = und.to_pandas()
        a = e["a"].to_numpy()
        b = e["b"].to_numpy()
        nodes, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
        ai, bi = codes[: len(a)], codes[len(a) :]
        deg = np.bincount(np.concatenate([ai, bi]), minlength=len(nodes))
        # orientation key (deg, name): name order == code order
        key = deg.astype(np.int64) * (len(nodes) + 1) + np.arange(len(nodes))
        a_first = key[ai] < key[bi]
        s = np.where(a_first, ai, bi)
        d = np.where(a_first, bi, ai)
        # adjacency sets of oriented out-neighbors, then wedge closure
        order = np.lexsort((key[d], s))
        s_o, d_o = s[order], d[order]
        edge_set = set(zip(s.tolist(), d.tolist()))
        n_tri = 0
        bounds = np.flatnonzero(s_o[1:] != s_o[:-1]) + 1
        for nb in np.split(d_o, bounds):
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            n_tri += sum(
                (int(x), int(y)) in edge_set
                for x, y in zip(nb[i].tolist(), nb[j].tolist())
            )
        return pd.DataFrame({"n_triangles": [int(n_tri)]})

    def endpoints(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.string()),
                "deg": pa.array(np.ones(2 * len(a), dtype=np.int64)),
            }
        )

    deg = bucketed_sum_ds(
        und.map_batches(endpoints, batch_format="pyarrow"),
        keys=["node"],
        value_cols=["deg"],
        num_buckets=num_buckets,
    )

    edge_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    with_da = bucket_lookup_join(
        und,
        deg,
        on="a",
        right_key="node",
        payload={"deg": "deg_a"},
        left_schema=edge_schema,
        payload_types={"deg_a": pa.int64()},
        num_buckets=num_buckets,
    )
    with_deg = bucket_lookup_join(
        with_da,
        deg,
        on="b",
        right_key="node",
        payload={"deg": "deg_b"},
        left_schema=edge_schema.append(pa.field("deg_a", pa.int64())),
        payload_types={"deg_b": pa.int64()},
        num_buckets=num_buckets,
    )

    def orient(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        a_first = (df["deg_a"].to_numpy() < df["deg_b"].to_numpy()) | (
            (df["deg_a"].to_numpy() == df["deg_b"].to_numpy())
            & (df["a"].to_numpy() < df["b"].to_numpy())
        )
        s = np.where(a_first, df["a"], df["b"])
        d = np.where(a_first, df["b"], df["a"])
        dd = np.where(a_first, df["deg_b"], df["deg_a"]).astype(np.int64)
        bucket = (
            pd.util.hash_pandas_object(pd.Series(s), index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return pa.table(
            {
                "s": pa.array(s, pa.string()),
                "d": pa.array(d, pa.string()),
                "deg_d": pa.array(dd, pa.int64()),
                "__wbucket": pa.array(bucket, pa.int32()),
            }
        )

    oriented = with_deg.map_batches(orient, batch_format="pyarrow")

    def wedges(g: "pd.DataFrame") -> "pd.DataFrame":
        # per source node: out-neighbors sorted by the orientation key
        # (deg, name); every neighbor pair is a wedge, emitted in that
        # same order so it keys against the oriented edge set directly
        outs = []
        for _, grp in g.groupby("s", sort=False):
            if len(grp) < 2:
                continue
            order = np.lexsort(
                (grp["d"].to_numpy(), grp["deg_d"].to_numpy())
            )
            nb = grp["d"].to_numpy()[order]
            i, j = np.triu_indices(len(nb), k=1)
            outs.append(pd.DataFrame({"x": nb[i], "y": nb[j]}))
        if not outs:
            return pd.DataFrame(
                {
                    "x": pd.Series([], dtype=str),
                    "y": pd.Series([], dtype=str),
                    "n_wedge": pd.Series([], dtype=np.int64),
                    "n_edge": pd.Series([], dtype=np.int64),
                }
            )
        w = pd.concat(outs, ignore_index=True)
        out = w.groupby(["x", "y"], as_index=False, sort=False).size()
        out = out.rename(columns={"size": "n_wedge"})
        out["n_edge"] = np.int64(0)
        return out

    tag_schema = pa.schema(
        [
            ("x", pa.string()),
            ("y", pa.string()),
            ("n_wedge", pa.int64()),
            ("n_edge", pa.int64()),
        ]
    )

    wedge_rows = oriented.groupby("__wbucket").map_groups(
        wedges, batch_format="pandas", num_cpus=NO_FUSE_NUM_CPUS
    ).map_batches(
        # strip pandas metadata so both union branches carry the same
        # bare schema (mismatched metadata trips Ray's schema unify)
        lambda b: b.select(tag_schema.names).cast(tag_schema),
        batch_format="pyarrow",
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "x": batch["s"].cast(pa.string()),
                "y": batch["d"].cast(pa.string()),
                "n_wedge": pa.array(np.zeros(n, dtype=np.int64)),
                "n_edge": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    tagged = wedge_rows.union(
        oriented.map_batches(edge_rows, batch_format="pyarrow")
    )
    closed = bucketed_sum_ds(
        tagged,
        keys=["x", "y"],
        value_cols=["n_wedge", "n_edge"],
        num_buckets=num_buckets,
    )

    def matched(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = int(df.loc[df["n_edge"] > 0, "n_wedge"].sum())
        return pa.table({"n_tri": pa.array([n], pa.int64())})

    total = closed.map_batches(matched, batch_format="pyarrow").sum("n_tri")
    return pd.DataFrame({"n_triangles": [int(total or 0)]})


# ---------------------------------------------------- SQL oracles ----

def _pool() -> list[str]:
    from ..sources.pages import _DEFAULT_FULL_NAMES

    return _DEFAULT_FULL_NAMES


# planted-link replay shared by every oracle in this family (module
# docstring formula; j < 1 + doc_id % 3 outlinks per page)
_LINKS_CTE = f"""
    j(j) AS (SELECT * FROM (VALUES (0), (1), (2)) t(j)),
    links AS (
        SELECT 'example' || CAST(d.doc_id % 127 AS VARCHAR) || '.com'
                   AS src_domain,
               'example' || CAST((d.doc_id * 31 + j.j * 17 + 7) % 127
                   AS VARCHAR) || '.com' AS dst_domain,
               (d.doc_id * 13 + j.j * 7) % {len(_pool())} AS anchor_idx
        FROM documents d, j
        WHERE j.j < 1 + d.doc_id % 3
    )
"""

HOST_LINK_GRAPH_ORACLE = f"""
    WITH {_LINKS_CTE}
    SELECT src_domain, dst_domain, count(*)::BIGINT AS n_links
    FROM links GROUP BY 1, 2
"""

def anchor_entity_oracle() -> str:
    """Oracle for :func:`anchor_entity_mentions`: replays the planted
    (host, entity) formula with the gazetteer pool embedded as literals
    (names contain no quotes — checked at build)."""
    names = _pool()
    if any("'" in n for n in names):
        raise ValueError("gazetteer name contains a quote; oracle literals unsafe")
    pool_rows = ", ".join(f"({i}, '{n}')" for i, n in enumerate(names))
    return f"""
        WITH {_LINKS_CTE},
        pool(idx, name) AS (SELECT * FROM (VALUES {pool_rows}) p(idx, name))
        SELECT l.dst_domain,
               p.name AS anchor_text,
               count(*)::BIGINT AS n_links
        FROM links l JOIN pool p ON p.idx = l.anchor_idx
        GROUP BY 1, 2
    """


# integer-exact pagerank recurrence over the planted links — shared
# verbatim by HOST_PAGERANK_ORACLE and crawl_frontier_oracle, so when
# only the frontier sits in the driver window the rank recurrence is
# still under the hard hash-match signal (the simhash_documents-inside-
# simhash_dup_pairs transitive-check idiom)
_PR_CTES = """
    ecnt AS (
        SELECT src_domain AS s, dst_domain AS d, count(*)::BIGINT AS w
        FROM links WHERE src_domain <> dst_domain GROUP BY 1, 2
    ),
    sym AS (SELECT s, d, w FROM ecnt UNION ALL SELECT d, s, w FROM ecnt),
    edges AS (SELECT s, d, sum(w)::BIGINT AS w FROM sym GROUP BY 1, 2),
    outw AS (SELECT s, sum(w)::BIGINT AS ow FROM edges GROUP BY 1),
    nn AS (SELECT count(*)::BIGINT AS n_nodes FROM outw),
    pr(it, node, r) AS (
        SELECT 0, s, 1000000000000 // (SELECT n_nodes FROM nn) FROM outw
        UNION ALL
        SELECT pr.it + 1, e.d,
               (150000000000 // (SELECT n_nodes FROM nn))
               + (85 * sum((pr.r * e.w) // ow.ow)) // 100
        FROM pr
        JOIN edges e ON e.s = pr.node
        JOIN outw ow ON ow.s = pr.node
        WHERE pr.it < 8
        GROUP BY pr.it + 1, e.d
    )
"""

HOST_PAGERANK_ORACLE = f"""
    WITH RECURSIVE {_LINKS_CTE},
    {_PR_CTES}
    SELECT node AS domain, r AS rank_micro FROM pr WHERE it = 8
"""



def _now_epoch_sql(now: str | None) -> str:
    """SQL expression for the frontier's ``now`` epoch: a literal
    timestamp, or — for ``now=None`` — the same ``max(warc_ts) +
    FRONTIER_AUTO_OFFSET_S`` arithmetic the engine derives (warc_ts =
    2024-01-01 + doc_id seconds, so max(warc_ts) = 2024-01-01 +
    max(doc_id) seconds), keeping engine and oracle bit-identical for
    any corpus size."""
    if now is None:
        return (
            "(epoch(TIMESTAMP '2024-01-01')"
            " + (SELECT max(doc_id) FROM documents)"
            f" + {FRONTIER_AUTO_OFFSET_S})"
        )
    return f"epoch(TIMESTAMP '{now}')"


def crawl_frontier_capped_oracle(
    now: str | None, k: int = 100, per_host_cap: int = 3
) -> str:
    """Replay of the politeness-capped frontier: the uncapped ranked
    set (pagerank recurrence verbatim, as in
    :func:`crawl_frontier_oracle`) filtered by a
    ``row_number() OVER (PARTITION BY domain ORDER BY priority DESC,
    url)`` window before the same global cutoff."""
    now_ep = _now_epoch_sql(now)
    return f"""
        WITH RECURSIVE {_LINKS_CTE},
        {_PR_CTES},
        ranks AS (SELECT node, r FROM pr WHERE it = 8),
        urls AS (
            SELECT 'https://example' || CAST(doc_id % 127 AS VARCHAR)
                       || '.com/page/' || CAST(doc_id AS VARCHAR) AS url,
                   'example' || CAST(doc_id % 127 AS VARCHAR) || '.com'
                       AS domain,
                   TIMESTAMP '2024-01-01' + doc_id * INTERVAL 1 SECOND
                       AS last_ts
            FROM documents
        ),
        ranked AS (
            SELECT u.url, u.domain, u.last_ts,
                   COALESCE(rk.r, 0)::BIGINT AS rank_micro,
                   COALESCE(rk.r, 0)::BIGINT
                       * (({now_ep}
                           - epoch(u.last_ts))::BIGINT // 3600)
                       AS priority
            FROM urls u LEFT JOIN ranks rk ON rk.node = u.domain
        )
        SELECT url, domain, last_ts, rank_micro, priority
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY domain ORDER BY priority DESC, url
            ) AS rn FROM ranked
        )
        WHERE rn <= {int(per_host_cap)}
        ORDER BY priority DESC, url
        LIMIT {int(k)}
    """


def crawl_frontier_oracle(now: str | None, k: int = 100) -> str:
    """Recursive-CTE replay of :func:`crawl_frontier`: the planted-link
    pagerank recurrence (``_PR_CTES``, verbatim — rank errors
    hash-mismatch here too), the page url/warc_ts synthesis formula
    (sources/pages.py:123-124), and the BIGINT
    ``rank × staleness-hours`` priority with the deterministic
    ``(priority DESC, url ASC)`` cutoff."""
    now_ep = _now_epoch_sql(now)
    return f"""
        WITH RECURSIVE {_LINKS_CTE},
        {_PR_CTES},
        ranks AS (SELECT node, r FROM pr WHERE it = 8),
        urls AS (
            SELECT 'https://example' || CAST(doc_id % 127 AS VARCHAR)
                       || '.com/page/' || CAST(doc_id AS VARCHAR) AS url,
                   'example' || CAST(doc_id % 127 AS VARCHAR) || '.com'
                       AS domain,
                   TIMESTAMP '2024-01-01' + doc_id * INTERVAL 1 SECOND
                       AS last_ts
            FROM documents
        )
        SELECT u.url, u.domain, u.last_ts,
               COALESCE(rk.r, 0)::BIGINT AS rank_micro,
               COALESCE(rk.r, 0)::BIGINT
                   * (({now_ep}
                       - epoch(u.last_ts))::BIGINT // 3600)
                   AS priority
        FROM urls u LEFT JOIN ranks rk ON rk.node = u.domain
        ORDER BY priority DESC, u.url
        LIMIT {int(k)}
    """

def host_hits_oracle(iters: int = 4) -> str:
    """Recursive-CTE replay of :func:`host_hits` — alternating
    half-steps (even levels hold hubs, odd hold authorities), each
    normalized by the FIXED ``deg_max · scale`` constant (a per-level
    max would re-reference the recursive working table, whose
    second-reference semantics are implementation-defined — DuckDB
    reads the accumulated recursion, measured). Hubs init on
    ≥1-out-edge nodes, so level row sets are structural (exactly the
    out-edge / in-edge node sets) and the final FULL JOIN covers every
    endpoint with COALESCE(0) — matching the engine's dense vectors
    row-for-row."""
    from .graph import _HITS_SCALE

    return f"""
        WITH RECURSIVE {_LINKS_CTE},
        ed AS (
            SELECT DISTINCT src_domain AS s, dst_domain AS d
            FROM links WHERE src_domain <> dst_domain
        ),
        dm AS (
            SELECT max(c)::BIGINT * {_HITS_SCALE} AS m FROM (
                SELECT count(*) AS c FROM ed GROUP BY s
                UNION ALL
                SELECT count(*) AS c FROM ed GROUP BY d
            )
        ),
        lv(it, node, r) AS (
            SELECT 0, s, {_HITS_SCALE}::BIGINT FROM (
                SELECT DISTINCT s FROM ed
            )
            UNION ALL
            SELECT lv.it + 1,
                   CASE WHEN lv.it % 2 = 0 THEN e.d ELSE e.s END,
                   (sum(lv.r) * {_HITS_SCALE}) // (SELECT m FROM dm)
            FROM lv JOIN ed e
              ON (lv.it % 2 = 0 AND e.s = lv.node)
              OR (lv.it % 2 = 1 AND e.d = lv.node)
            WHERE lv.it < {2 * iters}
            GROUP BY lv.it + 1,
                     CASE WHEN lv.it % 2 = 0 THEN e.d ELSE e.s END
        )
        SELECT COALESCE(h.node, a.node) AS domain,
               COALESCE(h.r, 0)::BIGINT AS hub_micro,
               COALESCE(a.r, 0)::BIGINT AS auth_micro
        FROM (SELECT node, r FROM lv WHERE it = {2 * iters}) h
        FULL JOIN (SELECT node, r FROM lv WHERE it = {2 * iters - 1}) a
          ON a.node = h.node
    """


TRIANGLE_COUNT_ORACLE = f"""
    WITH {_LINKS_CTE},
    und AS (
        SELECT DISTINCT LEAST(src_domain, dst_domain) AS a,
                        GREATEST(src_domain, dst_domain) AS b
        FROM links WHERE src_domain <> dst_domain
    )
    SELECT count(*)::BIGINT AS n_triangles
    FROM und e1
    JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
    JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
"""
