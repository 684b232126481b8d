"""Web/URL analytics over the Common-Crawl-style ``pages`` table.

The north-star input is a web crawl (url, warc_ts, html, text, lang);
the first aggregate every crawl pipeline runs is per-host/domain
statistics (crawl budgeting, host-level dedup, robots accounting —
the reference's ingest stage keys its S3 state by source feed the
same way, `/root/reference/src/data_loading/loader.py`, SURVEY.md
S14). The engine side does REAL url parsing (vectorized regex over
the url column); the DuckDB oracle replays the deterministic page
synthesis formula (sources/pages.py:123-124: url =
``https://example{doc_id % 127}.com/page/{doc_id}``, warc_ts =
``2024-01-01 + doc_id seconds``) from the documents table — so the
parity gate cross-checks the parser against an independent
derivation, not against itself.

Distributed plan: map-only parse + per-batch combiner partials (one
row per (batch, domain)), then ONE tiny groupby(domain) — the domain
table is host-cardinality (millions at web scale), never the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.io import sized_read_parquet

_URL_RE = r"^https?://([^/]+)/page/(\d+)$"


def domain_stats(pages_path: str) -> "object":
    """Per-domain crawl stats: page count, warc_ts range, doc-id range.

    Columns (all derived by parsing ``url``/``warc_ts`` — nothing
    rng-dependent, so the synthesis-replay oracle is exact):
    domain, n_pages, min_ts, max_ts, min_doc_id, max_doc_id.
    """
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    ds = sized_read_parquet(pages_path, columns=["url", "warc_ts"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "url": batch["url"].to_pandas(),
                "warc_ts": batch["warc_ts"].to_pandas(),
            }
        )
        parsed = df["url"].str.extract(_URL_RE)
        if parsed[0].isna().any():
            bad = df["url"][parsed[0].isna()].iloc[0]
            raise ValueError(f"unparseable page url: {bad!r}")
        df["domain"] = parsed[0]
        df["doc_id"] = parsed[1].astype(np.int64)
        g = df.groupby("domain", as_index=False, sort=False).agg(
            n_pages=("url", "size"),
            min_ts=("warc_ts", "min"),
            max_ts=("warc_ts", "max"),
            min_doc_id=("doc_id", "min"),
            max_doc_id=("doc_id", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Min("min_ts", alias_name="min_ts"),
            Max("max_ts", alias_name="max_ts"),
            Min("min_doc_id", alias_name="min_doc_id"),
            Max("max_doc_id", alias_name="max_doc_id"),
        )
    )


DOMAIN_STATS_ORACLE = """
    SELECT 'example' || CAST(doc_id % 127 AS VARCHAR) || '.com' AS domain,
           count(*)::BIGINT AS n_pages,
           min(TIMESTAMP '2024-01-01' + doc_id * INTERVAL 1 SECOND) AS min_ts,
           max(TIMESTAMP '2024-01-01' + doc_id * INTERVAL 1 SECOND) AS max_ts,
           min(doc_id)::BIGINT AS min_doc_id,
           max(doc_id)::BIGINT AS max_doc_id
    FROM documents
    GROUP BY 1
"""
