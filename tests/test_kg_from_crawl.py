"""The composed crawl flagship (kg.kg_from_crawl): url-canonical dedup
(keep newest snapshot) BEFORE extraction must produce exactly the
pipeline's triples over the formula-derived winner corpus — and the
dedup must be OBSERVABLE (the planted stale-vs-fresh html difference
changes the triples, so running extraction without dedup, or picking
the wrong winner, fails the comparison)."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads

from finance_sc_relations_ray.pipelines.kg import (
    kg_from_crawl,
    pages_with_recrawl_content_parquet_for,
)
from oracle.kg_oracle import expected_triples

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["score"] = df["score"].astype("float64").round(4)
    df["sentence_ids"] = [list(x) for x in df["sentence_ids"]]
    return df.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)


def _winner_pages(fixture_path: str) -> pa.Table:
    """Replay the winner formula: the recrawl (+3600 s, truncated html)
    WINS for doc_id % 7 == 3, under the CANONICAL (original) url."""
    t = pads.dataset(fixture_path).to_table()
    df = t.to_pandas()
    base = df[df["url"].str.startswith("https://")].copy()
    doc_id = base["url"].str.extract(r"/page/(\d+)$")[0].astype(np.int64)
    sel = (doc_id % 7 == 3).to_numpy()
    first_p = re.compile(rb"(.*?<p>.*?</p>).*(<footer>.*)", re.DOTALL)
    html = base["html"].to_numpy(copy=False).copy()
    for i in np.flatnonzero(sel):
        html[i] = first_p.sub(rb"\1\2", html[i])
    base["html"] = html
    return pa.Table.from_pandas(base, preserve_index=False)


def test_kg_from_crawl_matches_winner_oracle():
    fixture = pages_with_recrawl_content_parquet_for(SF)
    got = _norm(kg_from_crawl(fixture).to_pandas())
    winners = _winner_pages(fixture)
    exp = _norm(expected_triples(winners))
    assert len(got) == len(exp)
    for c in exp.columns:
        assert got[c].tolist() == exp[c].tolist(), c


def test_dedup_before_extract_is_observable():
    # the stale-snapshot html genuinely changes the triples: the oracle
    # over the NON-deduped corpus (both snapshots) must differ from the
    # oracle over the winner corpus — otherwise the composition test
    # above would pass even if the dedup stage were a no-op
    fixture = pages_with_recrawl_content_parquet_for(SF)
    all_rows = pads.dataset(fixture).to_table()
    winners = _winner_pages(fixture)
    assert all_rows.num_rows > winners.num_rows
    a = _norm(expected_triples(all_rows))
    w = _norm(expected_triples(winners))
    assert not a.equals(w)
