"""North-star gate: triple-level P/R ≥ 0.95 vs the reference-semantics
oracle (we hit 1.0 — exact match is asserted elsewhere; this keeps the
P/R harness itself honest)."""

import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines.eval import triple_pr
from finance_sc_relations_ray.pipelines.kg import build_kg_pipeline
from finance_sc_relations_ray.sources.pages import generate_pages
from oracle.kg_oracle import expected_triples


def test_triple_pr_meets_gate(tmp_path):
    pages = generate_pages(list(range(150)))
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, path)
    got = build_kg_pipeline(path).to_pandas()
    exp = expected_triples(pages)
    pr = triple_pr(got, exp)
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_triple_pr_arithmetic():
    import pandas as pd

    got = pd.DataFrame(
        {"subj": ["a", "b", "x"], "pred": ["p"] * 3, "obj": ["c", "d", "y"]}
    )
    exp = pd.DataFrame(
        {"subj": ["a", "b", "z"], "pred": ["p"] * 3, "obj": ["c", "d", "w"]}
    )
    pr = triple_pr(got, exp)
    assert pr["tp"] == 2
    assert abs(pr["precision"] - 2 / 3) < 1e-3
    assert abs(pr["recall"] - 2 / 3) < 1e-3
