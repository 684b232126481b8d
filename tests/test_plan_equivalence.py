"""The three physical plans (page-local fused / sentence-fused +
bucketed shuffle / composable pools + shuffle) must emit identical
triples."""

import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines.kg import build_kg_pipeline
from finance_sc_relations_ray.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages_eq")
    path = str(d / "pages.parquet")
    pq.write_table(generate_pages(list(range(100))), path)
    return path


def _norm(ds):
    return (
        ds.to_pandas()
        .astype({"score": "float64"})
        .round({"score": 4})
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )


def test_three_plans_identical(pages_path):
    a = _norm(build_kg_pipeline(pages_path, page_local=True))
    b = _norm(build_kg_pipeline(pages_path, page_local=False, fused=True))
    c = _norm(build_kg_pipeline(pages_path, page_local=False, fused=False))
    assert a.equals(b), "page_local vs sentence-fused differ"
    assert b.equals(c), "fused vs composable pools differ"
