"""Training-data export: doc-level stratified split with no URL
leakage, train-only direction-inversion augmentation, deterministic
reruns (reference stages data_split/train_preprocess, SURVEY.md §3.2)."""

import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines.training_data import build_training_data
from finance_sc_relations_ray.sources.pages import generate_pages


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("train_pages")
    p = str(d / "pages.parquet")
    pq.write_table(generate_pages(list(range(80))), p)
    return p


def test_training_data_split_and_augment(pages_path):
    df = build_training_data(pages_path).to_pandas()
    assert set(df.columns) == {
        "url", "sents", "relations", "entity1", "entity2", "split"
    }
    assert len(df) > 0
    # no document appears in both splits (doc-level split)
    by_url = df.groupby("url")["split"].nunique()
    assert (by_url == 1).all()
    # ~20% of DOCS in valid
    frac = df.drop_duplicates("url")["split"].eq("valid").mean()
    assert 0.1 < frac < 0.3
    # augmentation: train direction classes get inverted copies —
    # supplier/customer counts equalize-ish in train
    train = df[df["split"] == "train"]
    main = train[train["relations"].isin(["supplier", "customer"])]
    counts = main["relations"].value_counts()
    assert abs(int(counts.get("supplier", 0)) - int(counts.get("customer", 0))) <= max(
        5, 0.1 * len(main)
    )
    # every tagged sentence carries balanced markers
    assert train["sents"].str.count(r"\[E1\]").eq(1).all()
    assert train["sents"].str.count(r"\[E2\]").eq(1).all()


def test_training_data_deterministic(pages_path):
    a = build_training_data(pages_path).to_pandas().sort_values(
        ["url", "sents", "relations"]).reset_index(drop=True)
    b = build_training_data(pages_path).to_pandas().sort_values(
        ["url", "sents", "relations"]).reset_index(drop=True)
    assert a.equals(b)
