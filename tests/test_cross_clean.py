"""A5/O5: per-class weighted k-fold + cross-validation vote cleaning
(reference src/data_cleansing/cross_cleaner.py:119-141, 400-494)."""

import pandas as pd
import pyarrow as pa
import ray.data

from finance_sc_relations_ray.functions.fuzzy import weighted_k_fold
from finance_sc_relations_ray.pipelines.cross_clean import (
    agreement_rate,
    cross_validation_votes,
    vote_batch,
)


def test_weighted_k_fold_per_class_slices():
    # 60 supplier docs, 30 customer, 10 other — N=100, k=5 → fold_num=20
    ids = list(range(100))
    strata = ["supplier"] * 60 + ["customer"] * 30 + ["other"] * 10
    assign = weighted_k_fold(ids, strata, k=5)
    assert set(assign) == set(ids)  # every doc assigned exactly once
    df = pd.DataFrame({"doc": ids, "s": strata, "fold": [assign[d] for d in ids]})
    # per-stratum slice size int(fold_num * w): supplier 12, customer 6,
    # other 2 per non-final fold; last fold takes the remainder
    per = df.groupby(["s", "fold"]).size().unstack(fill_value=0)
    for f in range(4):
        assert per.loc["supplier", f] == 12
        assert per.loc["customer", f] == 6
        assert per.loc["other", f] == 2
    assert per.loc["supplier", 4] == 60 - 4 * 12
    # deterministic
    assert weighted_k_fold(ids, strata, k=5) == assign


def test_weighted_k_fold_order_independent():
    ids = list(range(50))
    strata = ["a"] * 25 + ["b"] * 25
    a = weighted_k_fold(ids, strata, k=5)
    rev = weighted_k_fold(ids[::-1], strata[::-1], k=5)
    assert a == rev  # assignment independent of row arrival order


def _voted_fixture():
    t = pa.table(
        {
            "sents": ["s0", "s1", "s2"],
            "f0": ["supplier", "supplier", "customer"],
            "f0_score": pa.array([0.9, 0.6, 0.8], pa.float32()),
            "f1": ["supplier", "customer", "customer"],
            "f1_score": pa.array([0.8, 0.7, 0.9], pa.float32()),
        }
    )
    return vote_batch(t, ["f0", "f1"]).to_pandas()


def test_vote_batch_agreement_and_weighted_votes():
    df = _voted_fixture()
    assert df["agreed_label"].tolist() == ["supplier", "-1", "customer"]
    # row1 weighted votes: supplier 0.6/2, customer 0.7/2 → customer
    assert df.iloc[1]["higher_confident"] == "customer"
    assert abs(df.iloc[1]["vote_supplier"] - 0.3) < 1e-6
    assert abs(df.iloc[1]["vote_customer"] - 0.35) < 1e-6
    assert abs(df.iloc[1]["max_conf"] - 0.35) < 1e-6
    # cleaning queue: ascending max_conf puts the ambiguous row first
    queue = df.sort_values("max_conf")
    assert queue.iloc[0]["sents"] == "s1"


def test_cross_validation_votes_distributed():
    rows = [{"sents": f"sentence about supplier {i}"} for i in range(20)]
    rows += [{"sents": f"ambiguous sentence {i}"} for i in range(10)]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(4)

    def make_scorer(bias):
        def scorer(tagged):
            if "supplier" in tagged:
                return "supplier", 0.9
            # fold models disagree on ambiguous rows
            return ("customer", 0.6) if bias else ("other", 0.55)
        return lambda: scorer

    voted = cross_validation_votes(
        ds, {"fold0": make_scorer(0), "fold1": make_scorer(1)}
    )
    df = voted.to_pandas()
    agree = df[df["agreed_label"] != "-1"]
    assert len(agree) == 20 and (agree["agreed_label"] == "supplier").all()
    rate = agreement_rate(
        ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    )
    assert abs(rate - 20 / 30) < 1e-9
