"""Threshold-sweep evaluation report (reference misc.py:116-134)."""

import pandas as pd

from finance_sc_relations_ray.pipelines.eval import threshold_sweep


def test_threshold_sweep_monotonic():
    got = pd.DataFrame(
        {
            "subj": ["a", "b", "c", "d"],
            "pred": ["p"] * 4,
            "obj": ["w", "x", "y", "z"],
            "score": [0.99, 0.96, 0.92, 0.5],
        }
    )
    exp = pd.DataFrame(
        {"subj": ["a", "b", "q"], "pred": ["p"] * 3, "obj": ["w", "x", "r"]}
    )
    sweep = threshold_sweep(got, exp, thresholds=(0.90, 0.95, 0.99))
    assert sweep["threshold"].tolist() == [0.90, 0.95, 0.99]
    # predictions kept shrink with threshold
    assert sweep["n_got"].tolist() == [3, 2, 0]
    # precision at 0.95: kept {a,b} both correct
    assert sweep.loc[1, "precision"] == 1.0
    assert sweep.loc[1, "recall"] == round(2 / 3, 4)
