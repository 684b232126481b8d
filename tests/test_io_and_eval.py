"""Suffix-dispatch reader + direction-consistency report."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from finance_sc_relations_ray.pipelines.eval import direction_consistency
from finance_sc_relations_ray.sources.io import read_table
from finance_sc_relations_ray.stages.scoring import RuleReScorer


def test_read_table_dispatch(tmp_path):
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    pq.write_table(t, str(tmp_path / "t.parquet"))
    import csv

    with open(tmp_path / "t.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["a", "b"])
        w.writerows([[1, "x"], [2, "y"], [3, "z"]])
    with open(tmp_path / "t.json", "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')

    assert read_table(str(tmp_path / "t.parquet")).count() == 3
    assert read_table(str(tmp_path / "t.csv")).count() == 3
    assert read_table(str(tmp_path / "t.json")).count() == 2
    with pytest.raises(NotImplementedError):
        read_table(str(tmp_path / "t.xlsx"))


def test_direction_consistency_report():
    scorer = RuleReScorer().score
    sents = [
        "[E1] Apple Inc [/E1] supplied parts to [E2] Dell Technologies [/E2].",
        "[E2] Jabil Inc [/E2] supplied parts to [E1] Walmart Inc [/E1].",
        "[E1] Apple Inc [/E1] acquired [E2] Jabil Inc [/E2].",
    ]
    rep = direction_consistency(scorer, sents)
    assert rep["n"] == 3
    assert rep["consistency_rate"] == 1.0


# ---------------------------------------------------------------- A8/S3 --
def test_classification_report_golden():
    from finance_sc_relations_ray.pipelines.eval import classification_report

    y_true = ["supplier", "supplier", "customer", "other", "customer"]
    y_pred = ["supplier", "customer", "customer", "other", "customer"]
    cr = classification_report(y_true, y_pred, ("supplier", "customer", "other"))
    assert cr["supplier"] == {
        "precision": 1.0, "recall": 0.5, "f1-score": 0.6667, "support": 2
    }
    assert cr["customer"]["precision"] == round(2 / 3, 4)
    assert cr["customer"]["recall"] == 1.0
    assert cr["other"] == {
        "precision": 1.0, "recall": 1.0, "f1-score": 1.0, "support": 1
    }
    assert cr["accuracy"] == 0.8
    assert cr["weighted avg"]["support"] == 5


def test_confusion_matrix_and_top_losses():
    import numpy as np
    import pandas as pd

    from finance_sc_relations_ray.pipelines.eval import (
        confusion_matrix,
        top_losses,
    )

    labels = ("supplier", "customer", "other")
    y_true = ["supplier", "supplier", "customer", "other"]
    y_pred = ["supplier", "customer", "customer", "other"]
    cm = confusion_matrix(y_true, y_pred, labels, normalize=None)
    assert cm[0].tolist() == [1, 1, 0]
    cmn = confusion_matrix(y_true, y_pred, labels, normalize="true")
    assert np.allclose(cmn[0], [0.5, 0.5, 0.0])

    df = pd.DataFrame(
        {
            "expected_relation": y_true,
            "prediction": y_pred,
            "score": [0.9, 0.8, 0.7, 0.6],
            "sents": ["a", "b", "c", "d"],
        }
    )
    tl = top_losses(df)
    assert len(tl) == 1 and tl.iloc[0]["sents"] == "b"


def test_write_report_artifacts(tmp_path):
    import json
    import os

    import pandas as pd

    from finance_sc_relations_ray.pipelines.eval import write_report_artifacts

    df = pd.DataFrame(
        {
            "expected_relation": ["supplier", "customer", "other"] * 4,
            "prediction": ["supplier", "customer", "other"] * 3
            + ["customer", "supplier", "other"],
            "score": [0.99, 0.95, 0.91] * 4,
            "sents": [f"s{i}" for i in range(12)],
        }
    )
    d = str(tmp_path / "reports")
    metrics = write_report_artifacts(df, d, tag_name="val")
    for suffix in (
        "classification_report.md", "metrics.json", "confusion.csv",
        "errors.parquet", "thresholds.json",
    ):
        assert os.path.exists(os.path.join(d, f"val_{suffix}")), suffix
    assert metrics["val_accuracy"] == round(10 / 12, 3)
    sweep = json.load(open(os.path.join(d, "val_thresholds.json")))
    assert set(sweep) == {"0.9", "0.95", "0.99"}
    assert sweep["0.9"]["dropped"] == 0
    assert sweep["0.95"]["dropped"] == 8  # only the 0.99 rows survive
    assert sweep["0.99"]["dropped"] == 12  # strict > threshold
    errs = pd.read_parquet(os.path.join(d, "val_errors.parquet"))
    assert len(errs) == 2


def test_confusion_from_dataset_matches_local():
    import numpy as np
    import pandas as pd
    import ray.data

    from finance_sc_relations_ray.pipelines.eval import (
        confusion_from_dataset,
        confusion_matrix,
    )

    labels = ("supplier", "customer", "other")
    df = pd.DataFrame(
        {
            "expected_relation": ["supplier", "customer", "other", "supplier"] * 5,
            "prediction": ["supplier", "other", "other", "customer"] * 5,
        }
    )
    ds = ray.data.from_pandas(df).repartition(4)
    got = confusion_from_dataset(ds, labels)
    exp = confusion_matrix(
        df["expected_relation"].tolist(), df["prediction"].tolist(),
        labels, normalize=None,
    )
    assert np.allclose(got, exp)
