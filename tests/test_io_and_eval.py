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
