"""Triple-level precision/recall harness.

The north-star quality gate is triple P/R ≥ 0.95 against the
reference-semantics oracle (BASELINE.json). A triple matches on exact
``(subj, pred, obj)``; score differences don't affect P/R.
"""

from __future__ import annotations

import pandas as pd


def triple_pr(got: pd.DataFrame, expected: pd.DataFrame) -> dict:
    g = set(zip(got["subj"], got["pred"], got["obj"]))
    e = set(zip(expected["subj"], expected["pred"], expected["obj"]))
    tp = len(g & e)
    precision = tp / len(g) if g else 1.0
    recall = tp / len(e) if e else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "n_got": len(g),
        "n_expected": len(e),
        "tp": tp,
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "f1": round(f1, 4),
    }
