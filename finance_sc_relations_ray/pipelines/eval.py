"""Triple-level precision/recall harness.

The north-star quality gate is triple P/R ≥ 0.95 against the
reference-semantics oracle (BASELINE.json). A triple matches on exact
``(subj, pred, obj)``; score differences don't affect P/R.
"""

from __future__ import annotations

import pandas as pd


def direction_consistency(scorer, tagged_sentences: list[str]) -> dict:
    """Direction-consistency report (reference
    src/stages/evaluate.py:131-160): predict on tag-swapped inputs and
    compare — a consistent model yields the inverse label. ``scorer``
    maps a tagged sentence to a 3-score list (supplier, customer,
    other)."""
    from ..config import INVERSE_RELATION
    from ..functions.tagging import inverse_relations

    labels = ("supplier", "customer", "other")
    consistent = 0
    for sent in tagged_sentences:
        fwd = labels[max(range(3), key=lambda i: scorer(sent)[i])]
        rev = labels[
            max(range(3), key=lambda i: scorer(inverse_relations(sent))[i])
        ]
        if rev == INVERSE_RELATION[fwd]:
            consistent += 1
    n = len(tagged_sentences)
    return {
        "n": n,
        "consistent": consistent,
        "consistency_rate": round(consistent / n, 4) if n else 1.0,
    }


def threshold_sweep(
    got: pd.DataFrame,
    expected: pd.DataFrame,
    thresholds: tuple[float, ...] = (0.90, 0.95, 0.99),
) -> pd.DataFrame:
    """Per-threshold triple P/R (the reference's evaluation sweep at
    score > 0.90/0.95/0.99, src/relation_extraction/misc.py:116-134):
    keep predicted triples with score > t, compare to the full expected
    set."""
    rows = []
    for t in thresholds:
        kept = got[got["score"] > t]
        pr = triple_pr(kept, expected)
        rows.append({"threshold": t, **pr})
    return pd.DataFrame(rows)


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
