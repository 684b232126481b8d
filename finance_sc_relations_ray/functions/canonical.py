"""Relation canonicalization.

- ``assign_relation`` (reference src/relation_extraction/infer.py:446-460):
  a scored pair row → ``{e2: label, e1: inverse(label), score}``. The
  classifier label is the role of e2 relative to e1.
- ``resort_relation`` (reference src/labels_generator/utils.py:54-59):
  flip customer-direction tuples into the canonical supplier direction.
- ``to_triple``: a per-document (company, relationshipLabel, reporter)
  verdict → a canonical ``(subj, supplies_to, obj)`` triple.
"""

from __future__ import annotations

from ..config import INVERSE_RELATION


def assign_relation(e1: str, e2: str, relation: str, score: float) -> dict:
    return {
        "e1": e1,
        "e2": e2,
        "e2_role": relation,
        "e1_role": INVERSE_RELATION.get(relation, "other"),
        "score": round(float(score), 4),
    }


def resort_relation(c1: str, relation: str, c2: str) -> tuple[str, str, str]:
    """(c1, rel, c2) with rel ∈ {supplier, customer} → supplier-direction
    tuple (labels_generator/utils.py:54-59 with the inverse map)."""
    if relation == "customer":
        return (c2, "supplier", c1)
    return (c1, relation, c2)


def to_triple(
    company: str, label: str, reporter: str, pred: str = "supplies_to"
) -> tuple[str, str, str] | None:
    """Per-doc verdict → canonical triple.

    ``label`` is the company's aggregated role relative to the reporter
    (reporter.py:59-69 argmax). supplier → company supplies the
    reporter; customer → the reporter supplies the company. ``other`` →
    no triple.
    """
    if label == "supplier":
        return (company, pred, reporter)
    if label == "customer":
        return (reporter, pred, company)
    return None
