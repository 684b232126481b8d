"""Training-data augmentation (reference
src/relation_extraction/preprocessing_funcs.py:128-180): direction
inversion doubles supplier/customer rows with swapped markers and the
inverse label; balancing tops up the minority direction class."""

from __future__ import annotations

import pandas as pd

from ..config import INVERSE_RELATION
from .tagging import inverse_relations


def augment_by_inversion(
    df: pd.DataFrame,
    sent_col: str = "sents",
    label_col: str = "relations",
    main_relations: tuple[str, ...] = ("supplier", "customer"),
) -> pd.DataFrame:
    """Every main-relation row gains a tag-swapped copy with the inverse
    label (preprocessing_funcs.py:128-151)."""
    extra = df[df[label_col].isin(main_relations)].copy()
    extra[sent_col] = extra[sent_col].map(inverse_relations)
    extra[label_col] = extra[label_col].map(INVERSE_RELATION)
    return pd.concat([df, extra], ignore_index=True)


def balance_relations(
    df: pd.DataFrame,
    sent_col: str = "sents",
    label_col: str = "relations",
    main_relations: tuple[str, ...] = ("supplier", "customer"),
) -> pd.DataFrame:
    """Top up the minority direction class by inverting majority rows
    until the two main classes are equal (preprocessing_funcs.py:153-180
    semantics; deterministic: rows taken in order)."""
    counts = df[label_col].value_counts()
    a, b = main_relations
    na, nb = int(counts.get(a, 0)), int(counts.get(b, 0))
    if na == nb:
        return df.copy()
    majority, minority = (a, b) if na > nb else (b, a)
    need = abs(na - nb)
    donors = df[df[label_col] == majority].head(need).copy()
    donors[sent_col] = donors[sent_col].map(inverse_relations)
    donors[label_col] = minority
    return pd.concat([df, donors], ignore_index=True)
