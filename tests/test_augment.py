"""Direction-inversion augmentation + relation balancing
(reference preprocessing_funcs.py:128-180 semantics)."""

import pandas as pd

from finance_sc_relations_ray.functions.augment import (
    augment_by_inversion,
    balance_relations,
)


def _df():
    return pd.DataFrame(
        {
            "sents": [
                "[E1] A [/E1] x [E2] B [/E2]",
                "[E1] C [/E1] y [E2] D [/E2]",
                "[E1] E [/E1] z [E2] F [/E2]",
            ],
            "relations": ["supplier", "supplier", "other"],
        }
    )


def test_augment_by_inversion():
    out = augment_by_inversion(_df())
    assert len(out) == 5  # 2 main rows doubled; 'other' untouched
    added = out.iloc[3:]
    assert set(added["relations"]) == {"customer"}
    assert added.iloc[0]["sents"] == "[E2] A [/E2] x [E1] B [/E1]"


def test_balance_relations():
    out = balance_relations(_df())
    counts = out["relations"].value_counts()
    assert counts["supplier"] == counts["customer"] == 2
    # balanced rows are inversions of majority rows
    assert "[E2] A [/E2]" in out.iloc[3]["sents"]


def test_balance_noop_when_equal():
    df = augment_by_inversion(_df())
    out = balance_relations(df)
    assert len(out) == len(df)
