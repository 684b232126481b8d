"""§2.11 ST6: versioned LLM prompt-card registry (reference
src/labels_generator/llm_annotator.py:56-161)."""

import pytest

from finance_sc_relations_ray.functions.llm_cards import (
    CardRegistry,
    CardValidationError,
    annotate_batch,
    render,
    validate_card,
)

VALID_CARD = {
    "model": "gpt-3.5-turbo",
    "temperature": 0.0,
    "dataset": "data/unlabeled.json",
    "explanation_prompt": (
        "Explain the relations in: {sentence}\nFollow: {instructions}"
    ),
    "labeling_prompt": "Given {explanation}, emit JSON relations.",
    "confirmation_prompt": (
        "Confirm {company1} {relation} {company2} given {explanation}."
    ),
}


def test_validate_card_tags():
    validate_card(VALID_CARD)  # no raise
    bad = dict(VALID_CARD, labeling_prompt="no tag here")
    with pytest.raises(CardValidationError, match="labeling_prompt"):
        validate_card(bad)
    with pytest.raises(CardValidationError, match="missing fields"):
        validate_card({k: v for k, v in VALID_CARD.items() if k != "model"})


def test_registry_versioning(tmp_path):
    reg = CardRegistry(str(tmp_path / "templates"))
    assert reg.versions() == []
    v1 = reg.create(VALID_CARD)
    assert v1 == 1.0
    v2 = reg.create(dict(VALID_CARD, temperature=0.2))
    assert v2 == 1.1
    assert reg.versions() == [1.0, 1.1]
    latest = reg.load()
    assert latest["temperature"] == 0.2 and latest["_version"] == 1.1
    old = reg.load(1.0)
    assert old["temperature"] == 0.0
    with pytest.raises(FileNotFoundError):
        reg.load(3.0)
    # invalid cards are never published
    with pytest.raises(CardValidationError):
        reg.create(dict(VALID_CARD, confirmation_prompt="missing tags"))
    assert reg.versions() == [1.0, 1.1]


def test_render_substitution():
    text = render(
        VALID_CARD, "confirmation_prompt",
        company1="Acme", company2="Globex", relation="supplier",
        explanation="because",
    )
    assert "Acme" in text and "{company1}" not in text
    # unknown placeholders left intact
    assert "{missing}" in render(
        {"p": "{sentence} {missing}"}, "p", sentence="x"
    )


def test_annotate_batch_offline_roundtrip():
    calls = []

    def fake_complete(prompt):
        calls.append(prompt)
        if "Explain" in prompt:
            return "Company0 supplies Company1."
        return (
            '[{"company_1": "Company0", "relationship": "supplier", '
            '"company_2": "Company1"}]'
        )

    out = annotate_batch(
        ["Acme Corp supplies Globex Inc."],
        [["Acme Corp", "Globex Inc."]],
        VALID_CARD,
        fake_complete,
        instructions="be terse",
    )
    assert len(out) == 1
    rec = out[0]
    assert "Acme Corp" not in rec["masked"]  # masked before prompting
    assert rec["relations"][0]["relationship"] == "supplier"
    assert any("be terse" in c for c in calls)
