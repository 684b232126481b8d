"""Versioned LLM prompt-card registry (§2.11, ST6) — the offline
surface of the reference's LLMAnnotator template system
(src/labels_generator/llm_annotator.py:56-161):

- cards live at ``<root>/v<version>/card.yaml``; versions are floats
  discovered from the directory names and sorted;
- a card carries the model name, temperature, dataset pointer and the
  three prompt templates (explanation / labeling / confirmation);
- VALIDATION enforces each template's required substitution tags
  (llm_annotator.py:31-33 + update_template checks): a new version is
  only written when every changed prompt still carries its tags;
- new versions are immutable siblings at ``v<max+0.1>`` (the reference
  never edits a published card in place).

The LLM CLIENT itself is environment-gated (no network here): callers
inject a ``complete(prompt) -> str`` callable; rendering + parsing
(functions/llm.py) are pure and tested offline.
"""

from __future__ import annotations

import os
import re

import yaml

REQUIRED_TAGS: dict[str, tuple[str, ...]] = {
    "explanation_prompt": ("{sentence}", "{instructions}"),
    "labeling_prompt": ("{explanation}",),
    "confirmation_prompt": (
        "{company1}", "{company2}", "{relation}", "{explanation}"
    ),
}
REQUIRED_FIELDS = ("model", "temperature", "dataset") + tuple(REQUIRED_TAGS)

_VDIR_RE = re.compile(r"^v(\d+(?:\.\d+)?)$")


class CardValidationError(ValueError):
    pass


def validate_card(card: dict) -> None:
    """Raise CardValidationError on a structurally invalid card."""
    missing = [f for f in REQUIRED_FIELDS if f not in card]
    if missing:
        raise CardValidationError(f"card missing fields: {missing}")
    if not isinstance(card["model"], str) or not card["model"]:
        raise CardValidationError("card.model must be a non-empty string")
    for field, tags in REQUIRED_TAGS.items():
        absent = [t for t in tags if t not in card[field]]
        if absent:
            raise CardValidationError(
                f"{field} must include substitution tags {list(absent)}"
            )


def render(card: dict, which: str, **subs: str) -> str:
    """Substitute ``{tag}`` placeholders into one of the card's prompt
    templates. Unknown placeholders are left intact (so a card can
    carry literal braces the caller doesn't own)."""
    text = card[which]
    for key, val in subs.items():
        text = text.replace("{" + key + "}", val)
    return text


class CardRegistry:
    """Filesystem registry of immutable card versions."""

    def __init__(self, root_dir: str):
        self.root = root_dir
        os.makedirs(root_dir, exist_ok=True)

    def versions(self) -> list[float]:
        out = []
        for name in os.listdir(self.root):
            m = _VDIR_RE.match(name)
            if m and os.path.isfile(os.path.join(self.root, name, "card.yaml")):
                out.append(float(m.group(1)))
        return sorted(out)

    def _vdir(self, version: float) -> str:
        tag = f"{version:g}"
        return os.path.join(self.root, f"v{tag}")

    def load(self, version: float | None = None) -> dict:
        """Load a version (default: latest). Raises on unknown."""
        versions = self.versions()
        if not versions:
            raise FileNotFoundError(f"no card versions under {self.root}")
        if version is None:
            version = versions[-1]
        if version not in versions:
            raise FileNotFoundError(
                f"invalid version {version}; available: {versions}"
            )
        with open(os.path.join(self._vdir(version), "card.yaml")) as f:
            card = yaml.safe_load(f)
        card["_version"] = version
        return card

    def create(self, card: dict) -> float:
        """Validate and publish ``card`` as the next version
        (max + 0.1, like the reference's update_template). Returns the
        new version number."""
        card = {k: v for k, v in card.items() if not k.startswith("_")}
        validate_card(card)
        versions = self.versions()
        new_version = round(versions[-1] + 0.1, 2) if versions else 1.0
        vdir = self._vdir(new_version)
        os.makedirs(vdir)
        with open(os.path.join(vdir, "card.yaml"), "w") as f:
            yaml.safe_dump(card, f)
        return new_version


def annotate_batch(
    sentences: list[str],
    org_groups: list[list[str]],
    card: dict,
    complete,
    instructions: str = "",
) -> list[dict]:
    """The three-prompt annotation loop (explain → label → parse) over
    a batch, with org masking before prompting and demasking after —
    pure composition of the card templates with functions/llm.py;
    ``complete`` is the injected LLM call. Designed to run inside a
    map_batches actor (client built once per actor) when a client
    exists; unit-tested with a fake ``complete``."""
    from .llm import deserialize_relations, mask_terms

    out = []
    for sent, orgs in zip(sentences, org_groups):
        masked, mapping = mask_terms(sent, orgs)
        explanation = complete(
            render(card, "explanation_prompt",
                   sentence=masked, instructions=instructions)
        )
        label_text = complete(
            render(card, "labeling_prompt", explanation=explanation)
        )
        relations = deserialize_relations(label_text)
        out.append(
            {"masked": masked, "mapping": mapping,
             "explanation": explanation, "relations": relations}
        )
    return out
