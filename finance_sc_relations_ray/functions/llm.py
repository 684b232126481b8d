"""Offline LLM weak-labeling helpers (reference
src/labels_generator/llm_annotator.py) — the parsing/masking functions
the labeling path needs, re-implemented with deterministic behavior.
These are NOT in the 10^12-row hot path (SURVEY.md §2.3 ST6); the LLM
client itself is environment-gated (no network here), so only the pure
functions ship.
"""

from __future__ import annotations

import json
import re

# ------------------------------------------------------------- masking --
def mask_terms(
    sentence: str,
    terms: list[str],
    mask_word: str = "Company",
) -> tuple[str, dict[str, str]]:
    """Replace each org name with ``Company{i}`` before prompting
    (llm_annotator.py:193-205); longest-first so substrings don't
    corrupt longer names. Returns (masked, mapping mask→original)."""
    mapping: dict[str, str] = {}
    for i, term in enumerate(sorted(set(terms), key=len, reverse=True)):
        mask = f"{mask_word}{i}"
        if term in sentence:
            sentence = sentence.replace(term, mask)
            mapping[mask] = term
    return sentence, mapping


def demask(text: str, mapping: dict[str, str]) -> str:
    # longest mask first ("Company10" before "Company1")
    for mask in sorted(mapping, key=len, reverse=True):
        text = text.replace(mask, mapping[mask])
    return text


# ------------------------------------------------------------- parsing --
_DICT_RE = re.compile(r"\{[^{}]*\}")


def deserialize_relations(serialized: str) -> list[dict]:
    """Extract ``{...}`` dicts from LLM output with quote-repair
    fallbacks (llm_annotator.py:519-533, labels_generator/utils.py:134-163
    semantics): try json.loads; on failure convert single quotes and
    trailing commas; skip irreparable fragments."""
    out = []
    for frag in _DICT_RE.findall(serialized):
        for candidate in (
            frag,
            frag.replace("'", '"'),
            re.sub(r",\s*}", "}", frag.replace("'", '"')),
        ):
            try:
                val = json.loads(candidate)
                if isinstance(val, dict):
                    out.append(val)
                break
            except json.JSONDecodeError:
                continue
    return out


def relations_tupled(
    relations: list[dict],
    source_key: str = "company_1",
    relation_key: str = "relationship",
    target_key: str = "company_2",
) -> list[tuple[str, str, str]]:
    """Relation dicts → (c1, rel, c2) tuples, skipping malformed ones
    (labels_generator/utils.py:61-85 shape)."""
    out = []
    for rel in relations:
        c1, r, c2 = rel.get(source_key), rel.get(relation_key), rel.get(target_key)
        if c1 and r and c2:
            out.append((str(c1), str(r).lower(), str(c2)))
    return out
