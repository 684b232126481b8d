"""Property-based invariants (hypothesis) for the hot-path string
operators: clean idempotence/byte parity, marker integrity, inversion
involution, sentencize containment."""

import re

from hypothesis import given, settings, strategies as st

from finance_sc_relations_ray.functions.clean import clean_text
from finance_sc_relations_ray.functions.tagging import (
    entity_annotation,
    inverse_relations,
)
from finance_sc_relations_ray.functions.textops import sentencize, token_count

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_clean_matches_reference_regex_and_is_idempotent(s):
    ref = re.sub("[-[\\] ]+", " ", s).strip()
    got = clean_text(s)
    assert got == ref
    assert clean_text(got) == got  # idempotent


@given(TEXT)
@settings(max_examples=100, deadline=None)
def test_inverse_relations_is_involution(s):
    # on marker-free text inversion must be identity-preserving twice
    assert inverse_relations(inverse_relations(s)) == s or "[E" in s


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_sentencize_reconstructs_non_terminator_chars(s):
    sents = sentencize(s)
    # every non-empty sentence is a substring of the input
    for sent in sents:
        assert sent.strip() == sent and sent != ""
    # token_count never negative and zero iff no RE2-non-space chars.
    # The tokenizer is deliberately RE2-'\S+'-parity (ASCII class
    # [\t\n\f\r ]), NOT Python-\s: e.g. \x1c-\x1f are strippable
    # whitespace to Python str.strip() but token characters to RE2 and
    # the DuckDB oracle — so the invariant uses the ASCII class.
    assert token_count(s) >= 0
    assert (token_count(s) == 0) == (s.strip(" \t\n\f\r") == "")


@given(st.text(alphabet=st.sampled_from(" abcdefgh."), min_size=5, max_size=80))
@settings(max_examples=100, deadline=None)
def test_entity_annotation_marker_integrity(s):
    """Whenever tagging succeeds, each variant has exactly one balanced
    E1 and E2 marker pair."""
    sent = f"Acme Alpha {s} Beta Corp"
    groups = {"Acme Alpha": 0, "Beta Corp": 1}
    for tagged in entity_annotation(sent, "Acme Alpha", "Beta Corp", groups, 8):
        assert tagged.count("[E1]") == 1 and tagged.count("[/E1]") == 1
        assert tagged.count("[E2]") == 1 and tagged.count("[/E2]") == 1
        assert tagged.find("[E1]") < tagged.find("[/E1]")
        assert tagged.find("[E2]") < tagged.find("[/E2]")
