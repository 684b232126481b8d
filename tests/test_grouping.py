"""Alias detection / filtering / grouping semantics (reference
src/language_model/spacy_loader.py:144-357), modeled on the reference's
own test sentence (test/test_language_model.py:18-26)."""

from finance_sc_relations_ray.functions.grouping import (
    detect_alias_candidates,
    filter_aliases,
    group_entities,
)
from finance_sc_relations_ray.functions.names import similarity
from finance_sc_relations_ray.stages.ner import GazetteerTagger, NerActor

import pyarrow as pa

# alias-rich listing in the style of the reference fixture
SENT = (
    'International Business Machines Corporation "IBM" reports that '
    'Fujitsu Limited ("Fujitsu") and Amazon Web Services supplied components '
    "to Apple Inc."
)


def _ents(sent):
    return sorted({sp["text"] for sp in GazetteerTagger().spans(sent)})


def test_quote_alias_detected():
    ents = _ents(SENT)
    cands = detect_alias_candidates(SENT, ents)
    assert ("International Business Machines Corporation", "IBM") in cands
    assert ("Fujitsu Limited", "Fujitsu") in cands


def test_alias_filter_rules():
    # word overlap
    kept = filter_aliases([("Fujitsu Limited", "Fujitsu")], similarity)
    assert kept == [("Fujitsu Limited", "Fujitsu")]
    # initials (IBM vs the full name) — 0.8 coverage rule
    kept = filter_aliases(
        [("International Business Machines Corporation", "IBM")], similarity
    )
    assert kept
    # junk alias rejected
    kept = filter_aliases(
        [("International Business Machines Corporation", "Walmart Inc")], similarity
    )
    assert not kept


def test_alias_and_target_share_group():
    """The reference's assertion shape: alias and target co-grouped
    (test/test_language_model.py:27-31)."""
    ents = _ents(SENT)
    cands = detect_alias_candidates(SENT, ents)
    filtered = filter_aliases(cands, similarity)
    groups = group_entities(ents, filtered, filtered)
    assert groups["IBM"] == groups["International Business Machines Corporation"]
    assert groups["Fujitsu"] == groups["Fujitsu Limited"]
    # distinct orgs in distinct groups
    assert groups["Apple Inc"] != groups["IBM"]
    assert groups["Amazon Web Services"] != groups["Apple Inc"]


def test_ner_actor_schema_and_num_orgs():
    actor = NerActor()
    batch = pa.table(
        {"url": ["u1"], "sent_id": [0], "sent": [SENT]}
    )
    out = actor(batch)
    row = out.to_pylist()[0]
    assert row["num_orgs"] == 4  # IBM-group, Fujitsu-group, AWS, Apple
    names = {d["name"] for d in row["org_groups"]}
    assert "IBM" in names and "Apple Inc" in names


def test_group_id_zero_quirk_masked_by_embedding_fallback():
    """The reference drops group id 0 in the alias pre_exist lookup
    (filter(None,...) at spacy_loader.py:225-227), but the ref2group
    embedding fallback (spacy_loader.py:52-72) still finds the group via
    the reference name's self-similarity (1.0 > 0.95) — so an alias of a
    group-0 member still joins group 0. Our port reproduces both steps."""
    ents = ["Zeta Systems", "Qrs Industrial"]
    filtered = [("Zeta Systems", "Qrs Industrial")]  # seeds group 0
    all_aliases = filtered + [("Zeta Systems", "Unrelated Name Co")]
    groups = group_entities(ents + ["Unrelated Name Co"], filtered, all_aliases)
    assert groups["Unrelated Name Co"] == groups["Zeta Systems"] == 0
    # with a group id >= 1 the pre_exist path applies directly
    filtered2 = [("Aaa Co", "Bbb Co"), ("Zeta Systems", "Qrs Industrial")]
    all2 = filtered2 + [("Zeta Systems", "Unrelated Name Co")]
    groups2 = group_entities(
        ["Aaa Co", "Bbb Co", "Zeta Systems", "Qrs Industrial", "Unrelated Name Co"],
        filtered2,
        all2,
    )
    assert groups2["Unrelated Name Co"] == groups2["Zeta Systems"] == 1
