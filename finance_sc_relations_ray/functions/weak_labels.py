"""Weak-label aggregation + conflict search (the reference's LLM
labeling path: src/labels_generator/data_aggregation.py:140-253,
src/labels_generator/utils.py:262-356, agg_utils.py:21-59).

These feed training-data creation (offline), re-implemented with:
- the same control flow and quirks (e.g. ``group2id.get(filer)`` can
  return a group ID whose falsiness short-circuits the filer filter —
  replicated);
- a deterministic name matcher: the SimCSE similarity is replaced by
  ``name_similarity`` = max(char-trigram cosine, core-token
  containment) so fuzzy variants like "Sony Inc" ↔ "Sony" match above
  the reference's 0.9 threshold without a model;
- seeded negative sampling (the reference's random.sample is unseeded).

The reference's own test cases (test/test_re_dataset_creation.py:31-155,
test/test_conflict_finder.py:25-76) are ported against this module in
tests/test_weak_labels.py.
"""

from __future__ import annotations

from collections import defaultdict
from itertools import chain
from typing import Iterable

import numpy as np

from .fuzzy import negative_sample
from .names import similarity as _trigram_similarity

_CORP_SUFFIXES = {
    "inc", "corp", "co", "ltd", "llc", "limited", "corporation", "company",
    "group", "holdings", "ag", "gmbh", "sa", "plc",
}


def _core_tokens(name: str) -> set[str]:
    return {
        t for t in name.lower().replace(",", " ").replace(".", " ").split()
        if t and t not in _CORP_SUFFIXES
    }


def name_similarity(a: str, b: str) -> float:
    """Deterministic stand-in for SimCSE company-name similarity:
    trigram cosine, boosted by core-token containment (suffix-stripped)
    so "Sony Inc" ↔ "Sony" scores 1.0 as the transformer would score
    ≈0.95."""
    ca, cb = _core_tokens(a), _core_tokens(b)
    containment = 0.0
    if ca and cb:
        inter = len(ca & cb)
        containment = inter / min(len(ca), len(cb))
        if inter == 0:
            containment = 0.0
    return max(_trigram_similarity(a, b), containment if containment == 1.0 else 0.0)


def similarity_vector(query: str, candidates: list[str]) -> np.ndarray:
    return np.array([name_similarity(query, c) for c in candidates])


def check_relation_tuples(relations: list[Iterable]) -> bool:
    """Shape check (agg_utils.py:21-27)."""
    return all(
        hasattr(r, "__len__") and not isinstance(r, str) and len(r) == 3
        for r in relations
    )


def return_possible_pairs(ids: list) -> list[tuple]:
    """All ordered index pairs i<j (agg_utils.py:29-34)."""
    return [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]


def get_other_relations(id2group: dict[int, list[str]]) -> list[tuple[str, str, str]]:
    """All group pairs as 'other' tuples (agg_utils.py:37-59)."""
    pairs = sorted(set(return_possible_pairs(sorted(id2group.keys()))))
    return [(id2group[a][0], "other", id2group[b][0]) for a, b in pairs]


def extract_relations_from_llm(
    datapoint: dict,
    threshold: float = 0.9,
    only_filer: bool = False,
    max_others: int = 3,
    seed_key: str = "agg-42",
) -> tuple[list[tuple], list[tuple]]:
    """LLM relation tuples → matched relations + sampled 'other' pairs
    (data_aggregation.py:140-253 semantics; see module docstring for
    the stub-matcher substitution)."""
    group2id: dict[str, int] = dict(datapoint["org_groups"])
    id2group: dict[int, list[str]] = defaultdict(list)
    for k, v in group2id.items():
        id2group[v].append(k)

    relations = datapoint["relations"]
    if not check_relation_tuples(relations):
        raise ValueError(
            "Invalid relations list on the datapoint, must be "
            "List[Tuple[Text, Text, Text]]"
        )

    llms_companies: list[str] = []
    if isinstance(relations, list) and relations:
        llms_companies = sorted({x for r in relations for x in (r[0], r[2])})

    group_names = list(group2id.keys())
    llms_ids: dict[str, int] = {}
    for llm_company in llms_companies:
        sims = similarity_vector(llm_company, group_names) if group_names else np.array([])
        if sims.size and sims.max() > threshold:
            llms_ids[llm_company] = group2id[group_names[int(sims.argmax())]]
        elif llm_company in datapoint["sentence"]:
            # hallucination guard: accept unknown names only when they
            # literally occur in the sentence (data_aggregation.py:196-200)
            new_id = max(id2group.keys()) + 1 if id2group else 1
            group2id[llm_company] = new_id
            id2group[new_id] = [llm_company]
            llms_ids[llm_company] = new_id

    llms_names = {k: id2group[v][0] for k, v in llms_ids.items()}
    available_relations = return_possible_pairs(sorted(set(llms_ids.values())))

    exist_relations: list[tuple] = []
    llms_relations: list[tuple] = []
    for relation in relations or []:
        c1_name = llms_names.get(relation[0])
        c2_name = llms_names.get(relation[2])
        c1_id, c2_id = llms_ids.get(relation[0]), llms_ids.get(relation[2])
        if None in (c1_id, c2_id):
            continue
        llms_relations.append((c1_name, relation[1], c2_name))
        exist_relations.append(tuple(sorted([c1_id, c2_id])))

    other_ids = sorted(set(available_relations) ^ set(exist_relations))
    other_relations = [
        (id2group[a][0], "other", id2group[b][0]) for a, b in other_ids
    ]
    if not llms_relations and not other_relations:
        other_relations = get_other_relations(id2group)

    if only_filer:
        given_filer = datapoint.get("filer")
        filer_name = None
        if given_filer:
            filer_name = group2id.get(given_filer)  # reference quirk:
            # an exact hit yields the group ID (falsy for id 0), which
            # disables the filter below — replicated
            if not filer_name and group2id:
                scope = list(group2id.keys())
                sims = similarity_vector(given_filer, scope)
                if sims.max() > threshold:
                    filer_name = scope[int(sims.argmax())]
        if filer_name:
            llms_relations = [
                x for x in llms_relations if filer_name in (x[0], x[2])
            ]
            other_relations = [
                x for x in other_relations if filer_name in (x[0], x[2])
            ]

    other_relations = sorted(other_relations)
    other_relations = negative_sample(
        other_relations, min(len(other_relations), max_others), seed_key
    )
    return llms_relations, other_relations


def relation_search(
    query_relation: tuple[str, str, str],
    relations_tuples: list[tuple[str, str, str]],
    threshold: float = 0.85,
    main_relations: list[str] = ("supplier",),
) -> bool:
    """Conflict check: does ``query_relation`` align with the known
    relation list? (labels_generator/utils.py:262-356 semantics —
    True = NO conflict for non-main relations, True = found for main.)"""
    source_orgs: dict[str, list[str]] = defaultdict(list)
    dist_orgs: dict[str, list[str]] = defaultdict(list)
    for rel in relations_tuples or []:
        if isinstance(rel, str):
            continue
        if rel[1] in main_relations:
            source_orgs[rel[0]].append(rel[2])
            dist_orgs[rel[2]].append(rel[0])
    source_list = list(source_orgs.keys())
    dist_list = list(dist_orgs.keys())

    def _match(query: str, candidates: list[str]) -> tuple[bool, int]:
        sims = similarity_vector(query, candidates)
        idx = int(sims.argmax())
        hit = bool(sims.max() > threshold) or any(
            query.lower() in x.lower() for x in candidates
        )
        return hit, idx

    s2d = d2s = False
    if source_orgs:
        source_hit, idx = _match(query_relation[0], source_list)
        if source_hit:
            dist_hit, _ = _match(
                query_relation[2], source_orgs[source_list[idx]]
            )
            s2d = source_hit and dist_hit
    if query_relation[1] in main_relations:
        return s2d
    if dist_orgs:
        dist_hit, idx = _match(query_relation[0], dist_list)
        if dist_hit:
            source_hit, _ = _match(query_relation[2], dist_orgs[dist_list[idx]])
            d2s = dist_hit and source_hit
    return not (s2d or d2s)
