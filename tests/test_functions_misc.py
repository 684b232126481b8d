"""Unit tests for the offline-path functions: LLM parsing/masking,
fuzzy recovery, splits, sampling, canonicalization."""

from finance_sc_relations_ray.functions.canonical import (
    assign_relation,
    resort_relation,
    to_triple,
)
from finance_sc_relations_ray.functions.fuzzy import (
    hamming_search,
    k_fold_assign,
    negative_sample,
    stratified_doc_split,
)
from finance_sc_relations_ray.functions.llm import (
    demask,
    deserialize_relations,
    mask_terms,
    relations_tupled,
)


def test_mask_demask_roundtrip():
    sent = "Apple Inc buys chips from Taiwan Semiconductor Manufacturing Company."
    masked, mapping = mask_terms(
        sent, ["Apple Inc", "Taiwan Semiconductor Manufacturing Company"]
    )
    assert "Apple Inc" not in masked and "Company0" in masked
    assert demask(masked, mapping) == sent


def test_deserialize_relations_repairs():
    raw = (
        "Here are the relations: {'company_1': 'Apple Inc', "
        "'relationship': 'Supplier', 'company_2': 'Foxconn',} and junk {bad"
    )
    rels = deserialize_relations(raw)
    assert rels == [
        {"company_1": "Apple Inc", "relationship": "Supplier", "company_2": "Foxconn"}
    ]
    assert relations_tupled(rels) == [("Apple Inc", "supplier", "Foxconn")]


def test_resort_relation_canonicalizes():
    assert resort_relation("A", "customer", "B") == ("B", "supplier", "A")
    assert resort_relation("A", "supplier", "B") == ("A", "supplier", "B")
    assert resort_relation("A", "other", "B") == ("A", "other", "B")


def test_to_triple_directions():
    assert to_triple("S", "supplier", "R") == ("S", "supplies_to", "R")
    assert to_triple("C", "customer", "R") == ("R", "supplies_to", "C")
    assert to_triple("X", "other", "R") is None


def test_assign_relation_roles():
    d = assign_relation("E1", "E2", "supplier", 0.91234)
    assert d["e2_role"] == "supplier" and d["e1_role"] == "customer"
    assert d["score"] == 0.9123


def test_hamming_search():
    assert hamming_search("Sony Inc", ["Sony", "Walmart Inc"]) == "Sony"
    assert hamming_search("Zzzz", ["Sony", "Walmart Inc"]) is None


def test_stratified_split_deterministic_and_stratified():
    ids = list(range(100))
    strata = ["en"] * 80 + ["de"] * 20
    a = stratified_doc_split(ids, strata, 0.25)
    b = stratified_doc_split(ids, strata, 0.25)
    assert a == b
    n_valid_en = sum(1 for d in range(80) if a[d] == "valid")
    n_valid_de = sum(1 for d in range(80, 100) if a[d] == "valid")
    assert n_valid_en == 20 and n_valid_de == 5


def test_k_fold_balanced_deterministic():
    folds = k_fold_assign(list(range(50)), k=5)
    sizes = [sum(1 for v in folds.values() if v == i) for i in range(5)]
    assert sizes == [10] * 5
    assert folds == k_fold_assign(list(range(50)), k=5)


def test_negative_sample_seeded():
    items = list(range(100))
    s1 = negative_sample(items, 10, "u1|s1")
    s2 = negative_sample(items, 10, "u1|s1")
    s3 = negative_sample(items, 10, "u1|s2")
    assert s1 == s2 and len(s1) == 10
    assert s1 != s3
