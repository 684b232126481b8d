"""The reference's own test cases, ported against our weak-label
module (reference test/test_re_dataset_creation.py:31-155 and
test/test_conflict_finder.py:25-76 — same fixtures and expectations,
our implementation)."""

import pytest

from finance_sc_relations_ray.functions.canonical import resort_relation
from finance_sc_relations_ray.functions.weak_labels import (
    check_relation_tuples,
    extract_relations_from_llm,
    relation_search,
    return_possible_pairs,
)


@pytest.fixture
def datapoint():
    return {
        "filer": "ADVANCED MICRO DEVICES INC corp",
        "sentence": (
            "In addition, five customers, including Sony and Microsoft, "
            "accounted for approximately 95% of the net revenue attributable "
            "to ADVANCED MICRO DEVICES Inc Enterprise, Embedded and Semi "
            "Custom segment"
        ),
        "relations": [
            ["ADVANCED MICRO DEVICES Inc", "supplier", "Sony"],
            ["ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"],
        ],
        "org_groups": {
            "ADVANCED MICRO DEVICES Inc": 0, "Microsoft": 1, "Sony": 2
        },
    }


def test_check_relation_tuples():
    assert check_relation_tuples([]) is True
    assert check_relation_tuples([(1, 2, 3)]) is True
    assert check_relation_tuples([(1, 2)]) is False
    assert check_relation_tuples([(1, 2, 3), (4, 5, 6), (7, 8, 9)]) is True


def test_return_possible_pairs():
    assert return_possible_pairs([1, 2, 3]) == [(1, 2), (1, 3), (2, 3)]
    assert return_possible_pairs([]) == []


def test_only_filer(datapoint):
    llms, others = extract_relations_from_llm(
        datapoint, threshold=0.9, only_filer=True, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
    ]
    assert others == []


def test_onlyfiler_false_max_other1(datapoint):
    llms, others = extract_relations_from_llm(
        datapoint, threshold=0.9, only_filer=False, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
    ]
    assert others == [("Microsoft", "other", "Sony")]


def test_changing_names_slightly(datapoint):
    """Fuzzy variants ("Sony Inc", "Microsoft inc") resolve to the
    canonical org_groups names."""
    datapoint["relations"] = [
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Sony Inc"],
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft inc"],
    ]
    llms, others = extract_relations_from_llm(
        datapoint, threshold=0.9, only_filer=False, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
    ]
    assert others == [("Microsoft", "other", "Sony")]


def test_when_all_others(datapoint):
    datapoint["relations"] = [
        ["ADVANCED MICRO DEVICES Inc", "other", "Sony Inc"],
        ["ADVANCED MICRO DEVICES Inc", "other", "Microsoft inc"],
    ]
    llms, others = extract_relations_from_llm(
        datapoint, threshold=0.9, only_filer=False, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "other", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "other", "Microsoft"),
    ]
    assert others == [("Microsoft", "other", "Sony")]


def test_hallucinated_name_rejected(datapoint):
    """A relation naming companies absent from both org_groups and the
    sentence is dropped."""
    datapoint["relations"] = [
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Sony Inc"],
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft inc"],
        ["MISTAKE", "supplier", "WRONG NAME"],
    ]
    llms, others = extract_relations_from_llm(
        datapoint, threshold=0.9, only_filer=False, max_others=1
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
    ]
    assert others == [("Microsoft", "other", "Sony")]


def test_unknown_name_in_sentence_accepted(datapoint):
    """Unknown names are kept when they literally occur in the
    sentence."""
    datapoint["sentence"] = (
        "MISTAKE is supplier WRONG NAME of " + datapoint["sentence"]
    )
    datapoint["relations"] = [
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Sony Inc"],
        ["ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft inc"],
        ["MISTAKE", "supplier", "WRONG NAME"],
    ]
    llms, others = extract_relations_from_llm(
        datapoint, threshold=0.9, only_filer=False, max_others=2
    )
    assert llms == [
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Sony"),
        ("ADVANCED MICRO DEVICES Inc", "supplier", "Microsoft"),
        ("MISTAKE", "supplier", "WRONG NAME"),
    ]
    assert len(others) == 2


def test_having_no_llm_relations(datapoint):
    datapoint["relations"] = []
    llms, others = extract_relations_from_llm(
        datapoint, threshold=0.9, only_filer=False, max_others=2
    )
    assert llms == []
    assert len(others) == 2


def test_resort_tuple():
    assert resort_relation("Apple inc", "customer", "Google") == (
        "Google", "supplier", "Apple inc"
    )


ORBCOMM_RELATIONS = [
    ["ORBCOMM Inc", "nothing", "Systems Inc"],
    ["ORBCOMM Inc", "nothing", "inthinc Technology Solutions Inc"],
    ["ORBCOMM Inc", "nothing", "Value added Solutions Providers"],
    ["Onixsat", "supplier", "ORBCOMM Inc"],
    ["Satlink", "supplier", "ORBCOMM Inc"],
    ["Sascar", "supplier", "ORBCOMM Inc"],
    ["Carrier Transicold", "supplier", "ORBCOMM Inc"],
    ["Thermo King", "supplier", "ORBCOMM Inc"],
    ["CS Wholesale", "supplier", "ORBCOMM Inc"],
    ["Canadian National Railways", "supplier", "ORBCOMM Inc"],
    ["CR England", "supplier", "ORBCOMM Inc"],
    ["Hub Group Inc", "supplier", "ORBCOMM Inc"],
    ["KLLM Transport Services", "supplier", "ORBCOMM Inc"],
    ["Marten Transport", "supplier", "ORBCOMM Inc"],
]

CASES = [
    (("ORBCOMM Inc", "nothing", "inthinc Technology Solutions Inc"), True),
    (("Satlink", "nothing", "inthinc Technology Solutions Inc"), True),
    (("Onixsat", "supplier", "ORBCOMM"), True),
    (("ORBCOMM Inc", "supplier", "Systems Inc"), False),
    (("Onixsat", "nothing", "ORBCOMM Inc"), False),
    (("ORBCOMM Inc", "nothing", "Onixsat"), False),
    (("ORBCOMM Inc", "supplier", "Onixsat"), False),
    (("Random1", "nothing", "Random2"), True),
    (("Hub Group", "supplier", "ORBCOMM Inc"), True),
    (("Sascar", "supplier", "Onixsat"), False),
    (("Sascar", "nothing", "Onixsat"), True),
]


@pytest.mark.parametrize("query,expected", CASES)
def test_relation_search(query, expected):
    assert (
        relation_search(
            query, ORBCOMM_RELATIONS, threshold=0.85, main_relations=["supplier"]
        )
        is expected
    )


# ------------------------------------------------------------------- A6 --
def test_is_aligned_main_relation_and_other():
    from finance_sc_relations_ray.functions.weak_labels import is_aligned

    ogs = {"Acme Corp": 1, "Acme": 1, "Globex Inc": 2}
    # SME says supplier(e2 supplies e1): entity_2 is the supplier
    align, sme = is_aligned(
        "Globex Inc", "Acme Corp", "supplier", 1,
        [["Acme", "supplier", "Globex Inc"]], ogs,
    )
    assert align is True
    assert sme == ("Acme Corp", "supplier", "Globex Inc")
    # customer orientation flips the tuple
    align2, sme2 = is_aligned(
        "Acme Corp", "Globex Inc", "customer", 1,
        [["Acme", "supplier", "Globex Inc"]], ogs,
    )
    assert sme2 == ("Acme Corp", "supplier", "Globex Inc")
    assert align2 is True
    # 'other' aligns when the LLM saw no relations
    align3, _ = is_aligned("A", "B", "other", 1, [], {})
    assert align3 is True
    # 'other' conflicts when the LLM names the expected supplier
    align4, _ = is_aligned(
        "Globex Inc", "Acme Corp", "other", 1,
        [["Acme Corp", "supplier", "Globex Inc"]], ogs,
    )
    assert align4 is False
    # main relation with an unrelated LLM supplier → conflict
    align5, _ = is_aligned(
        "Globex Inc", "Acme Corp", "supplier", 1,
        [["Unrelated Co", "supplier", "Globex Inc"]], {},
    )
    assert align5 is False


def test_alignment_rate_counts_conflicts():
    from finance_sc_relations_ray.functions.weak_labels import alignment_rate

    rows = [
        {
            "entity_1": "Globex Inc", "entity_2": "Acme Corp",
            "inf_relations": "supplier", "label": 1,
            "llms_relations": [["Acme Corp", "supplier", "Globex Inc"]],
            "org_groups": {"Acme Corp": 1, "Globex Inc": 2},
        },
        {
            "entity_1": "Globex Inc", "entity_2": "Acme Corp",
            "inf_relations": "supplier", "label": 1,
            "llms_relations": [["Initech", "supplier", "Hooli"]],
            "org_groups": {},
        },
    ]
    out = alignment_rate(rows)
    assert out["n"] == 2 and out["rate"] == 0.5
    assert len(out["conflicts"]) == 1
    assert out["conflicts"][0]["sme_relation"] == (
        "Acme Corp", "supplier", "Globex Inc"
    )
