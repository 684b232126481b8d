"""Fixed org-name gazetteer + company DB used by the deterministic stub
NER and the entity-linking lookup side (FIXTURES.md §2-3).

The reference detects ORG entities with spaCy en_core_web_trf
(src/language_model/spacy_loader.py:358-393); that model is not in this
container, so tests/bench run a gazetteer tagger behind the same actor
interface (stages/ner.py). Names are public company names; (full, abbr)
pairs are chosen so the reference's alias-filter rules
(spacy_loader.py:157-196) accept them via word-overlap or initials.
"""

from __future__ import annotations

import pyarrow as pa

from .functions.names import normalize_name, prefix_key

# (full_name, abbreviation-or-None). No hyphens (the clean step collapses
# '-'), no name is a substring of another full name.
GAZETTEER: list[tuple[str, str | None]] = [
    ("International Business Machines Corporation", "IBM"),
    ("Apple Inc", None),
    ("Samsung Electronics Co", None),
    ("Fujitsu Limited", "Fujitsu"),
    ("Amazon Web Services", "AWS"),
    ("Microsoft Corporation", "Microsoft"),
    ("Alphabet Inc", None),
    ("Intel Corporation", "Intel"),
    ("Advanced Micro Devices", "AMD"),
    ("Taiwan Semiconductor Manufacturing Company", "TSMC"),
    ("Qualcomm Incorporated", "Qualcomm"),
    ("Broadcom Inc", None),
    ("Texas Instruments Incorporated", None),
    ("Micron Technology", "Micron"),
    ("Western Digital Corporation", None),
    ("Seagate Technology", "Seagate"),
    ("Dell Technologies", "Dell"),
    ("Hewlett Packard Enterprise", "HPE"),
    ("Cisco Systems", "Cisco"),
    ("Oracle Corporation", "Oracle"),
    ("Salesforce Inc", "Salesforce"),
    ("Adobe Systems", "Adobe"),
    ("Nvidia Corporation", "Nvidia"),
    ("Sony Group Corporation", None),
    ("Panasonic Holdings", "Panasonic"),
    ("LG Electronics", None),
    ("Foxconn Technology Group", "Foxconn"),
    ("Pegatron Corporation", "Pegatron"),
    ("Wistron Corporation", "Wistron"),
    ("Flex Ltd", None),
    ("Jabil Inc", "Jabil"),
    ("Celestica Inc", "Celestica"),
    ("Sanmina Corporation", "Sanmina"),
    ("Boeing Company", "Boeing"),
    ("Airbus Group", "Airbus"),
    ("Lockheed Martin Corporation", None),
    ("Raytheon Technologies", "Raytheon"),
    ("General Electric Company", "GE"),
    ("Honeywell International", "Honeywell"),
    ("Siemens AG", "Siemens"),
    ("General Motors Company", "GM"),
    ("Ford Motor Company", "Ford"),
    ("Tesla Inc", "Tesla"),
    ("Toyota Motor Corporation", "Toyota"),
    ("Volkswagen Group", "Volkswagen"),
    ("Robert Bosch GmbH", "Bosch"),
    ("Continental AG", None),
    ("Magna International", "Magna"),
    ("Denso Corporation", "Denso"),
    ("Caterpillar Inc", "Caterpillar"),
    ("Deere and Company", None),
    ("United Parcel Service", "UPS"),
    ("FedEx Corporation", "FedEx"),
    ("Walmart Inc", "Walmart"),
    ("Target Corporation", None),
    ("Costco Wholesale Corporation", "Costco"),
    ("Procter and Gamble Company", None),
    ("Johnson and Johnson", None),
    ("Pfizer Inc", "Pfizer"),
    ("Merck and Co", "Merck"),
    # substring-entity pathology (FIXTURES.md §2, cf. the reference's
    # invalid_rows.json 2M/M cases): "3M" is a substring of "3M Company"
    ("3M Company", "3M"),
]

# Hub entities: appear in a large share of pages to create the
# mega-entity skew that the salted canonicalization shuffle must handle
# (SURVEY.md §7.4).
HUBS = ["Apple Inc", "Samsung Electronics Co", "Foxconn Technology Group"]


def all_surface_forms(extra_entities: int = 0) -> list[str]:
    """Every recognizable surface form (full names + abbreviations),
    optionally extended with ``extra_entities`` synthetic names."""
    out = []
    for full, abbr in GAZETTEER:
        out.append(full)
        if abbr:
            out.append(abbr)
    out.extend(synthetic_entity_names(extra_entities))
    return out


def synthetic_entity_names(n: int) -> list[str]:
    """``n`` deterministic synthetic org names that grow the entity
    space with the page count (bench realism: a FIXED gazetteer
    saturates the distinct-triple space, so the bench's final dedup
    shuffle moves trivial data — VERDICT r01). Fixed-width numbering
    keeps every name boundary-distinct (no name is a substring of
    another), and the 'Synthco' stem keeps them disjoint from the real
    gazetteer."""
    return [f"Synthco {i:06d} Industries" for i in range(n)]


def company_db_table(prefix_len: int = 2) -> pa.Table:
    """The entity-linking lookup side (FIXTURES.md §3): every gazetteer
    org plus near-miss distractors exercising the 0.95/0.80 thresholds
    (reference src/sagemaker/re_inference.py:135-137)."""
    rows: list[tuple[str, str]] = []
    for i, (full, _abbr) in enumerate(GAZETTEER):
        rows.append((normalize_name(full), f"rg{i:05d}"))
    distractors = [
        "sony electronics llc",
        "apple computer co",
        "intel capital group",
        "microsoft ireland operations",
        "ford otosan",
        "boeing defense space",
        "samsung sdi",
        "toyota industries",
        "ge healthcare",
        "dell financial services",
    ]
    for j, name in enumerate(distractors):
        rows.append((normalize_name(name), f"rg9{j:04d}"))
    return pa.table(
        {
            "normalizedname": pa.array([r[0] for r in rows], type=pa.string()),
            "companyprefix": pa.array(
                [prefix_key(r[0], prefix_len) for r in rows], type=pa.string()
            ),
            "rgid": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )
