"""Byte-identity of the clean invariant (reference
src/utils/data_clean.py:5-6 semantics) and the html→text extraction."""

import re

import pyarrow as pa

from finance_sc_relations_ray.functions.clean import clean_array, clean_text
from finance_sc_relations_ray.sources.pages import generate_pages
from finance_sc_relations_ray.stages.extract import extract_clean_page

TRICKY = [
    "A - B",
    "  leading and trailing  ",
    "brackets [inside] text",
    "many---dashes and [ ] mixes - [x]-",
    "tabs\tand\nnewlines - kept",
    "’s possessive “smart quotes”",
    "",
    "-[ ]-",
    "no specials at all",
    "Apple Inc - and [its] partner  Dell supplied parts.",
]


def reference_clean(x: str) -> str:
    # the reference's exact expression (data_clean.py:5-6)
    return re.sub("[-[\\] ]+", " ", x).strip()


def test_clean_scalar_matches_reference_semantics():
    for s in TRICKY:
        assert clean_text(s) == reference_clean(s), repr(s)


def test_clean_array_matches_scalar():
    arr = pa.array(TRICKY, type=pa.string())
    out = clean_array(arr).to_pylist()
    assert out == [clean_text(s) for s in TRICKY]


def test_extract_clean_byte_identical_per_url():
    pages = generate_pages(list(range(50)))
    for row in pages.to_pylist():
        assert extract_clean_page(row["html"]) == clean_text(row["text"]), row["url"]
