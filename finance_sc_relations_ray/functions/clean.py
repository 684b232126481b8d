"""Text cleaning — THE byte-identity invariant.

The reference cleans every sentence with
``re.sub('[-[\\] ]+', ' ', x).strip()`` (reference
src/utils/data_clean.py:5-6, composed through ``clean_pipe`` at :9-15).
Our engine must produce byte-identical cleaned text per url
(BASELINE.json input_hint), so the regex and strip semantics are locked
here and tested for byte equality in tests/test_clean.py.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# Character class: '-', '[', ']', ' ' — one or more collapsed to one space.
_SPECIAL = re.compile(r"[-\[\] ]+")


def clean_text(text: str) -> str:
    """Scalar reference-identical clean (rm_special_char semantics)."""
    return _SPECIAL.sub(" ", text).strip()


def clean_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized Arrow clean — same bytes as :func:`clean_text`.

    ``replace_substring_regex`` uses RE2; the pattern has no
    backreferences so semantics match Python ``re``. Python ``str.strip``
    strips all unicode whitespace; after the substitution the only
    whitespace the clean can introduce at the edges is ASCII spaces, but
    the ORIGINAL text may carry ``\\t/\\n`` edges, so we trim the full
    whitespace set to stay byte-identical.
    """
    out = pc.replace_substring_regex(arr, pattern=r"[-\[\] ]+", replacement=" ")
    return pc.utf8_trim(out, characters=" \t\n\r\x0b\x0c")
