"""Stage-boundary schema validation (SURVEY.md §1.4: fixed
``pyarrow.Schema`` per stage, validated at boundaries — replacing the
reference's ad-hoc required-column set arithmetic,
src/stages/load_data.py:30-36).

Enabled by default in tests via the ``FSCR_VALIDATE_SCHEMAS`` env var;
zero-cost no-op otherwise (one env lookup at import).
"""

from __future__ import annotations

import os

import pyarrow as pa

VALIDATE = os.environ.get("FSCR_VALIDATE_SCHEMAS", "") not in ("", "0", "false")


class SchemaMismatch(AssertionError):
    pass


def check_schema(table: pa.Table, expected: pa.Schema, stage: str) -> pa.Table:
    """Assert ``table`` carries exactly the expected columns/types.
    Called at actor/stage outputs when validation is on."""
    if not VALIDATE:
        return table
    got = {f.name: f.type for f in table.schema}
    want = {f.name: f.type for f in expected}
    if got != want:
        missing = set(want) - set(got)
        extra = set(got) - set(want)
        wrong = {
            n: (str(got[n]), str(want[n]))
            for n in set(got) & set(want)
            if got[n] != want[n]
        }
        raise SchemaMismatch(
            f"stage {stage}: schema mismatch — missing={sorted(missing)} "
            f"extra={sorted(extra)} wrong_types={wrong}"
        )
    return table
