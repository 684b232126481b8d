"""DuckDB-compatible rounding: half away from zero (numpy/pandas round
half-to-even, which drifts one ulp from SQL round() on exact halves —
e.g. round(52659.425, 2))."""

from __future__ import annotations

import numpy as np


def round_half_away(x, ndigits: int):
    """Element-wise round-half-away-from-zero, matching DuckDB round()."""
    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** ndigits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
