"""Half-away-from-zero rounding — the exact rounding DuckDB's round() uses.

Python's round() and np.round are banker's (half-to-even); DuckDB rounds
half away from zero, and ratio-valued outputs (stop ratios, jaccard) land on
exact .5 boundaries often enough to matter (e.g. 1/32 -> 0.03125). Every
value the driver compares against a SQL oracle is rounded with THIS helper
on the engine side so both sides compute floor(|x|*10^d + 0.5) in double.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 4):
    """Vectorized or scalar; matches DuckDB round(DOUBLE, d) bit-for-bit for
    inputs both sides computed identically."""
    scale = 10.0 ** decimals
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if np.isscalar(x) or arr.ndim == 0:
        return float(out)
    return out
