"""FP helpers: rounding that matches DuckDB's ROUND (half away from zero).

Arrow's pc.round defaults to half-to-even and numpy.round is half-to-even too;
DuckDB (like C std::round) rounds half away from zero.  Every value compared
against a SQL oracle must round the DuckDB way.
"""

from __future__ import annotations

import numpy as np
import pyarrow.compute as pc


def pc_round_away(arr, ndigits: int):
    return pc.round(arr, ndigits=ndigits, round_mode="half_towards_infinity")


def np_round_away(x: np.ndarray, ndigits: int) -> np.ndarray:
    f = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f
