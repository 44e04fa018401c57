"""Rounding that matches the DuckDB oracle.

DuckDB ROUND() is half-away-from-zero; pyarrow/np default to half-to-even.
Every float column that the driver value-hashes must round identically on
both sides, so all query code uses these helpers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def round_col(col, ndigits: int):
    """Arrow column round, half away from zero (matches SQL ROUND)."""
    return pc.round(col, ndigits=ndigits, round_mode="half_towards_infinity")


def round_np(x: np.ndarray, ndigits: int) -> np.ndarray:
    """Numpy round, half away from zero."""
    f = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def round_scalar(x: float, ndigits: int) -> float:
    """Scalar round, half away from zero (Python round() is half-to-even
    and would diverge from SQL ROUND on exact halves)."""
    f = 10.0 ** ndigits
    return float(np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f)
