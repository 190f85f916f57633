"""Unit and time converters (reference climex_utils.py:20-37)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def date_to_float(dates: np.ndarray) -> np.ndarray:
    """datetime64[ns] -> float nanoseconds (reference climex_utils.py:20-21)."""
    return np.asarray(dates, dtype="datetime64[ns]").astype(float)


def float_to_date(floats) -> np.ndarray:
    """float nanoseconds -> datetime64[ns] (reference climex_utils.py:24-25)."""
    return np.array(floats, dtype="datetime64[ns]")


def kgm2s_to_mmday(data):
    """Precipitation kg/m^2/s -> mm/day (reference climex_utils.py:28-29)."""
    return data * (24 * 60 * 60)


def log_inv(data):
    """Inverse of log1p-style transform (reference climex_utils.py:32-33)."""
    return jnp.exp(data) - 1


def k_to_c(data):
    """Kelvin -> Celsius (reference climex_utils.py:36-37)."""
    return data - 273.15
