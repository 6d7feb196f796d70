"""Log-odds probability math.

Reference parity: ohm/MapProbability.h:20-36 — ``value = log(p / (1 - p))``,
``p = 1 - 1 / (1 + exp(value))``.  Values are stored in float32 in voxel
layers; the conversion here is done in the caller's dtype so the oracle can
run in float64 while device code runs float32.
"""

from __future__ import annotations

import numpy as np


def probability_to_value(probability):
    """Convert probability [0, 1] to a log-odds value."""
    p = np.asarray(probability)
    return np.log(p / (1.0 - p))


def value_to_probability(value):
    """Convert a log-odds value to a probability.

    -inf maps to 0; +inf maps to 1 (note: +inf is also the *unobserved*
    sentinel in occupancy layers — callers must treat it before converting).
    """
    v = np.asarray(value)
    return 1.0 - 1.0 / (1.0 + np.exp(v))


def unobserved_occupancy_value() -> float:
    """Sentinel marking a voxel never observed (reference: ohm/VoxelOccupancy.h:42-45)."""
    return float("inf")
