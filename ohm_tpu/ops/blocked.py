"""Blocked (2D-decomposed) cumulative ops: the TPU-fast segmented-reduce core.

``jax.lax.associative_scan`` costs ~5.5 ns/element on this toolchain (11 ms
for a 3-operand scan at 2M — half the round-1 apply-phase budget), because
its generic lowering materialises log-depth odd/even recursions.  A cumulative
max/sum decomposed as [rows, 1024]-blocked log-shifts inside rows plus a tiny
inter-row prefix runs at ~0.33 ns/element (0.67 ms at 2M, slope-measured on
the v5e chip; scripts/probe_apply7.py stage 4).

Used by the sort-reduce integrate pipeline to propagate segment-start
positions to segment ends:  after sorting voxel ids, per-voxel counts are
``pos - cummax(where(first, pos, -BIG)) + 1`` evaluated at segment-last
records — no scan, no scatter, no gather (reference analogue: the per-thread
sequential walk accumulation in ohmgpu/gpu/RegionUpdate.cl:403-470).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_C = 1024  # row width: 10 log-shift passes within rows


def _pad_rows(x, fill):
    n = x.shape[0]
    rows = -(-n // _C)
    padded = jnp.pad(x, (0, rows * _C - n), constant_values=fill)
    return padded.reshape(rows, _C), n


def cummax(x, lowest=None):
    """Inclusive cumulative max over a 1D array (any length), blocked.

    ``lowest`` is the identity element (defaults to the dtype's min for ints,
    -3e38 for floats; f32 +-inf constants pathologically slow-compile on this
    toolchain — see ops.ddawalk._BIG).
    """
    if lowest is None:
        if jnp.issubdtype(x.dtype, jnp.floating):
            lowest = jnp.asarray(-3.0e38, x.dtype)
        else:
            lowest = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    y, n = _pad_rows(x, lowest)
    shift = 1
    while shift < _C:
        y = jnp.maximum(y, jnp.pad(y, ((0, 0), (shift, 0)), constant_values=lowest)[:, :_C])
        shift *= 2
    rows = y.shape[0]
    r = y[:, -1]
    shift = 1
    while shift < rows:
        r = jnp.maximum(r, jnp.pad(r, (shift, 0), constant_values=lowest)[:rows])
        shift *= 2
    prefix = jnp.concatenate([jnp.full((1,), lowest, x.dtype), r[:-1]])
    return jnp.maximum(y, prefix[:, None]).reshape(-1)[:n]


def cumsum(x):
    """Inclusive cumulative sum over a 1D array (any length), blocked."""
    y, n = _pad_rows(x, jnp.zeros((), x.dtype))
    shift = 1
    while shift < _C:
        y = y + jnp.pad(y, ((0, 0), (shift, 0)))[:, :_C]
        shift *= 2
    rows = y.shape[0]
    r = y[:, -1]
    shift = 1
    while shift < rows:
        r = r + jnp.pad(r, (shift, 0))[:rows]
        shift *= 2
    prefix = r - y[:, -1]
    return (y + prefix[:, None]).reshape(-1)[:n]
