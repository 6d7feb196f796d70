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


def segment_sums(vals, first):
    """Segment sums of a sorted stream, valid at every in-segment position.

    ``first`` marks segment starts.  Returns the running sum of the current
    segment at each position (so segment totals are read at segment-last
    records).  Unlike a global-cumsum-minus-base formulation, every
    subtraction here is ROW-LOCAL: at ~2M f32 records a global inclusive
    cumsum reaches ~1e5 magnitude and cancelling it against a propagated
    base loses ~0.01-0.03 absolute — comparable to one record's value.
    Rounding error in this form scales with the SEGMENT magnitude instead.

    CONTRACT: ``vals`` must be NON-NEGATIVE.  The in-row segment base is
    propagated with a cumulative MAX over exclusive prefix sums, which picks
    the most recent base only while the prefix sums are non-decreasing — a
    negative value anywhere in a 1024-wide row corrupts every later segment
    in that row (this bit the capped per-visit TSDF seed path, which now
    scatters signed seeds at segment-last positions instead).

    Decomposition per [rows, 1024] block: in-row cumsum ``c`` + in-row base
    propagation give in-row-started segment sums; a (value, reset) segmented
    combine over the per-row open-segment tails provides the carry for
    segments spanning row boundaries.
    """
    lowest = jnp.asarray(-3.0e38, vals.dtype)
    y, n = _pad_rows(vals, jnp.zeros((), vals.dtype))
    f, _ = _pad_rows(first, False)
    rows = y.shape[0]

    # In-row inclusive cumsum (local magnitude).
    c = y
    shift = 1
    while shift < _C:
        c = c + jnp.pad(c, ((0, 0), (shift, 0)))[:, :_C]
        shift *= 2
    # In-row base: exclusive cumsum at the most recent segment start.
    base = jnp.where(f, c - y, lowest)
    started = f
    shift = 1
    while shift < _C:
        base = jnp.maximum(base, jnp.pad(base, ((0, 0), (shift, 0)), constant_values=lowest)[:, :_C])
        started = started | jnp.pad(started, ((0, 0), (shift, 0)))[:, :_C]
        shift *= 2
    local = c - base  # valid where ``started``

    # Per-row open-segment tail and carry recursion:
    #   carry_j = any_start_j ? tail_local_j : carry_{j-1} + rowsum_j
    # computed as a segmented (value, reset) combine over rows.
    any_start = jnp.any(f, axis=1)
    rowsum = c[:, -1]
    tail = jnp.where(any_start, local[:, -1], rowsum)
    v, r = tail, any_start
    shift = 1
    while shift < rows:
        pv = jnp.pad(v, (shift, 0))[:rows]
        pr = jnp.pad(r, (shift, 0))[:rows]
        v = jnp.where(r, v, pv + v)
        r = r | pr
        shift *= 2
    carry_prev = jnp.concatenate([jnp.zeros((1,), vals.dtype), v[:-1]])

    out = jnp.where(started, local, carry_prev[:, None] + c)
    return out.reshape(-1)[:n]


def segment_compose_shift_clamp(c, lo, hi, first):
    """Segmented composition of shift-then-clamp maps x -> clamp(x+c, lo, hi).

    Monotone saturating shifts are closed under composition:
      (f2 . f1)(x) = clamp(x + (c1+c2), max(lo2, lo1+c2), min(hi2, hi1+c2))
    so a segment's whole recursion folds into one (C, LO, HI) triple — the
    mechanism that makes the per-visit-truncating TSDF update (reference
    ohm/VoxelTsdfCompute.h calculateTsdf, applied per visit) computable as a
    data-parallel scan instead of a sequential per-voxel loop.

    Returns (C, LO, HI) of the composed map at every position (composition
    of all maps since the segment start, inclusive); read at segment lasts
    and apply as min(max(x0 + C, LO), HI).
    """
    BIG = jnp.float32(3.0e38)

    def combine(l, r):
        # Exact composite of r . l (l applied first):
        #   z = clamp(x + C, lo1+c2, hi1+c2);  out = clamp(z, lo2, hi2)
        # gives LO = max(lo1+c2, lo2) and HI = min(max(hi1+c2, lo2), hi2).
        # The inner max against lo2 matters when l saturates BELOW r's
        # floor (hi1+c2 < lo2): the composite is then the constant lo2.
        # Evaluation order min(max(x+C, LO), HI) keeps degenerate LO > HI
        # maps (constants) exact under further composition.
        c1, lo1, hi1 = l
        c2, lo2, hi2 = r
        return (c1 + c2,
                jnp.maximum(lo1 + c2, lo2),
                jnp.minimum(jnp.maximum(hi1 + c2, lo2), hi2))

    cv, n = _pad_rows(c, jnp.float32(0))
    lov, _ = _pad_rows(lo, -BIG)
    hiv, _ = _pad_rows(hi, BIG)
    f, _ = _pad_rows(first, False)
    rows = cv.shape[0]

    vals = (cv, lov, hiv)
    started = f
    shift = 1
    while shift < _C:
        pv = tuple(jnp.pad(x, ((0, 0), (shift, 0)),
                           constant_values=cval)[:, :_C]
                   for x, cval in zip(vals, (0.0, -BIG, BIG)))
        pf = jnp.pad(started, ((0, 0), (shift, 0)))[:, :_C]
        comp = combine(pv, vals)
        vals = tuple(jnp.where(started, vals[i], comp[i]) for i in range(3))
        started = started | pf
        shift *= 2
    # NOTE on the masking above: an element that has already absorbed a
    # segment start keeps its value (everything left of the start is in a
    # different segment); otherwise it composes with the prefix `shift` away.
    # `started` here means "a segment start lies within the current prefix
    # window" — the standard Hillis-Steele segmented-scan recurrence.

    # Inter-row carry over open-segment tails.
    any_start = jnp.any(f, axis=1)
    tail = tuple(v[:, -1] for v in vals)
    tv, tr = tail, any_start
    shift = 1
    while shift < rows:
        pv = tuple(jnp.pad(x, (shift, 0), constant_values=cval)[:rows]
                   for x, cval in zip(tv, (0.0, -BIG, BIG)))
        pr = jnp.pad(tr, (shift, 0))[:rows]
        comp = combine(pv, tv)
        tv = tuple(jnp.where(tr, tv[i], comp[i]) for i in range(3))
        tr = tr | pr
        shift *= 2
    carry = tuple(jnp.concatenate([jnp.full((1,), cval, jnp.float32), x[:-1]])
                  for x, cval in zip(tv, (0.0, -BIG, BIG)))

    # Rows whose prefix has no start compose the carry in front.
    started_row = started  # per element: start seen in-row at-or-before
    comp = combine(tuple(x[:, None] for x in carry), vals)
    out = tuple(jnp.where(started_row, vals[i], comp[i]) for i in range(3))
    return tuple(x.reshape(-1)[:n] for x in out)


def segment_compose_affine_clamp(a, b, lo, hi, first):
    """Segmented composition of monotone affine+clamp maps
    x -> clamp(a*x + b, lo, hi), a >= 0.

    Generalises segment_compose_shift_clamp to slopes != 1 — needed by the
    per-visit TSDF blend, whose per-visit map d -> (d*w + sdf*u)/(w+u) has
    slope w/(w+u) (reference ohm/VoxelTsdfCompute.h:122-137).  The family is
    closed under composition:
      (f2 . f1)(x) = clamp(a2*a1*x + a2*b1 + b2,
                           clamp(a2*lo1 + b2, lo2, hi2),
                           clamp(a2*hi1 + b2, lo2, hi2))
    (outer clamp bounds evaluated min(max(., lo2), hi2) so degenerate
    constant maps stay exact under further composition).

    Returns (A, B, LO, HI) of the composed map at every position (all maps
    since the segment start, inclusive); read at segment lasts and apply as
    min(max(A*x0 + B, LO), HI).
    """
    BIG = jnp.float32(3.0e38)

    def combine(l, r):
        a1, b1, lo1, hi1 = l
        a2, b2, lo2, hi2 = r
        return (a1 * a2,
                a2 * b1 + b2,
                jnp.minimum(jnp.maximum(a2 * lo1 + b2, lo2), hi2),
                jnp.minimum(jnp.maximum(a2 * hi1 + b2, lo2), hi2))

    idents = (1.0, 0.0, -BIG, BIG)
    av, n = _pad_rows(a, idents[0])
    bv, _ = _pad_rows(b, idents[1])
    lov, _ = _pad_rows(lo, idents[2])
    hiv, _ = _pad_rows(hi, idents[3])
    f, _ = _pad_rows(first, False)
    rows = av.shape[0]

    vals = (av, bv, lov, hiv)
    started = f
    shift = 1
    while shift < _C:
        pv = tuple(jnp.pad(x, ((0, 0), (shift, 0)),
                           constant_values=cval)[:, :_C]
                   for x, cval in zip(vals, idents))
        pf = jnp.pad(started, ((0, 0), (shift, 0)))[:, :_C]
        comp = combine(pv, vals)
        vals = tuple(jnp.where(started, vals[i], comp[i]) for i in range(4))
        started = started | pf
        shift *= 2

    # Inter-row carry over open-segment tails.
    any_start = jnp.any(f, axis=1)
    tv = tuple(v[:, -1] for v in vals)
    tr = any_start
    shift = 1
    while shift < rows:
        pv = tuple(jnp.pad(x, (shift, 0), constant_values=cval)[:rows]
                   for x, cval in zip(tv, idents))
        pr = jnp.pad(tr, (shift, 0))[:rows]
        comp = combine(pv, tv)
        tv = tuple(jnp.where(tr, tv[i], comp[i]) for i in range(4))
        tr = tr | pr
        shift *= 2
    carry = tuple(jnp.concatenate([jnp.full((1,), cval, jnp.float32), x[:-1]])
                  for x, cval in zip(tv, idents))

    comp = combine(tuple(x[:, None] for x in carry), vals)
    out = tuple(jnp.where(started, vals[i], comp[i]) for i in range(4))
    return tuple(x.reshape(-1)[:n] for x in out)
