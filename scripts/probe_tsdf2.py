"""Per-visit TSDF primitive costs on a REALISTIC record stream.

Pulls actual sorted/unsorted id streams from an expand run on the box
scene, then times the building blocks the per-visit path adds over the
batch-blend path (ops/integrate_tsdf.py):

  sort1   1-key 3-operand global sort        (batch-blend's sort)
  sort2   2-key 4-operand global sort        (per-visit's sort)
  sort2w  1-key 3-operand sort on a PACKED f64-width key — feasibility probe
  scans   segment_sums x2 + segment_compose_affine_clamp (per-visit extras)
  depo    1-key 3-operand deposit-compaction sort + 2 windowed scatters

Run solo:  python -u scripts/probe_tsdf2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import bench as benchmod
from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.ops import blocked
from ohm_tpu.ops.integrate import expand_records_jit


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def time_op(label, fn, args, reps=3, inner=10):
    jitted = jax.jit(fn)
    out = jitted(*args)
    fence(out[0] if isinstance(out, (tuple, list)) else out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = jitted(*args)
        fence(out[0] if isinstance(out, (tuple, list)) else out)
        dt = (time.perf_counter() - t0) / inner
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best*1e3:7.2f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(2024)
    n_rays = 8192
    batches = [benchmod.box_scene_rays(n_rays, rng) for _ in range(6)]
    print(f"devices: {jax.devices()}", flush=True)

    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=512)
    mapper.prime_caps(batches)
    for b in batches:
        mapper.integrate_rays(b)
    fence(mapper.arena.arrays["occupancy"])

    out = mapper._rayflow_setup_host(batches[-1], None, None, 0)
    assert out is not None
    wire, cfg, nr = out
    records, _ = expand_records_jit({"rayw": jnp.asarray(wire)}, cfg)
    ids = records["key"] >> 1  # unsorted realistic id stream (with sentinels)
    n_rec = int(ids.shape[0])
    print(f"n_rec={n_rec} sentinel={cfg.sentinel}", flush=True)

    ridx = jnp.asarray(rng.integers(0, n_rays, n_rec), jnp.int32)
    w = jnp.asarray(rng.random(n_rec), jnp.float32)
    wsdf = jnp.asarray(rng.standard_normal(n_rec), jnp.float32)
    fence(wsdf)

    t1 = time_op("sort1  1-key 3-op  ",
                 lambda i, a, b: jax.lax.sort((i, a, b), num_keys=1),
                 (ids, w, wsdf))
    t2 = time_op("sort2  2-key 4-op  ",
                 lambda i, r, a, b: jax.lax.sort((i, r, a, b), num_keys=2),
                 (ids, ridx, w, wsdf))
    # Packed wide key: ids fit 24 bits (cap 512), ridx 13 -> 37 bits; f64 is
    # unavailable on TPU, i64 sorts lower as two limbs — probe the cost.
    packed = (ids.astype(jnp.int64) << 13) | ridx.astype(jnp.int64)
    fence(packed)
    t2w = time_op("sort2w i64 3-op    ",
                  lambda i, a, b: jax.lax.sort((i, a, b), num_keys=1),
                  (packed, w, wsdf))

    ids_s, _, w_s, wsdf_s = jax.lax.sort((ids, ridx, w, wsdf), num_keys=2)
    first = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
    fence(first)

    def scans(w_s, wsdf_s, first):
        s_w = blocked.segment_sums(w_s, first)
        w0 = blocked.segment_sums(jnp.where(first, 1.0, 0.0), first)
        wc_prev = jnp.minimum(w0 + s_w - w_s, jnp.float32(1000.0))
        denom = jnp.maximum(wc_prev + w_s, 1.0)
        A, Bm, LO, HI = blocked.segment_compose_affine_clamp(
            wc_prev / denom, wsdf_s / denom,
            jnp.full_like(w_s, -0.2), jnp.full_like(w_s, 0.2), first)
        return A * 1.0 + Bm + LO + HI

    time_op("scans  segsumx2+clamp", scans, (w_s, wsdf_s, first))

    big = jnp.int32(2**31 - 2)
    plane = jnp.zeros(mapper.arena.arrays["occupancy"].shape, jnp.float32)

    def depo(ids_s, w_s, wsdf_s, plane):
        last = jnp.concatenate([ids_s[1:] != ids_s[:-1], jnp.array([True])])
        key = jnp.where(last & (ids_s != cfg.sentinel), ids_s, big)
        k, a, b = jax.lax.sort((key, w_s, wsdf_s), num_keys=1)
        cap = 262144
        k, a, b = k[:cap], a[:cap], b[:cap]
        good = k != big
        tgt = jnp.where(good, k, plane.shape[0] - 1)
        p1 = plane.at[tgt].set(jnp.where(good, a, 0.0), indices_are_sorted=True,
                               unique_indices=False, mode="promise_in_bounds")
        p2 = plane.at[tgt].set(jnp.where(good, b, 0.0), indices_are_sorted=True,
                               unique_indices=False, mode="promise_in_bounds")
        return p1, p2

    time_op("depo   sort+2 scatter", depo, (ids_s, w_s, wsdf_s, plane))

    print(f"=> 2-key 4-op sort costs {t2*1e3:.2f} vs 1-key {t1*1e3:.2f} "
          f"(delta {1e3*(t2-t1):.2f} ms); i64 pack {t2w*1e3:.2f}", flush=True)


if __name__ == "__main__":
    main()
