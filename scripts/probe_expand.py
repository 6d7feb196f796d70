"""Attribute the expand phase's device time across its internal stages:
rank-based walk, slot resolution, and the group-compaction row sort.

Stages (each timed over resident wires, readback-fenced):
  A) full expand_records_jit          (walk + resolve + row sort)
  B) unpack + walk only               (outputs consumed by reductions)
  C) unpack + walk + slot resolve     (outputs consumed by reductions)
B and C under-count HBM materialisation slightly (reduced outputs fuse);
they bound the walk/resolve split, and A-C bounds the row sort.

Run solo:  python -u scripts/probe_expand.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp

import bench as benchmod
from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.ops import integrate as I
from ohm_tpu.ops.ddawalk import walk_rays_unordered


def fence(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


@functools.partial(jax.jit, static_argnames=("cfg", "with_resolve"))
def walk_only(batch, cfg, with_resolve=False):
    b = I._unpack_batch(batch, cfg)
    walk = walk_rays_unordered(
        b["start_abs"], b["end_abs"], b["start_frac"],
        b["direction"], b["length"], cfg.resolution, cfg.max_steps)
    outs = [jnp.sum(walk["exits"]), jnp.sum(walk["enters"]),
            jnp.sum(walk["valid"].astype(jnp.int32)),
            jnp.sum(walk["voxels"]), jnp.sum(walk["end_enter"])]
    if with_resolve:
        rec_valid = walk["valid"] & b["valid"][:, None]
        walk_flat, walk_missed = I._resolve_slots(
            walk["voxels"], b.get("rmin"), b.get("corner_slots"), cfg,
            tcand=b.get("tcand"), gmeta=b.get("gmeta"))
        walk_flat = jnp.where(rec_valid, walk_flat, cfg.sentinel)
        end_flat, _ = I._resolve_slots(
            b["end_abs"], b.get("rmin"), b.get("corner_slots"), cfg,
            tcand=b.get("tcand"), gmeta=b.get("gmeta"))
        outs += [jnp.sum(walk_flat), jnp.sum(end_flat),
                 jnp.sum(walk_missed.astype(jnp.int32))]
    return outs


def main():
    rng = np.random.default_rng(2024)
    n_rays, n_b = 8192, 20
    batches = [benchmod.box_scene_rays(n_rays, rng) for _ in range(n_b)]
    print(f"devices: {jax.devices()}", flush=True)

    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m, capacity=512)
    mapper.prime_caps(batches)
    for i in range(6):
        mapper.integrate_rays(batches[i])
    fence(mapper.arena.arrays["occupancy"])

    prepped = []
    for b in batches:
        out = mapper._rayflow_setup_host(b, None, None, 0)
        assert out is not None
        prepped.append(out)
    cfg = prepped[-1][1]
    prepped = [(w, cfg, nr) for w, _, nr in prepped]
    devw = [jnp.asarray(w) for w, _, _ in prepped]
    fence(devw[-1][-1:])
    print(f"cfg: S={cfg.max_steps} G={cfg.group_size} group_cap={cfg.group_cap} "
          f"walk_cap={cfg.walk_cap} unordered={cfg.unordered_walk}", flush=True)

    def run(label, fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            last = None
            for dw in devw:
                last = fn({"rayw": dw})
            fence(last[0] if isinstance(last, (list, tuple)) else last)
            dt = (time.perf_counter() - t0) / n_b
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best*1e3:6.2f} ms/batch", flush=True)
        return best

    # Warm compiles.
    fence(walk_only({"rayw": devw[0]}, cfg)[0])
    fence(walk_only({"rayw": devw[0]}, cfg, True)[0])
    r, s = I.expand_records_jit({"rayw": devw[0]}, cfg)
    fence(r["key"])

    t_b = run("B walk only          ", lambda batch: walk_only(batch, cfg))
    t_c = run("C walk + resolve     ", lambda batch: walk_only(batch, cfg, True))
    t_a = run("A full expand        ",
              lambda batch: I.expand_records_jit(batch, cfg)[0]["key"])
    print(f"=> walk ~{t_b*1e3:.2f} ms, resolve ~{(t_c-t_b)*1e3:.2f} ms, "
          f"row sort + assembly ~{(t_a-t_c)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
