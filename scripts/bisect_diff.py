"""Bisect the round-2 hardware-differential regression (VERDICT weak #2).

Reproduces bench.py's hardware_check scene on the CPU backend and classifies
every mismatch: batch-vs-sequential clamp divergence (expected, bounded) vs a
path defect.  Run with JAX_PLATFORMS pinned to cpu to take hardware numerics
out of the picture; on the real chip via bench.py for the hardware leg.
"""

import os
import sys

os.environ.setdefault("OHM_RAYFLOW", os.environ.get("OHM_RAYFLOW", "1"))

import numpy as np
import jax

if os.environ.get("OHM_BISECT_CPU", "1") != "0":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import box_scene_rays  # noqa: E402

from ohm_tpu.core.map import OccupancyMap, MapFlag  # noqa: E402
from ohm_tpu.core.layout import OCCUPANCY_LAYER  # noqa: E402
from ohm_tpu.mapping.tpu_map import TpuRayMapper  # noqa: E402
from ohm_tpu.oracle.occupancy import RayMapperOccupancy  # noqa: E402


def batch_reference(map_obj, rays):
    """f64 batch-semantics reference: per-voxel hit/miss counts from the
    oracle's exact DDA, then ONE accumulate + one-sided clamp per voxel —
    the semantics the device pipeline implements (ops.integrate
    _apply_occupancy_dense)."""
    from ohm_tpu.oracle import linewalk
    from ohm_tpu.core import keys as keymath

    rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
    starts, ends = rays[0::2], rays[1::2]
    if map_obj.ray_filter is not None:
        starts, ends, _, accept = map_obj.ray_filter(starts, ends)
        starts, ends = starts[accept], ends[accept]
    dims = map_obj.region_voxel_dims
    counts = {}  # abs voxel tuple -> [n_hit, n_miss]
    for s, e in zip(starts, ends):
        visited = []

        def visit(abs_key, marker, enter_r, exit_r):
            visited.append(tuple(int(v) for v in np.ravel(abs_key)))
            return True

        linewalk.walk_segment_keys(map_obj, s, e, visit,
                                   linewalk.EXCLUDE_END_VOXEL)
        # walk visits exclude the end voxel; end voxel gets the hit.
        for v in visited:
            counts.setdefault(v, [0, 0])[1] += 1
        r1, l1 = map_obj.voxel_key(e[None, :])
        end_abs = tuple(int(v) for v in keymath.key_to_abs(r1, l1, dims)[0])
        counts.setdefault(end_abs, [0, 0])[0] += 1

    hit = np.float32(map_obj.hit_value)
    miss = np.float32(map_obj.miss_value)
    out = {}
    for v, (nh, nm) in counts.items():
        total = nh * float(hit) + nm * float(miss)
        value = total
        if total > 0:
            value = min(value, map_obj.max_voxel_value)
        if total < 0:
            value = max(value, map_obj.min_voxel_value)
        out[v] = value
    return out


def map_values(m):
    vals = {}
    dims = m.region_voxel_dims
    li = m.layer_index(OCCUPANCY_LAYER)
    for key in m.chunks:
        occ = m.region(key).layers[li][OCCUPANCY_LAYER]
        finite = np.where(~np.isinf(occ))[0]
        for idx in finite:
            lz, rem = divmod(int(idx), dims[0] * dims[1])
            ly, lx = divmod(rem, dims[0])
            av = (key[0] * dims[0] + lx, key[1] * dims[1] + ly, key[2] * dims[2] + lz)
            vals[av] = float(occ[idx])
    return vals


def main():
    n_rays = int(os.environ.get("OHM_BISECT_RAYS", 1024))
    rng = np.random.default_rng(2024)
    rays = box_scene_rays(n_rays, rng)

    dev_map = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mapper = TpuRayMapper(dev_map, capacity=512, validate=True)
    mapper.integrate_rays(rays)
    mapper.sync_voxels()
    print(f"path: rayflow={mapper.rayflow} platform={jax.devices()[0].platform}")

    cpu_map = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    RayMapperOccupancy(cpu_map).integrate_rays(rays)

    dev_vals = map_values(dev_map)
    seq_vals = map_values(cpu_map)
    bat_vals = batch_reference(OccupancyMap(resolution=0.1, flags=MapFlag.NONE), rays)

    print(f"device observed {len(dev_vals)}, sequential oracle {len(seq_vals)}, "
          f"batch reference {len(bat_vals)}")

    def compare(a, b, name, tol=1e-4):
        keys = set(a) | set(b)
        diffs = []
        miss_a = miss_b = 0
        for k in keys:
            if k not in a:
                miss_a += 1
                continue
            if k not in b:
                miss_b += 1
                continue
            d = abs(a[k] - b[k])
            if d > tol:
                diffs.append((d, k, a[k], b[k]))
        diffs.sort(reverse=True)
        print(f"[{name}] compared {len(keys)}; only-in-right {miss_a}, only-in-left {miss_b}, "
              f"mismatches>{tol}: {len(diffs)}, worst {diffs[0][0] if diffs else 0.0:.6g}")
        for d, k, va, vb in diffs[:8]:
            print(f"    voxel {k}: left={va:.6f} right={vb:.6f} diff={d:.6f}")
        return diffs

    compare(dev_vals, seq_vals, "device vs sequential-oracle")
    compare(dev_vals, bat_vals, "device vs batch-reference", tol=1e-4)
    compare(bat_vals, seq_vals, "batch-reference vs sequential-oracle")


if __name__ == "__main__":
    main()
