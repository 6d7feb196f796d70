"""Differential tests for the MXU one-hot matmul deposit
(ops.deposit_pallas) against the unique-scatter + dense-sweep path it
replaces.  Runs the kernel in interpret mode on CPU; the compiled TPU
variant is covered by tests/test_tpu_hw.py and bench.py."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ohm_tpu.core.rayflags import RayFlag
from ohm_tpu.ops import deposit_pallas
from ohm_tpu.ops.integrate import (
    IntegrateConfig,
    _apply_occupancy_dense,
    sorted_hit_miss_counts,
)


def _cfg(**kw):
    base = dict(
        resolution=0.1, region_shift=3, capacity=16, max_steps=64,
        hit_value=0.85, miss_value=-0.15, occupancy_threshold=0.0,
        min_value=-100.0, max_value=250.0, scatter_pad=8192,
        pallas_deposit=2)
    base.update(kw)
    return IntegrateConfig(**base)


def _stream(cfg, n=6000, seed=0, hit_frac=0.1, sentinel_frac=0.05):
    rng = np.random.default_rng(seed)
    live = max(2, cfg.capacity * 2 // 3)
    slots = rng.integers(0, live, n)
    vox = rng.integers(0, cfg.voxels_per_region, n)
    flat = slots * cfg.voxels_per_region + vox
    # duplicate hot voxels to exercise counts > 1
    hot = rng.random(n) < 0.3
    flat[hot] = (slots[hot] * 7) % cfg.sentinel
    hit = (rng.random(n) < hit_frac).astype(np.int64)
    sent = rng.random(n) < sentinel_frac
    flat[sent] = cfg.sentinel
    hit[sent] = 0
    key = np.sort((flat << 1) | hit).astype(np.int32)
    return jnp.asarray(key)


def _arena(cfg, seed=1, zero=False):
    n = cfg.sentinel + 1 + cfg.scatter_pad
    n = -(-n // 512) * 512
    rng = np.random.default_rng(seed)
    unobs = np.float32(-0.0) if zero else np.float32(np.inf)
    occ = np.full(n, unobs, np.float32)
    seeded = rng.integers(0, cfg.sentinel, n // 8)
    occ[seeded] = rng.normal(0, 5, n // 8).astype(np.float32)
    return jnp.asarray(occ)


def _reference_apply(occ, key_s, cfg):
    ids_s, first, last, n_hit, n_miss = sorted_hit_miss_counts(key_s)
    new_occ, _, dropped = _apply_occupancy_dense(
        occ, ids_s, last, n_hit, n_miss, cfg)
    touched = jnp.sum((last & (ids_s != cfg.sentinel)).astype(jnp.int32))
    return new_occ, touched, dropped


FLAG_CASES = [
    0,
    int(RayFlag.EXCLUDE_FREE),
    int(RayFlag.EXCLUDE_OCCUPIED),
    int(RayFlag.EXCLUDE_UNOBSERVED),
    int(RayFlag.EXCLUDE_FREE | RayFlag.EXCLUDE_OCCUPIED),
]


@pytest.mark.parametrize("flags", FLAG_CASES)
def test_deposit_bit_parity_flags(flags):
    cfg = _cfg(ray_flags=flags)
    assert deposit_pallas.deposit_ok(cfg)
    key_s = _stream(cfg)
    occ = _arena(cfg)
    ref, ref_touched, _ = jax.jit(
        lambda o, k: _reference_apply(o, k, cfg))(occ, key_s)
    out, touched = jax.jit(
        lambda o, k: deposit_pallas.deposit_and_sweep(o, k, cfg, interpret=True)
    )(occ, key_s)
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    # Scratch tail differs (the scatter path zero-stamps dummy slots in its
    # pending plane only; values unchanged) — compare the full arena.
    assert np.array_equal(
        ref_np.view(np.uint32), out_np.view(np.uint32)), (
        np.nonzero(ref_np.view(np.uint32) != out_np.view(np.uint32))[0][:10])
    assert int(touched) == int(ref_touched)


def test_deposit_bit_parity_zero_unobserved_and_saturation():
    cfg = _cfg(zero_unobserved=True, saturation_min=-20.0, saturation_max=20.0)
    key_s = _stream(cfg, seed=3)
    occ = _arena(cfg, seed=4, zero=True)
    ref, ref_touched, _ = jax.jit(
        lambda o, k: _reference_apply(o, k, cfg))(occ, key_s)
    out, touched = jax.jit(
        lambda o, k: deposit_pallas.deposit_and_sweep(o, k, cfg, interpret=True)
    )(occ, key_s)
    assert np.array_equal(np.asarray(ref).view(np.uint32),
                          np.asarray(out).view(np.uint32))
    assert int(touched) == int(ref_touched)


def test_deposit_pads_unaligned_stream():
    cfg = _cfg()
    key_s = _stream(cfg, n=777)  # not a multiple of CHUNK
    occ = _arena(cfg)
    ref, ref_touched, _ = jax.jit(
        lambda o, k: _reference_apply(o, k, cfg))(occ, key_s)
    out, touched = deposit_pallas.deposit_and_sweep(
        occ, key_s, cfg, interpret=True)
    assert np.array_equal(np.asarray(ref).view(np.uint32),
                          np.asarray(out).view(np.uint32))
    assert int(touched) == int(ref_touched)


def test_deposit_ok_gate():
    assert not deposit_pallas.deposit_ok(_cfg(region_shift=2))  # V=64
    assert deposit_pallas.deposit_ok(_cfg(region_shift=4))      # V=4096


def test_mapper_end_to_end_pallas_vs_scatter(monkeypatch):
    """TpuRayMapper with OHM_PALLAS=2 (interpret kernel) produces a
    bit-identical map to the scatter path on a small scene."""
    from ohm_tpu import OccupancyMap
    from ohm_tpu.mapping.tpu_map import TpuRayMapper

    rng = np.random.default_rng(11)
    n = 400
    origins = np.zeros((n, 3))
    samples = rng.uniform(-3, 3, (n, 3))
    rays = np.empty((2 * n, 3))
    rays[0::2] = origins
    rays[1::2] = samples

    def run(env):
        monkeypatch.setenv("OHM_PALLAS", env)
        m = OccupancyMap(resolution=0.25, region_voxel_dims=8)
        mapper = TpuRayMapper(m, capacity=64, validate=True)
        mapper.integrate_rays(rays)
        mapper.sync_voxels()
        occ = np.asarray(mapper.arena.arrays["occupancy"])
        return occ

    occ_scatter = run("0")
    occ_pallas = run("2")
    assert np.array_equal(occ_scatter.view(np.uint32),
                          occ_pallas.view(np.uint32))


def test_gather_plane_matches_xla_gather():
    cfg = _cfg(capacity=24)
    rng = np.random.default_rng(9)
    t = -(-(cfg.sentinel + 1 + cfg.scatter_pad) // 512) * 512
    plane = (rng.random(t) < 0.3).astype(np.int8)
    n = 3000
    flat = np.sort(rng.integers(0, cfg.sentinel, n))
    # Append sentinel records (sorted stream tail).
    flat = np.concatenate([flat, np.full(50, cfg.sentinel)]).astype(np.int32)
    out = deposit_pallas.gather_plane(
        jnp.asarray(plane), jnp.asarray(flat), cfg, interpret=True)
    expect = np.where(flat < cfg.sentinel, plane[np.minimum(flat, t - 1)], 0)
    assert np.array_equal(np.asarray(out), expect.astype(np.int32))


def test_gather_planes_f32_exact():
    cfg = _cfg(capacity=24)
    rng = np.random.default_rng(13)
    t = -(-(cfg.sentinel + 1 + cfg.scatter_pad) // 512) * 512
    w = rng.normal(0, 3, t).astype(np.float32)
    d = rng.normal(0, 0.1, t).astype(np.float32)
    n = 2500
    flat = np.concatenate([np.sort(rng.integers(0, cfg.sentinel, n)),
                           np.full(40, cfg.sentinel)]).astype(np.int32)
    gw, gd = deposit_pallas.gather_planes_f32(
        (jnp.asarray(w), jnp.asarray(d)), jnp.asarray(flat), cfg,
        interpret=True)
    real = flat < cfg.sentinel
    expect_w = np.where(real, w[np.minimum(flat, t - 1)], 0.0)
    expect_d = np.where(real, d[np.minimum(flat, t - 1)], 0.0)
    assert np.array_equal(np.asarray(gw), expect_w.astype(np.float32))
    assert np.array_equal(np.asarray(gd), expect_d.astype(np.float32))


def test_tsdf_set_deposit_exact():
    cfg = _cfg(capacity=24)
    rng = np.random.default_rng(17)
    t = -(-(cfg.sentinel + 1 + cfg.scatter_pad) // 512) * 512
    w0 = np.abs(rng.normal(0, 3, t)).astype(np.float32)
    d0 = rng.normal(0, 0.1, t).astype(np.float32)
    n = 4000
    flat = np.sort(rng.integers(0, cfg.sentinel, n)).astype(np.int32)
    # exactly one depositing record per voxel: the run-last
    last = np.concatenate([flat[1:] != flat[:-1], [True]])
    upd = last & (rng.random(n) < 0.8)
    wv = np.where(upd, np.abs(rng.normal(1, 0.5, n)) + 1e-4, 0.0).astype(np.float32)
    dv = np.where(upd, rng.normal(0, 0.1, n), 0.0).astype(np.float32)
    wout, dout = deposit_pallas.tsdf_set_deposit(
        jnp.asarray(w0), jnp.asarray(d0), jnp.asarray(flat),
        jnp.asarray(wv), jnp.asarray(dv), cfg, interpret=True)
    exp_w, exp_d = w0.copy(), d0.copy()
    exp_w[flat[upd]] = wv[upd]
    exp_d[flat[upd]] = dv[upd]
    assert np.array_equal(np.asarray(wout), exp_w)
    assert np.array_equal(np.asarray(dout), exp_d)


def test_tsdf_end_to_end_pallas_vs_scatter(monkeypatch):
    """TpuTsdfMap per-visit with the gather + set-deposit kernels matches
    the scatter path (allclose: the kernel seeds every record exactly while
    the scatter path's -0.0/+0.0 normalisation can differ in zero signs)."""
    from ohm_tpu import OccupancyMap
    from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
    from ohm_tpu.oracle.tsdf import TsdfOptions

    rng = np.random.default_rng(23)
    n = 160
    origins = np.zeros((n, 3))
    samples = np.column_stack([
        np.full(n, 2.0) + rng.normal(0, 0.05, n),
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)])
    rays = np.empty((2 * n, 3))
    rays[0::2] = origins
    rays[1::2] = samples

    def run(env):
        monkeypatch.setenv("OHM_PALLAS", env)
        m = OccupancyMap(resolution=0.25, region_voxel_dims=8)
        mapper = TpuTsdfMap(m, TsdfOptions(default_truncation_distance=0.3),
                            capacity=32, validate=True)
        for i in range(0, 2 * n, 160):
            mapper.integrate_rays(rays[i:i + 160])
        mapper.sync_voxels()
        return (np.asarray(mapper.arena.arrays["tsdf_weight"]),
                np.asarray(mapper.arena.arrays["tsdf_distance"]))

    w_a, d_a = run("0")
    w_b, d_b = run("2")
    np.testing.assert_allclose(w_a, w_b, rtol=0, atol=0)
    np.testing.assert_allclose(d_a, d_b, rtol=0, atol=0)


def test_ndt_deposit_sparse_delta_matches_dense_plane():
    """The sparse (keys, vals) miss-delta stream deposits bit-identically to
    the dense arena-shaped delta plane it replaces."""
    cfg = _cfg()
    key_s = _stream(cfg, seed=5)
    occ = _arena(cfg, seed=6)
    t = occ.shape[0]
    rng = np.random.default_rng(21)
    ids = np.asarray(key_s) >> 1
    real = ids[ids < cfg.sentinel]
    dk = np.unique(rng.choice(real, 200))
    dv = rng.normal(0, 0.5, dk.shape[0]).astype(np.float32)
    plane = np.zeros(t, np.float32)
    plane[dk] = dv
    # Sparse stream: duplicate zero-valued records interleave (the real
    # pipeline's non-last segment records), sentinels pad the tail.
    sk = np.sort(np.concatenate([dk, dk[: len(dk) // 2],
                                 np.full(17, cfg.sentinel)])).astype(np.int32)
    sv = np.zeros(sk.shape[0], np.float32)
    # exactly one nonzero record per voxel: the run-LAST
    last = np.concatenate([sk[1:] != sk[:-1], [True]]) & (sk < cfg.sentinel)
    lut = {int(k): float(v) for k, v in zip(dk, dv)}
    sv[last] = [lut[int(k)] for k in sk[last]]
    end_keys = _stream(cfg, n=500, seed=8)

    dense, t_dense = deposit_pallas.deposit_and_sweep_ndt(
        occ, key_s, jnp.asarray(plane), cfg, interpret=True,
        bounds_key=key_s, key2_sorted=end_keys)
    sparse, t_sparse = deposit_pallas.deposit_and_sweep_ndt(
        occ, key_s, (jnp.asarray(sk << 1), jnp.asarray(sv)), cfg,
        interpret=True, bounds_key=key_s, key2_sorted=end_keys)
    assert np.array_equal(np.asarray(dense).view(np.uint32),
                          np.asarray(sparse).view(np.uint32))
    assert int(t_dense) == int(t_sparse)


def test_ndt_end_to_end_pallas_vs_scatter(monkeypatch):
    """TpuNdtMap with the NDT-mode kernel (std counts + miss-delta plane,
    fused NDT sweep) is bit-identical to the scatter + dense-apply path."""
    from ohm_tpu import OccupancyMap
    from ohm_tpu.mapping.ndt_map import TpuNdtMap
    from ohm_tpu.oracle.ndt import NdtParams

    rng = np.random.default_rng(7)
    n = 160
    origins = np.zeros((n, 3))
    # Repeated wall hits so Gaussians form and the miss phase engages.
    samples = np.column_stack([
        np.full(n, 2.0) + rng.normal(0, 0.02, n),
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)])
    rays = np.empty((2 * n, 3))
    rays[0::2] = origins
    rays[1::2] = samples

    def run(env):
        monkeypatch.setenv("OHM_PALLAS", env)
        m = OccupancyMap(resolution=0.25, region_voxel_dims=8)
        mapper = TpuNdtMap(m, NdtParams(), capacity=32, validate=True)
        for i in range(0, 2 * n, 160):
            mapper.integrate_rays(rays[i:i + 160])
        mapper.sync_voxels()
        return (np.asarray(mapper.arena.arrays["occupancy"]),
                np.asarray(mapper.arena.arrays["cov"]))

    occ_a, cov_a = run("0")
    occ_b, cov_b = run("2")
    assert np.array_equal(occ_a.view(np.uint32), occ_b.view(np.uint32))
    assert np.array_equal(cov_a.view(np.uint32), cov_b.view(np.uint32))
