"""Rayflow (full-ray wire) differentials.

The rayflow path replaces host segmentation entirely: per-RAY records with
host-f64-quantised endpoints, device-side walking over the whole ray, and
slot resolution against per-ray candidate-region tables
(mapping.batch.prepare_rayflow, ops.integrate rayflow branch).  Occupancy
must match the segmented path bit-for-bit (same quantised endpoints -> same
visited voxel multiset); traversal must match the f64 oracle MORE closely
than the segmented path, whose per-segment walk drops the partial traversal
of each segment-boundary voxel (the reference walks full rays:
ohm/RayMapperOccupancy.cpp:171-183).
"""

import numpy as np
import pytest

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.core.layout import OCCUPANCY_LAYER, TRAVERSAL_LAYER
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.oracle.occupancy import RayMapperOccupancy


def _scene(n=128, rng=None):
    # Rays must cross region boundaries (region edge = 6.4 m at 0.2 m res)
    # so the segmented path's boundary-voxel traversal loss is observable.
    rng = rng or np.random.default_rng(5)
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t = np.min(np.where(dirs != 0, np.array([5.5, 5.5, 3.0]) / np.abs(dirs), np.inf), axis=1)
    rays = np.zeros((2 * n, 3))
    rays[1::2] = dirs * t[:, None]
    return rays


def _voxel_maps(m):
    oi = m.layer_index(OCCUPANCY_LAYER)
    ti = m.layer_index(TRAVERSAL_LAYER)
    occ, trav = {}, {}
    for key, chunk in m.chunks.items():
        o = chunk.layers[oi][OCCUPANCY_LAYER]
        t = chunk.layers[ti][TRAVERSAL_LAYER] if ti >= 0 else None
        for i in np.flatnonzero(np.isfinite(o)):
            occ[(key, int(i))] = float(o[i])
            if t is not None:
                trav[(key, int(i))] = float(t[i])
    return occ, trav


def test_rayflow_matches_segmented_and_oracle_traversal():
    rays = _scene()
    m_oracle = OccupancyMap(resolution=0.2, flags=MapFlag.TRAVERSAL)
    RayMapperOccupancy(m_oracle).integrate_rays(rays)
    occ_o, trav_o = _voxel_maps(m_oracle)

    results = {}
    for use_rf in (True, False):
        m = OccupancyMap(resolution=0.2, flags=MapFlag.TRAVERSAL)
        mp = TpuRayMapper(m, capacity=64, validate=True, rayflow=use_rf)
        if use_rf:
            mp.integrate_rays(rays)
            assert mp.stats["batches"] == 1
            # the rayflow path must actually have been taken
            assert getattr(mp, "_k_cache_rf", 0) >= 8
        else:
            mp.integrate_rays(rays)
        mp.sync_voxels()
        results[use_rf] = _voxel_maps(m)

    occ_rf, trav_rf = results[True]
    occ_seg, trav_seg = results[False]

    # Identical quantised endpoints -> identical visited voxels and counts.
    assert set(occ_rf) == set(occ_seg)
    worst = max(abs(occ_rf[k] - occ_seg[k]) for k in occ_seg)
    assert worst == 0.0, worst

    # Traversal: rayflow must be at least as close to the f64 oracle as the
    # segmented path, and within f32 tolerance of it.
    err_rf = max(abs(trav_rf[k] - trav_o[k]) for k in trav_o)
    err_seg = max(abs(trav_seg[k] - trav_o[k]) for k in trav_o)
    assert err_rf < 2e-3, err_rf
    # Rays longer than a region edge are split by the segmented path, which
    # loses each boundary voxel's partial traversal (>= one crossing span);
    # rayflow walks the full ray and must not show that loss.
    assert err_seg > 0.01, "scene no longer exercises segment splitting"
    assert err_rf <= max(err_seg * 0.5, 1e-4)


def test_rayflow_diagonal_ray_not_truncated():
    # A pure-diagonal full ray's TOTAL crossings reach 3x its per-axis max,
    # so the segmented-path sqrt(3)*steps truncation bound does not apply;
    # rayflow must cap the walk from the exact batch max (walk_cap) and the
    # device counts real events lost to an insufficient cap into
    # stats['overflow'] (validate asserts zero).
    rays = np.array([[0.0, 0.0, 0.0], [6.0, 6.0, 6.0]])
    m_dev = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mp = TpuRayMapper(m_dev, capacity=64, validate=True, rayflow=True)
    mp.integrate_rays(rays)
    mp.sync_voxels()
    assert getattr(mp, "_wcap_cache_rf", 0) >= 180
    m_ref = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    RayMapperOccupancy(m_ref).integrate_rays(rays)
    occ_rf, _ = _voxel_maps(m_dev)
    occ_o, _ = _voxel_maps(m_ref)
    # Same observed-voxel set (no truncated tail) and matching values.
    assert set(occ_rf) == set(occ_o)
    assert max(abs(occ_rf[k] - occ_o[k]) for k in occ_o) < 1e-4


def test_rayflow_ndt_matches_segmented():
    from ohm_tpu.mapping.ndt_map import TpuNdtMap
    from ohm_tpu.oracle.ndt import NdtParams
    from ohm_tpu.core.layout import MEAN_LAYER, COVARIANCE_LAYER

    rng = np.random.default_rng(9)
    n = 64
    samples = np.column_stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                               np.zeros(n) + rng.normal(0, 0.005, n)])
    rays = np.empty((2 * n, 3))
    rays[0::2] = (0.0, 0.0, 2.0)
    rays[1::2] = samples

    maps = []
    for use_rf in (True, False):
        m = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
        mp = TpuNdtMap(m, NdtParams(), capacity=64, validate=True)
        mp.rayflow = use_rf
        for _ in range(2):
            mp.integrate_rays(rays)
        mp.sync_voxels()
        assert bool(getattr(mp, "_k_cache_rf", 0)) == use_rf  # path actually taken
        maps.append(m)
    m0, m1 = maps
    ci = m0.layer_index(COVARIANCE_LAYER)
    mi = m0.layer_index(MEAN_LAYER)
    checked = 0
    for key, a in m0.chunks.items():
        b = m1.region(key)
        assert b is not None
        np.testing.assert_array_equal(a.layers[mi]["count"], b.layers[mi]["count"])
        for f in a.layers[ci].dtype.names:
            np.testing.assert_allclose(a.layers[ci][f], b.layers[ci][f], atol=1e-5)
        checked += 1
    assert checked > 0


@pytest.mark.slow
def test_rayflow_ndt_tm_intensity_multiplicity_matches_oracle():
    """Regression: the NDT-TM intensity merge is a SEQUENTIAL recursion, and
    the rayflow wire's snake permutation reorders same-voxel samples — the
    hit sort must re-order by the original batch ray index (integrate_ndt
    order_key) or high-multiplicity voxels diverge ~20% from the reference
    recursion (observed before the fix; CI pins OHM_RAYFLOW=0 elsewhere,
    so this is the only rayflow coverage of the k>=8 regime)."""
    from ohm_tpu.mapping.ndt_map import TpuNdtMap
    from ohm_tpu.oracle.ndt import NdtParams, RayMapperNdt
    from ohm_tpu.core.layout import INTENSITY_LAYER

    rng = np.random.default_rng(21)
    n, k = 16, 8  # k samples per voxel, shuffled so snake reorders them
    base = np.column_stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                            np.zeros(n)])
    samples = np.repeat(base, k, axis=0) + rng.normal(0, 0.004, (n * k, 3))
    perm = rng.permutation(n * k)
    samples = samples[perm]
    intens = rng.uniform(10.0, 200.0, n * k)[perm.argsort()][perm]
    rays = np.empty((2 * n * k, 3))
    rays[0::2] = (0.0, 0.0, 2.0)
    rays[1::2] = samples

    params = NdtParams(ndt_tm=True)
    m_dev = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    mp = TpuNdtMap(m_dev, params, capacity=64, validate=True)
    mp.rayflow = True
    mp.integrate_rays(rays, intensities=intens)
    mp.sync_voxels()
    assert bool(getattr(mp, "_k_cache_rf", 0))  # rayflow path actually taken

    m_cpu = OccupancyMap(resolution=0.25, flags=MapFlag.NONE)
    RayMapperNdt(m_cpu, NdtParams(ndt_tm=True,
                                  adaptation_rate=params.adaptation_rate)
                 ).integrate_rays(rays, intensities=intens)

    ii = m_dev.layer_index(INTENSITY_LAYER)
    checked = 0
    for key, a in m_cpu.chunks.items():
        b = m_dev.region(key)
        if b is None:
            continue
        mask = a.layers[ii]["mean"] != 0
        for f in ("mean", "cov"):
            np.testing.assert_allclose(
                a.layers[ii][f][mask], b.layers[ii][f][mask],
                rtol=1e-3, atol=1e-3)
        checked += int(mask.sum())
    assert checked > 0


def test_rayflow_tsdf_matches_segmented():
    from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
    from ohm_tpu.core.layout import TSDF_LAYER

    rng = np.random.default_rng(11)
    rays = _scene(96, rng)
    maps = []
    for use_rf in (True, False):
        m = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
        mp = TpuTsdfMap(m, capacity=64, validate=True)
        mp.rayflow = use_rf
        mp.integrate_rays(rays)
        mp.sync_voxels()
        assert bool(getattr(mp, "_k_cache_rf", 0)) == use_rf  # path actually taken
        maps.append(m)
    m0, m1 = maps
    ti = m0.layer_index(TSDF_LAYER)
    checked = 0
    for key, a in m0.chunks.items():
        b = m1.region(key)
        assert b is not None
        np.testing.assert_allclose(a.layers[ti]["weight"], b.layers[ti]["weight"], atol=1e-4)
        np.testing.assert_allclose(a.layers[ti]["distance"], b.layers[ti]["distance"], atol=1e-3)
        checked += 1
    assert checked > 0


def test_rayflow_fallback_outside_envelope():
    # A batch whose region bbox exceeds the rayflow envelope (>63 regions on
    # an axis at 0.1 m res -> >201.6 m extent) must fall back to the
    # segmented wire silently and still integrate correctly.
    rays = np.array([[0.0, 0.0, 0.0], [210.0, 0.5, 0.5],
                     [0.0, 0.0, 0.0], [-1.0, 0.3, 0.2]])
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mp = TpuRayMapper(m, capacity=128, validate=True, rayflow=True)
    mp.integrate_rays(rays)
    mp.sync_voxels()
    # rayflow was NOT taken (no cache entries), yet the map is populated
    assert getattr(mp, "_k_cache_rf", 0) == 0
    assert m.voxel_value(point=[210.0, 0.5, 0.5]) > 0
    assert m.voxel_value(point=[100.0, 0.25, 0.25]) < 0


def test_cdict_wire_bit_identical_tcand():
    """The dictionary wire (256-entry packed-candidate dict + u8 indices)
    must reconstruct tcand bit-identically to the full i32 candidate block
    (native.rayflow_finish dict_mode; ops.integrate._unpack_batch cdict)."""
    import dataclasses
    import jax.numpy as jnp
    from ohm_tpu.mapping.batch import prepare_rayflow, rayflow_wire
    from ohm_tpu.mapping.tpu_map import TpuRayMapper
    from ohm_tpu.ops.integrate import _unpack_batch

    rng = np.random.default_rng(11)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    rays = _scene(512, rng)
    mapper = TpuRayMapper(m, capacity=256)
    rf = prepare_rayflow(m, rays)
    assert rf is not None and len(rf.region_keys) <= 255
    mapper.arena.ensure_regions(rf.region_keys, host_map=m)
    w_full = rayflow_wire(rf, mapper.arena.table, with_touch=False,
                          with_intensity=False, cdict=False)
    w_dict = rayflow_wire(rf, mapper.arena.table, with_touch=False,
                          with_intensity=False, cdict=True)
    assert w_dict.nbytes < w_full.nbytes  # 4K -> K B/ray + 1KB dict
    cfg = mapper._config(0, table_k=rf.table_k)
    cfg_f = dataclasses.replace(cfg, with_touch_time=False, rayw_cdict=False)
    cfg_d = dataclasses.replace(cfg, with_touch_time=False, rayw_cdict=True)
    b_full = _unpack_batch({"rayw": jnp.asarray(w_full)}, cfg_f)
    b_dict = _unpack_batch({"rayw": jnp.asarray(w_dict)}, cfg_d)
    for k in b_full:
        np.testing.assert_array_equal(np.asarray(b_full[k]), np.asarray(b_dict[k]),
                                      err_msg=k)


def test_fdict_wire_bit_identical_start_frac():
    """The start_frac dictionary wire (256-entry f32[,3] dict + u8 indices)
    must reconstruct every unpacked field bit-identically to the full float
    block, and moving-origin batches (>255 distinct triples) must fall back
    (frac_dict_of -> None)."""
    import dataclasses
    import jax.numpy as jnp
    from ohm_tpu.mapping.batch import prepare_rayflow, rayflow_wire, frac_dict_of
    from ohm_tpu.mapping.tpu_map import TpuRayMapper
    from ohm_tpu.ops.integrate import _unpack_batch

    rng = np.random.default_rng(11)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    rays = _scene(512, rng)  # shared sensor origin -> 1 distinct triple
    mapper = TpuRayMapper(m, capacity=256)
    rf = prepare_rayflow(m, rays)
    fd = frac_dict_of(rf)
    assert fd is not None
    mapper.arena.ensure_regions(rf.region_keys, host_map=m)
    w_full = rayflow_wire(rf, mapper.arena.table, with_touch=False,
                          with_intensity=False)
    w_fd = rayflow_wire(rf, mapper.arena.table, with_touch=False,
                        with_intensity=False, fdict=fd)
    assert w_fd.nbytes < w_full.nbytes  # 12 -> 1 B/ray + 3KB dict
    cfg = mapper._config(0, table_k=rf.table_k)
    cfg_f = dataclasses.replace(cfg, with_touch_time=False)
    cfg_d = dataclasses.replace(cfg, with_touch_time=False, rayw_fdict=True)
    b_full = _unpack_batch({"rayw": jnp.asarray(w_full)}, cfg_f)
    b_fd = _unpack_batch({"rayw": jnp.asarray(w_fd)}, cfg_d)
    for k in b_full:
        np.testing.assert_array_equal(np.asarray(b_full[k]), np.asarray(b_fd[k]),
                                      err_msg=k)

    # Moving origins: every ray gets a distinct start_frac -> fallback.
    rays2 = _scene(512, rng)
    rays2[0::2] += rng.uniform(0.0, 0.09, rays2[0::2].shape)  # perturb origins
    rf2 = prepare_rayflow(m, rays2)
    assert frac_dict_of(rf2) is None


def test_fdict_end_to_end_matches_full_wire():
    """Map populated through the fdict wire must equal the full-wire map."""
    rng = np.random.default_rng(23)
    batches = [_scene(256, rng) for _ in range(3)]
    maps = []
    for force_full in (False, True):
        m = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
        mp = TpuRayMapper(m, capacity=64, validate=True, rayflow=True)
        if force_full:
            # Disable fdict by patching frac_dict_of (the mapper re-imports
            # it from the module at each call).
            import ohm_tpu.mapping.batch as mb
            saved = mb.frac_dict_of
            mb.frac_dict_of = lambda rf: None
            try:
                for b in batches:
                    mp.integrate_rays(b)
            finally:
                mb.frac_dict_of = saved
        else:
            for b in batches:
                mp.integrate_rays(b)
        mp.sync_voxels()
        maps.append(m)
    occ0, _ = _voxel_maps(maps[0])
    occ1, _ = _voxel_maps(maps[1])
    assert occ0.keys() == occ1.keys()
    for k in occ0:
        np.testing.assert_array_equal(occ0[k], occ1[k])


def test_coalesced_async_matches_sequential():
    """The coalesced multi-batch transfer (TpuRayMapper._integrate_group:
    one stacked device_put per OHM_COALESCE batches, device-side row split)
    must be bit-identical to sequential synchronous integration — including
    when a mid-stream batch forces eviction (the group must flush before
    slots are reassigned) and when batch shapes differ."""
    rng = np.random.default_rng(17)
    batches = [_scene(n=96, rng=rng) for _ in range(7)]
    batches[3] = _scene(n=64, rng=rng)  # shape change mid-group

    m_seq = OccupancyMap(resolution=0.2, flags=MapFlag.TRAVERSAL)
    mp_seq = TpuRayMapper(m_seq, capacity=64, validate=True, rayflow=True)
    for b in batches:
        mp_seq.integrate_rays(b)
    mp_seq.sync_voxels()
    occ_s, trav_s = _voxel_maps(m_seq)

    m_co = OccupancyMap(resolution=0.2, flags=MapFlag.TRAVERSAL)
    mp_co = TpuRayMapper(m_co, capacity=64, validate=False, rayflow=True)
    for b in batches:
        mp_co.integrate_rays_async(b)
    mp_co.sync_voxels()
    assert mp_co.stats["missed_updates"] == 0
    occ_c, trav_c = _voxel_maps(m_co)

    assert occ_c == occ_s
    assert trav_c == trav_s


@pytest.mark.slow
def test_coalesced_async_with_eviction_pressure():
    """A tiny arena forces evictions between queued batches: NeedsEviction
    must flush the pending group (never reassigning a slot a pending wire
    references) and the result must still match sequential integration."""
    rng = np.random.default_rng(23)
    # Three spatially disjoint clusters so consecutive batches demand
    # different region sets and the 24-slot arena has to evict.
    centres = [np.array(c) for c in ((0.0, 0.0, 0.0), (40.0, 0.0, 0.0),
                                     (0.0, 40.0, 0.0))]
    batches = []
    for i in range(6):
        c = centres[i % 3]
        pts = c + rng.uniform(-5, 5, (48, 3))
        rays = np.empty((96, 3))
        rays[0::2] = c
        rays[1::2] = pts
        batches.append(rays)

    m_seq = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
    mp_seq = TpuRayMapper(m_seq, capacity=12, rayflow=True)
    for b in batches:
        mp_seq.integrate_rays(b)
    mp_seq.sync_voxels()
    occ_s, _ = _voxel_maps(m_seq)

    m_co = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
    mp_co = TpuRayMapper(m_co, capacity=12, rayflow=True)
    for b in batches:
        mp_co.integrate_rays_async(b)
    mp_co.sync_voxels()
    occ_c, _ = _voxel_maps(m_co)

    assert mp_co.arena.stats["evictions"] > 0
    assert occ_c == occ_s


@pytest.mark.slow
def test_coalesced_async_ndt_and_tsdf_match_sequential():
    """NDT/TSDF mappers ride the coalesced path through their
    _dispatch_rayflow overrides."""
    from ohm_tpu.mapping.ndt_map import TpuNdtMap
    from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
    from ohm_tpu.core.layout import COVARIANCE_LAYER, TSDF_LAYER

    rng = np.random.default_rng(31)
    batches = [_scene(n=64, rng=rng) for _ in range(5)]

    def run(cls, async_mode):
        m = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
        mp = cls(m, capacity=64)
        for b in batches:
            if async_mode:
                mp.integrate_rays_async(b)
            else:
                mp.integrate_rays(b)
        mp.sync_voxels()
        return m

    for cls, layer, member in ((TpuNdtMap, COVARIANCE_LAYER, "P22"),
                               (TpuTsdfMap, TSDF_LAYER, "distance")):
        m_a, m_b = run(cls, False), run(cls, True)
        li = m_a.layer_index(layer)
        assert set(m_a.chunks) == set(m_b.chunks)
        for key, chunk in m_a.chunks.items():
            a = chunk.layers[li][member]
            b = m_b.chunks[key].layers[li][member]
            np.testing.assert_array_equal(a, b)


def test_chained_dispatch_matches_sequential():
    """The chained mega-dispatch (ops.integrate.integrate_chain: the whole
    coalesced group's expand+apply runs as ONE compiled program, arena state
    threaded batch to batch) must be bit-identical to per-batch dispatch.
    Motivation: each dispatch RPC through the tunnel costs ~5 ms
    (docs/PERF.md round-4 decomposition), so 2K+1 dispatches collapse to 1."""
    rng = np.random.default_rng(41)
    warm = [_scene(n=96, rng=rng) for _ in range(4)]   # window-sizing batches
    group = [_scene(n=96, rng=rng) for _ in range(4)]  # the chained group

    def run(chained):
        m = OccupancyMap(resolution=0.2, flags=MapFlag.TRAVERSAL)
        mp = TpuRayMapper(m, capacity=64, validate=True, rayflow=True)
        for b in warm:
            mp.integrate_rays(b)  # sizes row_cap/scatter_cap identically
        chain_calls = []
        if chained:
            orig = mp._dispatch_chain

            def counted(pending):
                chain_calls.append(len(pending))
                return orig(pending)

            mp._dispatch_chain = counted
            mp._integrate_group([(b, None, None, 0) for b in group])
            assert chain_calls == [len(group)], \
                "chain path not engaged — gate regression"
        else:
            for b in group:
                mp.integrate_rays(b)
        mp.sync_voxels()
        return _voxel_maps(m)

    occ_c, trav_c = run(True)
    occ_s, trav_s = run(False)
    assert occ_c == occ_s
    assert trav_c == trav_s


def test_cdict_u16_wire_bit_identical_tcand():
    """The u16 dictionary wire (2048-entry dict + u16 indices, dict_mode 2)
    must reconstruct tcand bit-identically to the full i32 candidate block
    for batches touching 256..2047 regions (the u8 dict's fallback range —
    e.g. the box bench scene's ~320)."""
    import dataclasses
    import jax.numpy as jnp
    from ohm_tpu.mapping.batch import prepare_rayflow, rayflow_wire
    from ohm_tpu.mapping.tpu_map import TpuRayMapper
    from ohm_tpu.ops.integrate import _unpack_batch

    rng = np.random.default_rng(13)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    # Rays to the walls of a 32x32x16 m box cross well over 255 regions
    # at 0.1 m resolution (region edge 3.2 m).
    n = 4096
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    t = np.min(np.where(dirs != 0, np.array([16.0, 16.0, 8.0]) / np.abs(dirs),
                        np.inf), axis=1)
    rays = np.zeros((2 * n, 3))
    rays[1::2] = dirs * t[:, None]

    mapper = TpuRayMapper(m, capacity=1024)
    rf = prepare_rayflow(m, rays)
    assert rf is not None and 255 < len(rf.region_keys) <= 2047, \
        len(rf.region_keys)
    mapper.arena.ensure_regions(rf.region_keys, host_map=m)
    w_full = rayflow_wire(rf, mapper.arena.table, with_touch=False,
                          with_intensity=False, cdict=0)
    w_dict = rayflow_wire(rf, mapper.arena.table, with_touch=False,
                          with_intensity=False, cdict=2)
    assert w_dict.nbytes < w_full.nbytes  # 4K -> 2K B/ray + 8KB dict
    cfg = mapper._config(0, table_k=rf.table_k)
    cfg_f = dataclasses.replace(cfg, with_touch_time=False, rayw_cdict=0)
    cfg_d = dataclasses.replace(cfg, with_touch_time=False, rayw_cdict=2)
    b_full = _unpack_batch({"rayw": jnp.asarray(w_full)}, cfg_f)
    b_dict = _unpack_batch({"rayw": jnp.asarray(w_dict)}, cfg_d)
    for k in b_full:
        np.testing.assert_array_equal(np.asarray(b_full[k]),
                                      np.asarray(b_dict[k]), err_msg=k)
