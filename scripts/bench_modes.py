"""Throughput benchmarks for BASELINE.md configs 2-5 (the headline config 1
lives in bench.py).  Writes one JSON object per config to BENCH_extra.json
at the repo root and prints them.

Configs (BASELINE.md "Targets"):
  2. occupancy + VoxelMean, 0.2 m voxels, outdoor-like scene (no .laz ships
     with the repo, so a synthetic ground+structures cloud substitutes; the
     slamio .laz path is laspy-gated - see ohm_tpu/io/slam.py)
  3. NDT-OM covariance voxels with sample/miss separation
  4. TSDF integration + layered heightmap extraction
  5. stretch: NDT-TM + clearance + heightmap pipeline on one large frame

Also runs an ON-HARDWARE differential: a 512-ray batch integrated on the
live jax backend must match the f64 oracle voxel-by-voxel (tol 1e-4),
mirroring tests/ohmtestgpu/GpuMapTest.cpp compareCpuGpuMaps in the reference.

Run: python -u scripts/bench_modes.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

_ap = argparse.ArgumentParser()
_ap.add_argument("--quick", action="store_true")
_ap.add_argument("--platform", default=None,
                 help="pin backend (the axon sitecustomize overrides JAX_PLATFORMS)")
args = _ap.parse_args()

import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)
else:
    from ohm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tpu_map import TpuRayMapper
from ohm_tpu.mapping.ndt_map import TpuNdtMap
from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
from ohm_tpu.heightmap.heightmap import Heightmap, HeightmapMode
import bench as benchmod


def outdoor_rays(n, rng, extent=40.0, sensor_height=1.5):
    """Outdoor-like frame: ground plane + scattered box structures."""
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(-0.35, 0.15, n)  # mostly downward/level, lidar-like
    dirs = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=1)
    sensor = np.array([0.0, 0.0, sensor_height])
    # range to ground (z=0) or max extent
    t_ground = np.where(dirs[:, 2] < -1e-3, -sensor_height / dirs[:, 2], np.inf)
    t = np.minimum(t_ground, extent / np.maximum(np.linalg.norm(dirs[:, :2], axis=1), 1e-6))
    t = np.clip(t, 0.5, extent)
    rays = np.empty((2 * n, 3))
    rays[0::2] = sensor
    rays[1::2] = sensor + dirs * t[:, None]
    return rays


def _fence(mapper):
    # True completion fence: block_until_ready returns early on the axon
    # runtime while a program is still compiling remotely; only a readback
    # waits out the full pipeline.
    import jax.numpy as jnp
    float(jnp.ravel(mapper.arena.arrays["occupancy"])[0])


def timed_integration(mapper, batches, warmup=6):
    # warmup >= 6: the fused row-local deposit sizes its row_cap from the
    # 4th batch's stats and compiles its program on the 5th — both must land
    # before the timed region (as must every cap-shaped program variant,
    # hence prime_caps).
    if hasattr(mapper, "prime_caps"):
        mapper.prime_caps(batches)
    for b in batches[:warmup]:
        mapper.integrate_rays(b)
    # Warm THROUGH the timed loop's own path too: the async worker's
    # coalesced stacked-split / chained programs first-dispatch at
    # multi-second cost even on persistent-cache hits
    # (scripts/probe_async.py; the r3->r4 headline collapse).
    if hasattr(mapper, "integrate_rays_async"):
        for b in batches:
            mapper.integrate_rays_async(b)
        mapper.flush()
    _fence(mapper)
    t0 = time.perf_counter()
    for b in batches:
        if hasattr(mapper, "integrate_rays_async"):
            mapper.integrate_rays_async(b)
        else:
            mapper.integrate_rays(b)
    if hasattr(mapper, "flush"):
        mapper.flush()
    _fence(mapper)
    dt = time.perf_counter() - t0
    n_rays = sum(np.asarray(b).reshape(-1, 3).shape[0] // 2 for b in batches)
    return n_rays / dt


def differential_on_hardware(tol=1e-4):
    """TPU-vs-f64-oracle voxel differential on the live backend."""
    from ohm_tpu.oracle.occupancy import RayMapperOccupancy

    rng = np.random.default_rng(11)
    rays = benchmod.box_scene_rays(512, rng, half=(4.0, 4.0, 2.0))

    m_dev = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
    mapper = TpuRayMapper(m_dev, capacity=128, validate=True)
    mapper.integrate_rays(rays)
    mapper.sync_voxels()

    m_ref = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
    RayMapperOccupancy(m_ref).integrate_rays(rays)

    occ_idx = m_ref.layer_index("occupancy")
    vals_dev, vals_ref = {}, {}
    for vals, m in ((vals_dev, m_dev), (vals_ref, m_ref)):
        for key, chunk in m.chunks.items():
            occ = chunk.layers[occ_idx]["occupancy"]
            for i in np.flatnonzero(np.isfinite(occ)):
                vals[(key, int(i))] = float(occ[i])
    assert set(vals_dev) == set(vals_ref), (
        f"voxel coverage differs: dev-only {len(set(vals_dev)-set(vals_ref))}, "
        f"ref-only {len(set(vals_ref)-set(vals_dev))}")
    worst = max(abs(vals_dev[k] - vals_ref[k]) for k in vals_ref)
    assert worst < tol, f"on-hardware differential diverged: {worst}"
    return {"metric": "hardware_differential_worst_abs_err", "value": worst,
            "unit": "logit", "voxels": len(vals_ref)}


def main():
    rng = np.random.default_rng(7)
    n_batches = 4 if args.quick else 12
    rays_per_batch = 8192
    results = []

    print(f"devices: {jax.devices()}", flush=True)

    # --- on-hardware differential -------------------------------------------
    diff = differential_on_hardware()
    print(json.dumps(diff), flush=True)
    results.append(diff)

    # --- config 2: occupancy + mean, 0.2 m, outdoor scene ---------------------
    # BASELINE config 2 calls for a real .laz cloud; none ships with the
    # repo, so the outdoor frame is written through the native LASzip codec
    # and INGESTED BACK through slamio (cloud + trajectory -> batches), so
    # the timed path is the real one-command ohmpop shape end to end.
    m2 = OccupancyMap(resolution=0.2, flags=MapFlag.VOXEL_MEAN)
    mp2 = TpuRayMapper(m2, capacity=1024)
    batches = [outdoor_rays(rays_per_batch, rng) for _ in range(n_batches)]
    try:
        import tempfile
        from ohm_tpu.io.las import write_laz
        from ohm_tpu.io.slam import SlamCloudLoader

        pts = np.concatenate([b[1::2] for b in batches])
        t = 1000.0 + np.arange(len(pts)) * 1e-4
        tmpd = tempfile.mkdtemp()
        laz_path = os.path.join(tmpd, "outdoor.laz")
        write_laz(laz_path, pts, timestamps=t)
        traj_path = os.path.join(tmpd, "traj.txt")
        sensor = batches[0][0]  # static sensor for this frame
        with open(traj_path, "w") as fh:
            fh.write(f"{t[0]} {sensor[0]} {sensor[1]} {sensor[2]}\n")
            fh.write(f"{t[-1] + 1} {sensor[0]} {sensor[1]} {sensor[2]}\n")
        loader = SlamCloudLoader(laz_path, traj_path)
        laz_batches = []
        while True:
            b = loader.next_batch(rays_per_batch)
            if b is None or not len(b[0]):
                break
            laz_batches.append(b[0])  # interleaved origin/sample rays
        if laz_batches:
            batches = laz_batches
    except Exception as e:  # pragma: no cover - keep the bench robust
        print(f"# .laz ingestion unavailable ({e}); synthetic batches", flush=True)
    rps = timed_integration(mp2, batches)
    r = {"metric": "occupancy_mean_outdoor_rays_per_sec", "value": round(rps, 1),
         "unit": "rays/s", "vs_baseline": round(rps / 1e8, 5), "source": "laz"}
    print(json.dumps(r), flush=True)
    results.append(r)

    # --- RaysQuery p50 latency (BASELINE.json tracked metric) -----------------
    # 512-ray first-occupied/unobserved-volume queries against the populated
    # config-2 map; execute() ends in a device->host readback so each sample
    # is a true round-trip latency.
    from ohm_tpu.query.rays_query import RaysQuery

    q = RaysQuery(mapper=mp2)
    qrays = outdoor_rays(512, rng)
    lat = []
    for i in range(13):
        q.set_rays(qrays)
        t0 = time.perf_counter()
        q.execute()
        lat.append(time.perf_counter() - t0)
    lat = sorted(lat[1:])  # drop the compile-bearing first sample
    p50 = lat[len(lat) // 2] * 1e3
    # Tunnel RTT alongside (same process): execute() ends in ONE device->host
    # readback, so the RTT is this metric's hard floor on a tunneled chip —
    # report it so a tunnel swing can't masquerade as a query regression.
    import jax.numpy as jnp

    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.ravel(mp2.arena.arrays["occupancy"])[0])
        rtts.append(time.perf_counter() - t0)
    # Dispatch+device-only query latency: resident wire, 16 re-dispatches of
    # the compiled program, one fence — the per-launch cost with the tunnel
    # RTT excluded.  On a locally-attached chip (the reference's situation:
    # one kernel launch, ohmgpu/gpu/RaysQuery.cl:193) the synchronous
    # execute() would cost ~this plus a PCIe readback, not plus ~25 ms.
    from ohm_tpu.query.rays_query import _rays_query_device

    call = q._prepare_device_call()
    reps = 16
    dev_ms = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _i in range(reps):
            out = _rays_query_device(*call)
        float(jnp.ravel(out)[0])
        dev_ms.append((time.perf_counter() - t0) / reps * 1e3)
    r = {"metric": "rays_query_p50_ms", "value": round(p50, 2), "unit": "ms",
         "vs_baseline": None, "rays": 512,
         "tunnel_rtt_ms": round(min(rtts) * 1e3, 2),
         "device_ms_per_query": round(min(dev_ms), 2)}
    print(json.dumps(r), flush=True)
    results.append(r)

    # --- sharded routing overhead: n=1 mesh on the REAL chip ------------------
    # ShardedRayFlowMapper degenerates to one shard: every ray routes to the
    # single owner, so the measured gap vs TpuRayMapper is pure routing
    # machinery cost (source split + all_to_all + stacked wire), the number
    # the round-4 VERDICT item 6 asked for.
    try:
        from jax.sharding import Mesh
        from ohm_tpu.parallel.rayflow import ShardedRayFlowMapper

        mesh1 = Mesh(np.array(jax.devices()[:1]), axis_names=("shard",))
        m_s1 = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
        sh1 = ShardedRayFlowMapper(m_s1, mesh1, kind="occupancy",
                                   capacity=1024, scatter_pad=1 << 22)
        m_y = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
        yard = TpuRayMapper(m_y, capacity=1024)
        batches = [benchmod.box_scene_rays(rays_per_batch, rng)
                   for _ in range(max(4, n_batches // 2))]
        for b in batches:
            sh1.integrate_rays(b)
            yard.integrate_rays(b)
        jax.block_until_ready(sh1.arena.state["occupancy"])
        float(jnp.ravel(yard.arena.arrays["occupancy"])[0])
        t0 = time.perf_counter()
        for b in batches:
            sh1.integrate_rays(b)
        jax.block_until_ready(sh1.arena.state["occupancy"])
        t_sh = time.perf_counter() - t0
        t0 = time.perf_counter()
        for b in batches:
            yard.integrate_rays(b)
        float(jnp.ravel(yard.arena.arrays["occupancy"])[0])
        t_yd = time.perf_counter() - t0
        n_tot = rays_per_batch * len(batches)
        r = {"metric": "sharded_n1_overhead",
             "sharded_rays_per_sec": round(n_tot / t_sh, 1),
             "single_rays_per_sec": round(n_tot / t_yd, 1),
             "overhead_frac": round(t_sh / t_yd - 1.0, 3),
             "wire_bytes_per_ray": round(
                 sh1.stats["wire_bytes"] / max(sh1.stats["rays"], 1), 1),
             "routed_copies_per_ray": round(
                 sh1.stats["routed_rays"] / max(sh1.stats["rays"], 1), 3)}
        print(json.dumps(r), flush=True)
        results.append(r)
    except Exception as e:  # never block the remaining configs
        print(json.dumps({"metric": "sharded_n1_overhead",
                          "error": str(e)[:200]}), flush=True)

    # --- config 3: NDT-OM ------------------------------------------------------
    m3 = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
    mp3 = TpuNdtMap(m3, capacity=1024)
    batches = [benchmod.box_scene_rays(rays_per_batch, rng) for _ in range(n_batches)]
    rps = timed_integration(mp3, batches)
    r = {"metric": "ndt_om_rays_per_sec", "value": round(rps, 1),
         "unit": "rays/s", "vs_baseline": round(rps / 1e8, 5)}
    print(json.dumps(r), flush=True)
    results.append(r)

    # --- config 4: TSDF + layered heightmap -----------------------------------
    m4 = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mp4 = TpuTsdfMap(m4, capacity=1024)
    batches = [benchmod.box_scene_rays(rays_per_batch, rng) for _ in range(n_batches)]
    rps = timed_integration(mp4, batches)
    r = {"metric": "tsdf_rays_per_sec", "value": round(rps, 1),
         "unit": "rays/s", "vs_baseline": round(rps / 1e8, 5)}
    print(json.dumps(r), flush=True)
    results.append(r)

    # layered heightmap extraction from an occupancy map of the same scene
    m4o = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mp4o = TpuRayMapper(m4o, capacity=1024)
    for b in batches[:4]:
        mp4o.integrate_rays(b)
    mp4o.sync_voxels()
    hm = Heightmap(min_clearance=0.5)
    hm.mode = HeightmapMode.LAYERED_FILL
    t0 = time.perf_counter()
    hm.build_heightmap(m4o)
    dt = time.perf_counter() - t0
    n_vox = sum(np.isfinite(c.layers[m4o.layer_index("occupancy")]["occupancy"]).sum()
                for c in m4o.chunks.values())
    r = {"metric": "layered_heightmap_build_sec", "value": round(dt, 3),
         "unit": "s", "source_voxels": int(n_vox)}
    print(json.dumps(r), flush=True)
    results.append(r)

    # --- config 5 (stretch): NDT-TM + clearance + heightmap, 1M-ray frame -----
    if not args.quick:
        from ohm_tpu.oracle.ndt import NdtParams
        m5 = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
        # miss_k pre-sized like capacity: the flagged-record demand grows as
        # the 1M-ray frame densifies (peaks ~5.5k/batch here); auto sizing
        # would escalate mid-frame and pay a fresh shape-specialised remote
        # compile inside the timed region.
        mp5 = TpuNdtMap(m5, params=NdtParams(ndt_tm=True), capacity=1024,
                        miss_k=1 << 15)
        frame = benchmod.box_scene_rays(1 << 20, rng, half=(15.0, 15.0, 7.0))
        intens = rng.uniform(0.0, 1.0, 1 << 20).astype(np.float32)
        times = np.linspace(0.0, 0.1, 1 << 20)
        # Warm through the async path (auto windows size + compile on the
        # 4th-6th batch; block_until_ready lies on this runtime — fence by
        # readback).
        step = 2 * 8192
        for i in range(0, 6 * step, step):
            mp5.integrate_rays_async(frame[i:i + step],
                                     intensities=intens[i // 2:i // 2 + 8192],
                                     timestamps=times[i // 2:i // 2 + 8192])
        mp5.flush()
        _fence(mp5)
        t0 = time.perf_counter()
        for i in range(0, frame.shape[0], step):
            mp5.integrate_rays_async(frame[i:i + step],
                                     intensities=intens[i // 2:i // 2 + 8192],
                                     timestamps=times[i // 2:i // 2 + 8192])
        mp5.flush()
        _fence(mp5)
        t_int = time.perf_counter() - t0
        mp5.sync_voxels()
        from ohm_tpu.query.clearance import ClearanceProcess

        cp5 = ClearanceProcess(m5, search_radius=1.0)
        cp5.update(force=True)  # cold: remote-compiles the EDT programs
        t0 = time.perf_counter()
        cp5.update(force=True)
        t_clear = time.perf_counter() - t0
        # Small-motion follow-up frame: a 16k-ray delta touching a corner of
        # the scene; the incremental scheduler re-EDTs only dirty regions
        # (reference: ohmgpu/ClearanceProcess.cpp dirty-region loop).
        delta = benchmod.box_scene_rays(1 << 14, rng, half=(3.0, 3.0, 3.0),
                                        sensor=(10.0, 10.0, 2.0))
        mp5.integrate_rays(delta, intensities=intens[: 1 << 14],
                           timestamps=times[: 1 << 14])
        mp5.sync_voxels()
        t0 = time.perf_counter()
        n_inc = cp5.update()
        t_clear_inc = time.perf_counter() - t0
        hm5 = Heightmap(min_clearance=0.5)
        hm5.mode = HeightmapMode.LAYERED_FILL
        t0 = time.perf_counter()
        hm5.build_heightmap(m5)
        t_hm = time.perf_counter() - t0
        # Headline = integrate + WARM full-map EDT + heightmap (a 1M-ray
        # frame re-dirties most of this scene, so full ~= dirty here; the
        # cold number above bears the remote compile and is not a frame
        # cost).  The small-motion incremental cost is reported alongside —
        # that is the steady-state clearance term when the robot's per-frame
        # coverage is small vs the map (reference: ohmgpu/ClearanceProcess
        # .cpp processes dirty regions, not the whole map).
        r = {"metric": "ndt_tm_pipeline_frame_sec",
             "value": round(t_int + t_clear + t_hm, 3), "unit": "s",
             "rays": 1 << 20,
             "integrate_sec": round(t_int, 3),
             "clearance_sec": round(t_clear, 3),
             "clearance_incremental_sec": round(t_clear_inc, 3),
             "clearance_incremental_regions": int(n_inc),
             "heightmap_sec": round(t_hm, 3),
             "rays_per_sec": round((1 << 20) / t_int, 1)}
        print(json.dumps(r), flush=True)
        results.append(r)

    # Stamp every row with the SHA it measured (round-4 VERDICT weak #2:
    # bench artifacts that don't track HEAD are worse than no artifacts).
    import subprocess
    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True).stdout.strip()
        dirty = subprocess.run(["git", "status", "--porcelain"],
                               capture_output=True, text=True).stdout.strip()
        sha = sha + ("+dirty" if dirty else "")
    except Exception:
        sha = "unknown"
    for r in results:
        r["sha"] = sha
    with open("BENCH_extra.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote BENCH_extra.json", flush=True)


if __name__ == "__main__":
    main()
