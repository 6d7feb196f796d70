"""NDT-OM end-to-end vs device-only gap, same process/tunnel (round 5 s2)."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from ohm_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.ndt_map import TpuNdtMap
from ohm_tpu.mapping.tpu_map import TpuRayMapper
import bench as benchmod

print(f"devices: {jax.devices()}", flush=True)
rng = np.random.default_rng(2024)


def fence(mp):
    float(jnp.ravel(mp.arena.arrays["occupancy"])[0])


def run(make, label, n=20):
    mp = make()
    batches = [benchmod.box_scene_rays(8192, rng) for _ in range(n)]
    mp.prime_caps(batches)
    for b in batches[:6]:
        mp.integrate_rays(b)
    for b in batches:
        mp.integrate_rays_async(b)
    mp.flush()
    fence(mp)
    t0 = time.perf_counter()
    for b in batches:
        mp.integrate_rays_async(b)
    mp.flush()
    fence(mp)
    dt = time.perf_counter() - t0
    rps = 8192 * n / dt
    print(f"{label}: {rps/1e3:.1f}k rays/s ({dt/n*1e3:.2f} ms/batch)", flush=True)
    # host prep cost
    t0 = time.perf_counter()
    for b in batches[:8]:
        mp._rayflow_setup_host(b, None, None, 0)
    prep = (time.perf_counter() - t0) / 8 * 1e3
    print(f"{label}: host prep {prep:.2f} ms/batch", flush=True)


run(lambda: TpuNdtMap(OccupancyMap(resolution=0.2, flags=MapFlag.NONE),
                      capacity=1024), "ndt-om")
run(lambda: TpuRayMapper(OccupancyMap(resolution=0.1, flags=MapFlag.NONE),
                         capacity=512), "occupancy")
