"""TSDF per-visit cost probe: batch-blend vs per-visit on the real chip."""
import dataclasses, sys, time
import numpy as np
sys.path.insert(0, ".")
from ohm_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
import bench as benchmod

def fence(m):
    return float(jnp.ravel(m.arena.arrays["tsdf_weight"])[0])

def run(capacity, n=6, label=""):
    rng = np.random.default_rng(2024)
    m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
    mp = TpuTsdfMap(m, capacity=capacity)
    batches = [benchmod.box_scene_rays(8192, rng) for _ in range(n + 4)]
    mp.prime_caps(batches)
    for b in batches[:4]:
        mp.integrate_rays(b)
    fence(mp)
    t0 = time.perf_counter()
    for b in batches[4:4 + n]:
        mp.integrate_rays(b)
    fence(mp)
    dt = (time.perf_counter() - t0) / n
    print(f"{label} capacity={capacity} scatter_cap={mp.scatter_cap}: "
          f"{dt*1e3:.1f} ms/batch ({8192/dt/1e3:.0f}k rays/s)", flush=True)

print(f"devices: {jax.devices()}", flush=True)
run(1024, label="per-visit capped")
run(512, label="per-visit capped")
