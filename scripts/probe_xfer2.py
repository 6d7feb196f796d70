"""Transfer size sweep: latency vs bandwidth on the axon tunnel."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from ohm_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp

def fence(x):
    return float(jnp.ravel(x)[0].astype(jnp.float32))

def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    sizes = [1 << 14, 1 << 17, 1 << 20, 1 << 22, 1 << 23]
    arrs = {s: rng.integers(0, 255, s, np.uint8).view(np.int32) for s in sizes}
    fence(jnp.zeros(8, jnp.float32))
    for s, a in arrs.items():
        b = jnp.asarray(a); fence(b[:1])
    for rep in range(3):
        for s, a in arrs.items():
            t0 = time.perf_counter()
            bufs = [jnp.asarray(a) for _ in range(3)]
            fence(bufs[-1][:1])
            dt = (time.perf_counter() - t0) / 3
            print(f"rep{rep} {s>>10}KB: {dt*1e3:.2f} ms ({s/1e6/dt:.0f} MB/s)", flush=True)

if __name__ == "__main__":
    main()
