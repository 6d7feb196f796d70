"""Transfer-rate probe: device_put dtype A/B on the axon tunnel.

The rayflow wire ships as uint8; probe whether dtype changes the
host->device path cost (fenced by readback; interleaved blocks so tunnel
state is comparable)."""
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
    nbytes = 1 << 20
    base = np.random.default_rng(0).integers(0, 255, nbytes, np.uint8)
    variants = {
        "u8": base,
        "i32": base.view(np.int32),
        "f32": base.view(np.float32),
        "u8_2d": base.reshape(-1, 256),
        "i32_pad128": base.view(np.int32).reshape(-1, 128),
    }
    # handshake
    fence(jnp.zeros(8, jnp.float32))
    for name, arr in variants.items():
        b = jnp.asarray(arr); fence(b.reshape(-1)[:1])  # warm path
    for rep in range(3):
        for name, arr in variants.items():
            t0 = time.perf_counter()
            bufs = [jnp.asarray(arr) for _ in range(4)]
            fence(bufs[-1].reshape(-1)[:1])
            dt = (time.perf_counter() - t0) / 4
            print(f"rep{rep} {name}: {dt*1e3:.2f} ms ({arr.nbytes/1e6/dt:.0f} MB/s)", flush=True)

if __name__ == "__main__":
    main()
