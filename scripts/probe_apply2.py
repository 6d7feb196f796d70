"""Apply-phase microbenchmarks, round 2: dependency-chained timing.

The axon platform dispatches asynchronously and appears to ack
block_until_ready before independent executions drain, so every iteration
must consume the previous one's output.  Bitonic sort cost is
data-independent (fixed compare-exchange network), so re-mixing keys
between iterations does not distort the measurement.

Run: python scripts/probe_apply2.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ohm_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp


def chain_time(step, init, iters=16, warmup=2):
    x = init
    for _ in range(warmup):
        x = step(x)
    x = jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    x = jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    N = 1 << 21
    CAP = 2048 * 32768

    print(f"devices: {jax.devices()}", flush=True)

    keys0 = jnp.asarray(rng.integers(0, CAP, N, dtype=np.int32))

    # --- mixing overhead baseline ----------------------------------------
    @jax.jit
    def mix_only(k):
        return (k * jnp.int32(-1640531527) ^ (k >> 7)) & jnp.int32(CAP - 1)

    t_mix = chain_time(mix_only, keys0)
    print(f"mix-only baseline [{N}]:     {t_mix:8.2f} ms", flush=True)

    # --- sorts ------------------------------------------------------------
    @jax.jit
    def sort_mix_flat(k):
        s = jax.lax.sort((k,), num_keys=1)[0]
        return (s * jnp.int32(-1640531527) ^ (s >> 7)) & jnp.int32(CAP - 1)

    print(f"sort flat [{N}]:            {chain_time(sort_mix_flat, keys0) - t_mix:8.2f} ms", flush=True)

    for rows in (64, 256, 1024):
        cols = N // rows

        @jax.jit
        def sort_mix_batched(k, rows=rows, cols=cols):
            s = jax.lax.sort((k.reshape(rows, cols),), num_keys=1, dimension=1)[0]
            s = s.reshape(-1)
            return (s * jnp.int32(-1640531527) ^ (s >> 7)) & jnp.int32(CAP - 1)

        print(f"sort batched [{rows:5d},{cols:7d}]: {chain_time(sort_mix_batched, keys0) - t_mix:8.2f} ms", flush=True)

    # --- segmented scan -----------------------------------------------------
    @jax.jit
    def scan_mix(k):
        first = jnp.concatenate([jnp.array([True]), k[1:] != k[:-1]])
        v = (k & 7).astype(jnp.float32)

        def op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va + vb)

        f, s = jax.lax.associative_scan(op, (first, v))
        out = k ^ s.astype(jnp.int32)
        return (out * jnp.int32(-1640531527) ^ (out >> 7)) & jnp.int32(CAP - 1)

    print(f"assoc_scan 2-tuple [{N}]:   {chain_time(scan_mix, keys0) - t_mix:8.2f} ms", flush=True)

    # --- scatters (chain through the target array) -------------------------
    arena0 = jnp.zeros(CAP + 1 + N, jnp.uint32)
    uniq_idx = jnp.asarray(np.sort(rng.choice(CAP, N, replace=False)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1 << 8, N, dtype=np.uint32))

    @jax.jit
    def scat_add_unique(a):
        return a.at[uniq_idx].add(vals, unique_indices=True)

    print(f"scatter.add unique sorted [{N}]: {chain_time(scat_add_unique, arena0):8.2f} ms", flush=True)

    uniq_shuf = jnp.asarray(rng.permutation(np.asarray(uniq_idx)))

    @jax.jit
    def scat_add_unique_shuf(a):
        return a.at[uniq_shuf].add(vals, unique_indices=True)

    print(f"scatter.add unique shuffled [{N}]: {chain_time(scat_add_unique_shuf, arena0):8.2f} ms", flush=True)

    # realistic mostly-unique: ~6% duplicated ids (bench far-field profile)
    ids_dup = np.asarray(uniq_idx).copy()
    dup_sel = rng.choice(N, N // 16, replace=False)
    ids_dup[dup_sel] = rng.choice(ids_dup[: N // 32], N // 16)
    ids_dup = jnp.asarray(np.sort(ids_dup))

    @jax.jit
    def scat_add_dups(a):
        return a.at[ids_dup].add(vals)

    print(f"scatter.add ~6%-dup sorted [{N}]: {chain_time(scat_add_dups, arena0, iters=4):8.2f} ms", flush=True)

    # --- gathers ------------------------------------------------------------
    @jax.jit
    def gather_chain(a):
        g = a[uniq_shuf]
        return a.at[:1].add(g[:1])

    print(f"gather random [{N}] (+tiny scatter): {chain_time(gather_chain, arena0):8.2f} ms", flush=True)

    src0 = jnp.asarray(rng.integers(0, 255, (32768, 64), np.int32))
    ridx = jnp.asarray(rng.integers(0, 32768, 131072, dtype=np.int32))

    @jax.jit
    def rowgather_chain(s):
        g = s[ridx]  # [131072, 64]
        return s + g[:32768] * 0 + g[:1, :1]

    print(f"row gather [131072,64]:     {chain_time(rowgather_chain, src0):8.2f} ms", flush=True)

    # --- dense sweep ----------------------------------------------------------
    @jax.jit
    def sweep(a):
        x = a.astype(jnp.float32)
        return (x * 1.00001 + 1.0).astype(jnp.uint32)

    print(f"dense sweep [{CAP + 1 + N}]: {chain_time(sweep, arena0):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
