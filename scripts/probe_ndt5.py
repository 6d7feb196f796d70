"""NDT-OM device-stage decomposition at bench shapes (round 5, session 2).

Cumulative-stage timing of integrate_ndt's pallas branch on a REAL wire +
arena: each stage function re-runs everything up to and including its stage,
so stage cost = difference between consecutive rows (shared dispatch overhead
cancels).  Readback-fenced; chained reps.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from ohm_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from functools import partial

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.ndt_map import TpuNdtMap
from ohm_tpu.ops import ndt as ndtops
from ohm_tpu.ops import subvoxel_jnp, blocked, deposit_pallas
from ohm_tpu.ops.integrate import _resolve_slots, _unpack_batch, _unobserved, \
    _segment_reduce, _unique_scatter_indices, group_rows
from ohm_tpu.ops.integrate_ndt import integrate_ndt
from ohm_tpu.ops.ddawalk import walk_rays_unordered
import bench as benchmod

print(f"devices: {jax.devices()}", flush=True)

rng = np.random.default_rng(2024)
m = OccupancyMap(resolution=0.2, flags=MapFlag.NONE)
mp = TpuNdtMap(m, capacity=1024)
batches = [benchmod.box_scene_rays(8192, rng) for _ in range(8)]
mp.prime_caps(batches)
for b in batches[:5]:
    mp.integrate_rays(b)
float(jnp.ravel(mp.arena.arrays["occupancy"])[0])
print(f"warm: miss_k={mp.miss_k} group_cap={mp._cap_cache_rf}", flush=True)

wire, base_cfg, n_rays = mp._rayflow_setup_host(batches[5], None, None, 0)
batch = {"rayw": jax.device_put(jnp.asarray(wire))}
cfg = mp._ndt_config(0, base=base_cfg, n_segments=n_rays)
base = cfg.base
arena = mp.arena.device_state()
print(f"cfg: group_cap={base.group_cap} max_steps={base.max_steps} "
      f"walk_cap={base.walk_cap} miss_k={cfg.miss_k} G={base.group_size}", flush=True)


def stage_upto(name):
    """Build a jitted fn computing the pipeline up to `name`, returning a
    scalar checksum so nothing is DCE'd."""
    def fn(arena, batch):
        b = _unpack_batch(batch, base)
        walk = walk_rays_unordered(
            b["start_abs"], b["end_abs"], b["start_frac"],
            b["direction"], b["length"], base.resolution, base.max_steps)
        B, S = walk["valid"].shape
        ray_valid = b["valid"]
        rec_valid = walk["valid"] & ray_valid[:, None]
        if name == "walk":
            return (jnp.sum(jnp.where(rec_valid, walk["voxels"][..., 0], 0))
                    + jnp.sum(walk["exits"]))
        walk_flat, _ = _resolve_slots(walk["voxels"], b.get("rmin"),
                                      b.get("corner_slots"), base,
                                      tcand=b.get("tcand"), gmeta=b.get("gmeta"))
        walk_flat = jnp.where(rec_valid, walk_flat, base.sentinel)
        if name == "resolve":
            return jnp.sum(walk_flat & 0xFF)
        N = B * S
        flat_ids = walk_flat.reshape(-1)
        pos = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
        G = base.group_size
        ops = [group_rows(flat_ids, B, S, G), group_rows(pos, B, S, G)]
        ops = jax.lax.sort(tuple(ops), num_keys=1, dimension=1)
        ops = [o[:, :base.group_cap] for o in ops]
        ids_c = ops[0].reshape(-1)
        pos_c = ops[1].reshape(-1)
        if name == "rowsort":
            return jnp.sum(ids_c & 0xFF) + jnp.sum(pos_c & 0xFF)
        M = ids_c.shape[0]
        K = min(cfg.miss_k, M)
        sids, spos = jax.lax.sort((ids_c, pos_c), num_keys=1)
        if name == "flatsort":
            return jnp.sum(sids & 0xFF) + jnp.sum(spos & 0xFF)
        gauss8 = (~_unobserved(arena["occupancy"])
                  & (arena["mean_count"] >= cfg.sample_threshold)).astype(jnp.int8)
        is_ndt = deposit_pallas.gather_plane(gauss8, sids, base) > 0
        if name == "classify":
            return jnp.sum(is_ndt.astype(jnp.int32))
        seq = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0).squeeze(-1)
        sort_key = jnp.where(is_ndt, seq, seq + M)
        skey = jax.lax.sort((sort_key,), num_keys=1)[0][:K]
        active_k = skey < M
        sel_k = jnp.where(active_k, skey, skey - M)
        ids_k = jnp.where(active_k, sids[sel_k], base.sentinel)
        pos_k = spos[sel_k]
        if name == "select":
            return jnp.sum(ids_k & 0xFF) + jnp.sum(pos_k & 0xFF)
        vox_k = walk["voxels"].reshape(N, 3)[pos_k]
        if name == "voxgather":
            return jnp.sum(vox_k & 0xFF)
        ray_k = pos_k // S
        res = jnp.float32(base.resolution)
        start_abs_k = b["start_abs"][ray_k]
        end_abs_k = b["end_abs"][ray_k]
        sensor_k = b["start_frac"][ray_k] + (start_abs_k - vox_k).astype(jnp.float32) * res
        sample_k = b["end_frac"][ray_k] + (end_abs_k - vox_k).astype(jnp.float32) * res
        if name == "raygather":
            return jnp.sum(sensor_k) + jnp.sum(sample_k)
        cov_k = arena["cov"][ids_k]
        mean_k = subvoxel_jnp.sub_voxel_to_local_coord(
            arena["mean_coord"][ids_k], base.resolution)
        if name == "arenagather":
            return jnp.sum(cov_k) + jnp.sum(mean_k)
        delta_k, is_miss_k = ndtops.ndt_miss_delta(
            cov_k, sensor_k, sample_k, mean_k, cfg.adaptation_rate, cfg.sensor_noise)
        delta_k = jnp.where(active_k, delta_k, 0.0)
        is_miss_k = is_miss_k & active_k
        if name == "missmath":
            return jnp.sum(delta_k) + jnp.sum(is_miss_k.astype(jnp.int32))
        k_ops = [ids_k, delta_k, is_miss_k.astype(jnp.float32)]
        sorted_k = jax.lax.sort(tuple(k_ops), num_keys=1)
        kids, kdeltas, kmisses = sorted_k
        k_last, k_red = _segment_reduce(kids, [(kdeltas, "sum"), (kmisses, "sum")], base)
        k_idx = _unique_scatter_indices(kids, k_last, base)
        pending_delta = jnp.zeros(arena["occupancy"].shape, jnp.float32).at[k_idx].set(
            jnp.where(k_last, k_red[0], 0.0), unique_indices=True)
        if name == "deltascatter":
            return jnp.sum(pending_delta[:128])
        end_flat, _ = _resolve_slots(b["end_abs"], b.get("rmin"),
                                     b.get("corner_slots"), base,
                                     tcand=b.get("tcand"), gmeta=b.get("gmeta"))
        end_is_hit = b["is_sample"] & ray_valid
        end_any = end_is_hit | (b["end_as_miss"] & ray_valid)
        n_flag = jnp.sum(is_ndt.astype(jnp.int32))
        ndt_applied = jax.lax.cond(
            n_flag <= K, lambda: is_ndt,
            lambda: is_ndt & (blocked.cumsum(is_ndt.astype(jnp.int32))
                              - is_ndt.astype(jnp.int32) < K))
        std_miss_s = (sids != base.sentinel) & ~ndt_applied
        walk_keys = jnp.where(std_miss_s, sids << 1, base.sentinel << 1)
        end_keys = jax.lax.sort(
            ((jnp.where(end_any, end_flat, base.sentinel) << 1)
             | end_is_hit.astype(jnp.int32),), num_keys=1)[0]
        new_occ, touched = deposit_pallas.deposit_and_sweep_ndt(
            arena["occupancy"], walk_keys, pending_delta, base,
            bounds_key=sids << 1, key2_sorted=end_keys)
        if name == "deposit":
            return jnp.sum(new_occ[:128]) + touched.astype(jnp.float32)
        raise ValueError(name)
    return jax.jit(fn)


STAGES = ["walk", "resolve", "rowsort", "flatsort", "classify", "select",
          "voxgather", "raygather", "arenagather", "missmath",
          "deltascatter", "deposit"]


def full_fn(arena, batch):
    new_arena, stats = integrate_ndt(arena, batch, cfg)
    return jnp.sum(new_arena["occupancy"][:128]) + stats["touched"].astype(jnp.float32)


full_jit = jax.jit(full_fn)

REPS = 8
rows = []
for name in STAGES + ["FULL"]:
    fn = full_jit if name == "FULL" else stage_upto(name)
    ok = False
    for attempt in range(3):
        try:
            t_c0 = time.perf_counter()
            float(fn(arena, batch))  # compile + first run
            t_compile = time.perf_counter() - t_c0
            ok = True
            break
        except Exception as e:  # transient remote-compile drops
            print(f"{name}: compile attempt {attempt} failed: "
                  f"{str(e)[:120]}", flush=True)
            time.sleep(20)
    if not ok:
        rows.append((name, float("nan")))
        continue
    float(fn(arena, batch))  # warm
    t0 = time.perf_counter()
    acc = None
    for _ in range(REPS):
        acc = fn(arena, batch)
    float(acc)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    rows.append((name, dt))
    print(f"{name:14s} {dt:7.2f} ms  (compile {t_compile:.1f}s)", flush=True)

print("\nstage deltas:", flush=True)
prev = 0.0
for name, dt in rows:
    print(f"{name:14s} {dt:7.2f} ms   delta {dt - prev:+7.2f}", flush=True)
    if name != "FULL":
        prev = dt
