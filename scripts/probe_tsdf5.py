"""TSDF per-visit device-stage decomposition at bench shapes (round 5 s2).

Cumulative-stage timing of integrate_tsdf's per-visit pallas branch (same
methodology as probe_ndt5.py): stage cost = delta between consecutive rows.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
from ohm_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp

from ohm_tpu.core.map import OccupancyMap, MapFlag
from ohm_tpu.mapping.tsdf_map import TpuTsdfMap
from ohm_tpu.ops import blocked, deposit_pallas
from ohm_tpu.ops.integrate import _resolve_slots, _unpack_batch, group_rows
from ohm_tpu.ops.integrate_tsdf import integrate_tsdf
from ohm_tpu.ops.ddawalk import walk_rays_unordered
import bench as benchmod

print(f"devices: {jax.devices()}", flush=True)

rng = np.random.default_rng(2024)
m = OccupancyMap(resolution=0.1, flags=MapFlag.NONE)
mp = TpuTsdfMap(m, capacity=1024)
batches = [benchmod.box_scene_rays(8192, rng) for _ in range(8)]
mp.prime_caps(batches)
for b in batches[:5]:
    mp.integrate_rays(b)
float(jnp.ravel(mp.arena.arrays["tsdf_weight"])[0])

wire, base_cfg, n_rays = mp._rayflow_setup_host(batches[5], None, None, 0)
batch = {"rayw": jax.device_put(jnp.asarray(wire))}
from ohm_tpu.ops.integrate_tsdf import TsdfConfig
o = mp.options
cfg = TsdfConfig(
    base=base_cfg,
    max_weight=float(o.max_weight),
    default_truncation_distance=float(o.default_truncation_distance),
    dropoff_epsilon=float(o.dropoff_epsilon),
    sparsity_compensation_factor=float(o.sparsity_compensation_factor),
    per_visit=bool(o.per_visit),
)
base = cfg.base
arena = mp.arena.device_state()
print(f"cfg: group_cap={base.group_cap} max_steps={base.max_steps} "
      f"walk_cap={base.walk_cap} G={base.group_size} per_visit={cfg.per_visit}",
      flush=True)
trunc = jnp.float32(cfg.default_truncation_distance)


def stage_upto(name):
    def fn(arena, batch):
        b = _unpack_batch(batch, base)
        res = jnp.float32(base.resolution)
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
        end_flat, _ = _resolve_slots(b["end_abs"], b.get("rmin"),
                                     b.get("corner_slots"), base,
                                     tcand=b.get("tcand"), gmeta=b.get("gmeta"))
        end_active = (b["is_sample"] | b["end_as_miss"]) & ray_valid
        end_flat_masked = jnp.where(end_active, end_flat, base.sentinel)
        q_w = b["start_frac"][:, None, :] + (b["start_abs"][:, None, :] - walk["voxels"]).astype(jnp.float32) * res
        proj_w = jnp.sum(q_w * b["direction"][:, None, :], axis=-1)
        sdf_w = (b["full_length"] - b["t0"])[:, None] + proj_w
        q_e = b["start_frac"] + (b["start_abs"] - b["end_abs"]).astype(jnp.float32) * res
        sdf_e = (b["full_length"] - b["t0"]) + jnp.sum(q_e * b["direction"], axis=-1)
        w_w = rec_valid.astype(jnp.float32)
        w_e = end_active.astype(jnp.float32)
        if name == "resolve":
            return jnp.sum(walk_flat & 0xFF) + jnp.sum(sdf_w)
        walk_ids = walk_flat.reshape(-1)
        walk_wsdf = (w_w * sdf_w).reshape(-1)
        row_order = b.get("ray_order")
        ridx = jnp.broadcast_to(row_order[:, None], (B, S)).reshape(-1)
        G = base.group_size
        row_ops = [group_rows(walk_ids, B, S, G), group_rows(ridx, B, S, G),
                   group_rows(walk_wsdf, B, S, G)]
        sorted_rows = jax.lax.sort(tuple(row_ops), num_keys=1, dimension=1)
        walk_ids = sorted_rows[0][:, :base.group_cap].reshape(-1)
        ridx_c = sorted_rows[1][:, :base.group_cap].reshape(-1)
        walk_wsdf = sorted_rows[2][:, :base.group_cap].reshape(-1)
        if name == "rowsort":
            return jnp.sum(walk_ids & 0xFF) + jnp.sum(walk_wsdf)
        ids = jnp.concatenate([walk_ids, end_flat_masked])
        wsdf_all = jnp.concatenate([walk_wsdf, w_e * sdf_e])
        ridx_all = jnp.concatenate([ridx_c, row_order])
        ids_s, _, wsdf_s = jax.lax.sort((ids, ridx_all, wsdf_all), num_keys=2)
        w_s = (ids_s != base.sentinel).astype(jnp.float32)
        if name == "globalsort":
            return jnp.sum(ids_s & 0xFF) + jnp.sum(wsdf_s)
        first = jnp.concatenate([jnp.array([True]), ids_s[1:] != ids_s[:-1]])
        last = jnp.concatenate([ids_s[1:] != ids_s[:-1], jnp.array([True])])
        real_seg = ids_s != base.sentinel
        w0_s, d0_s = deposit_pallas.gather_planes_f32(
            (arena["tsdf_weight"], arena["tsdf_distance"]), ids_s, base)
        if name == "seedgather":
            return jnp.sum(w0_s) + jnp.sum(d0_s)
        s_w = blocked.segment_sums(w_s, first)
        w_run = w0_s + s_w
        wc_prev = jnp.minimum(w_run - w_s, jnp.float32(cfg.max_weight))
        new_w_vis = wc_prev + w_s
        alive_vis = new_w_vis >= jnp.float32(1e-5)
        fbig = jnp.float32(3.0e38)
        denom = jnp.where(alive_vis, new_w_vis, 1.0)
        a_map = jnp.where(alive_vis, wc_prev / denom, 1.0)
        b_map = jnp.where(alive_vis, wsdf_s / denom, 0.0)
        lo_map = jnp.where(alive_vis, -trunc, -fbig)
        hi_map = jnp.where(alive_vis, trunc, fbig)
        A, Bm, LO, HI = blocked.segment_compose_affine_clamp(
            a_map, b_map, lo_map, hi_map, first)
        d_k = jnp.minimum(jnp.maximum(A * d0_s + Bm, LO), HI)
        alive = w_run >= jnp.float32(1e-5)
        w_k = jnp.minimum(w_run, jnp.float32(cfg.max_weight))
        upd = last & alive & real_seg
        if name == "scans":
            return jnp.sum(jnp.where(upd, d_k, 0.0)) + jnp.sum(jnp.where(upd, w_k, 0.0))
        wv = jnp.where(upd, w_k, 0.0)
        dv = jnp.where(upd, d_k, 0.0)
        nw, nd = deposit_pallas.tsdf_set_deposit(
            arena["tsdf_weight"], arena["tsdf_distance"], ids_s, wv, dv, base)
        if name == "deposit":
            return jnp.sum(nw[:128]) + jnp.sum(nd[:128])
        raise ValueError(name)
    return jax.jit(fn)


STAGES = ["walk", "resolve", "rowsort", "globalsort", "seedgather", "scans",
          "deposit"]


def full_fn(arena, batch):
    new_arena, stats = integrate_tsdf(arena, batch, cfg)
    return (jnp.sum(new_arena["tsdf_weight"][:128])
            + stats["touched"].astype(jnp.float32))


full_jit = jax.jit(full_fn)

REPS = 8
rows = []
for name in STAGES + ["FULL"]:
    fn = full_jit if name == "FULL" else stage_upto(name)
    ok = False
    for attempt in range(3):
        try:
            t_c0 = time.perf_counter()
            float(fn(arena, batch))
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
    float(fn(arena, batch))
    t0 = time.perf_counter()
    acc = None
    for _ in range(REPS):
        acc = fn(arena, batch)
    float(acc)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    rows.append((name, dt))
    print(f"{name:12s} {dt:7.2f} ms  (compile {t_compile:.1f}s)", flush=True)

print("\nstage deltas:", flush=True)
prev = 0.0
for name, dt in rows:
    print(f"{name:12s} {dt:7.2f} ms   delta {dt - prev:+7.2f}", flush=True)
    if name != "FULL":
        prev = dt
