"""TpuRayMapper: the device ray integrator (reference analogue: GpuMap).

Drives the full per-batch pipeline (reference call stack:
ohmgpu/GpuMap.cpp:540-1190):
  host prep (filter/segment/quantise/pack, mapping.batch)
  -> host region allocation + corner-slot resolution (arena.ensure_regions;
     replaces walkRegions + GpuLayerCache::upload)
  -> jitted device integrate (ops.integrate: DDA + sort-reduce-scatter)
  -> deferred syncVoxels back to the host OccupancyMap.

The host is authoritative for region allocation, so device slot resolution
cannot miss (a non-zero `missed_updates` stat indicates a bug; asserted in
validation mode, mirroring the reference's OHM_VALIDATION builds).  The
arena analogue of the reference's cache-full flush-and-retry
(ohmgpu/GpuMap.cpp:922-1017) is split-batch-and-retry: a batch whose region
demand exceeds the arena capacity integrates as two half batches
(_integrate_with_retry).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ohm_tpu.core.layout import (
    MEAN_LAYER,
    TRAVERSAL_LAYER,
    TOUCH_TIME_LAYER,
    INCIDENT_NORMAL_LAYER,
)
from ohm_tpu.mapping.arena import VoxelArena
from ohm_tpu.mapping.batch import (
    prepare_ray_batch, fill_corner_slots, max_steps_for, build_wire)
from ohm_tpu.ops.integrate import (
    IntegrateConfig,
    integrate_occupancy_jit,
    expand_records_jit,
    apply_records_jit,
    apply_records_fused_jit,
    apply_delta_jit,
    apply_samples_jit,
    delta_path_ok,
)
from ohm_tpu.core.rayflags import RayFlag, normalize_reverse_walk


@jax.jit
def _split_rows(stacked):
    """Split a stacked multi-batch wire back into per-batch rows on device
    (one compiled program per stack shape; one dispatch per group)."""
    return tuple(stacked[k] for k in range(stacked.shape[0]))


class TpuRayMapper:
    """Occupancy (+ mean/traversal/touch/incident) ray integrator on TPU."""

    def __init__(
        self,
        map_obj,
        capacity: int = 1024,
        segment_length: float | None = None,
        validate: bool = False,
        scatter_pad: int = 1 << 22,
        scatter_cap: int | str = "auto",
        rayflow: bool | None = None,
        delta_path: bool = False,
        stream_budget: int | None = None,
    ):
        self.map = map_obj
        #: Resolution-aware batch sizing (_integrate_with_retry): a batch
        #: whose estimated record stream (total wall crossings) exceeds this
        #: is split in half before prep — long-ray outdoor scenes otherwise
        #: inflate the stream ~3x per ray into the runtime's super-linear
        #: regime.  None/0 disables; OHM_STREAM_BUDGET overrides the default.
        if stream_budget is None:
            import os as _os
            stream_budget = int(_os.environ.get("OHM_STREAM_BUDGET", 1 << 21))
        self.stream_budget = int(stream_budget)
        dims = map_obj.region_voxel_dims
        if not (dims[0] == dims[1] == dims[2]) or (dims[0] & (dims[0] - 1)) != 0:
            raise ValueError("TPU mapper requires cubic power-of-two region dims (e.g. 32)")
        self.region_shift = int(dims[0]).bit_length() - 1
        self.validate = validate

        region_edge = float(dims[0]) * map_obj.resolution
        self.segment_length = min(segment_length or region_edge * 0.999, region_edge * 0.999)
        self.max_steps = max_steps_for(self.segment_length, map_obj.resolution)

        layer_names = ["occupancy"]
        self.with_mean = map_obj.layer_index(MEAN_LAYER) >= 0
        self.with_traversal = map_obj.layer_index(TRAVERSAL_LAYER) >= 0
        self.with_touch = map_obj.layer_index(TOUCH_TIME_LAYER) >= 0
        self.with_incident = map_obj.layer_index(INCIDENT_NORMAL_LAYER) >= 0
        if self.with_mean:
            layer_names += ["mean_coord", "mean_count"]
        if self.with_traversal:
            layer_names.append("traversal")
        if self.with_touch:
            layer_names.append("touch_time")
        if self.with_incident:
            layer_names.append("incident")

        # The delta fast path needs the -0.0 unobserved encoding
        # (ops.integrate.apply_delta); every host<->device transfer converts.
        self.arena = VoxelArena(capacity, self.region_shift, layer_names,
                                scatter_pad=scatter_pad, occupancy_encoding="zero")
        #: Per-batch touched-voxel scatter budget for the COMPACTED deposit
        #: (ops.integrate._apply_occupancy_dense scatter_cap branch: voxel-
        #: last records pulled to the stream front by a payload-carrying i32
        #: sort, then one small sorted/unique/in-bounds scatter).  "auto"
        #: (default): the first batch runs the uncapped deposit, its
        #: touched-voxel count is read back once, and later batches use a
        #: monotone power-of-two cap at >=2x that count; overflow surfaces
        #: in stats['dropped_updates'].  0 disables; an int pins the cap.
        #: ``delta_path=True`` additionally routes eligible flag sets to the
        #: -0.0-encoded scatter-ADD delta pipeline (apply_delta) — opt-in:
        #: its x64-traced i64 compaction sort measured far slower than
        #: split-phase on this chip (round-3 probe; 124k vs 358k rays/s).
        self._auto_scatter = scatter_cap == "auto"
        self.scatter_cap = 0 if self._auto_scatter else int(scatter_cap)
        self.delta_path = bool(delta_path)
        #: Fused row-local apply (ops.integrate.apply_records_fused_jit):
        #: replaces the apply phase's two GLOBAL record sorts with one ROW
        #: sort over the expand phase's already-sorted compaction rows plus
        #: a duplicate-index integer scatter-add.  row_cap auto-sizes from
        #: the 'row_lasts_max' expand stat (readback on the sizing batch,
        #: 2x headroom, monotone pow2); batches before sizing — and batches
        #: whose segment count exceeds the 16-bit count-width gate — run the
        #: split-phase apply.  OHM_FUSED=0 disables; OHM_FUSED=2 FORCES the
        #: fused deposit even when the compaction-payoff gate says split is
        #: faster (differential tests use this to pin the fused kernel).
        import os as _os
        _fused_env = _os.environ.get("OHM_FUSED", "1")
        self.fused = _fused_env != "0"
        self._fused_force = _fused_env == "2"
        self.row_cap = 0
        self._row_cap_rays = 0
        #: Full-ray wire path (mapping.batch.prepare_rayflow): per-RAY
        #: records + device-side segmentation + per-ray candidate-region
        #: tables.  Falls back to the segmented wire when the native lib is
        #: missing or a batch exceeds the rayflow envelope (>32 regions on a
        #: ray, >63-region bbox extent, >65535 rays).  Default from
        #: OHM_RAYFLOW (the test suite pins the segmented path to bound CPU
        #: compile time; dedicated differentials cover rayflow).
        if rayflow is None:
            import os
            rayflow = os.environ.get("OHM_RAYFLOW", "1") != "0"
        self.rayflow = bool(rayflow)
        #: MXU one-hot matmul deposit (ops.deposit_pallas): the unique
        #: scatter + dense sweep replaced by a slot-grid Pallas kernel
        #: (2.8 vs 9.2 ms at bench shapes).  OHM_PALLAS: "1" (default) =
        #: compiled kernel when running on real TPU, "2" = interpret mode
        #: (differential tests on CPU), "0" = off.  Per-config gating
        #: (traversal payloads, V % 512) happens in apply_records.
        _pallas_env = _os.environ.get("OHM_PALLAS", "1")
        if _pallas_env == "2":
            self.pallas_deposit = 2
        elif _pallas_env == "0":
            self.pallas_deposit = 0
        else:
            self.pallas_deposit = 1 if jax.default_backend() == "tpu" else 0
        #: Fused expand kernel (ops.expand_pallas): rank walk + slot resolve
        #: in one VPU kernel instead of the [B, 3S]-intermediate XLA chain.
        #: OHM_EXPAND mirrors OHM_PALLAS ("1" default = compiled on TPU,
        #: "2" = interpret, "0" = off); applies on the rayflow wire only
        #: (expand_pallas.expand_eligible).
        _expand_env = _os.environ.get("OHM_EXPAND", "1")
        if _expand_env == "2":
            self.pallas_expand = 2
        elif _expand_env == "0":
            self.pallas_expand = 0
        else:
            self.pallas_expand = 1 if jax.default_backend() == "tpu" else 0
        self._config(0)  # validate int32 addressing headroom at construction
        self._stats = {"rays": 0, "segments": 0, "batches": 0, "missed_updates": 0,
                       "overflow": 0, "dropped_updates": 0, "compaction_dropped": 0}
        self._pending_stats = []
        self._worker = None
        self._queue = None
        self._worker_error = None

    def _group_cap(self, prepared) -> int:
        """Static record cap per 64-segment group for expand-phase compaction.

        The exact wall-crossing count of a segment is the L1 distance between
        its endpoint voxel coords (host already has them), so the cap is
        known to cover every group; quantised to 512s to bound the number of
        compiled program variants.
        """
        from ohm_tpu.ops.ddawalk import walk_total_cap

        G = 64
        ints = prepared.arrays["ints"]
        if len(ints) % G:
            return 0
        crossings = np.abs(ints[:, 3:6] - ints[:, 0:3]).sum(axis=1)
        # Strided grouping (ops.integrate.group_rows): row r holds segments
        # {r, r+R, ...}, i.e. crossings.reshape(G, R) column sums.
        gmax = int(crossings.reshape(G, -1).sum(axis=0).max())
        cap = max(256, -(-(gmax + 128) // 256) * 256)
        # Monotone per-mapper cache: a new cap means a new compiled program
        # variant, so grow sticky (with margin) instead of tracking each
        # batch exactly — otherwise cap jitter between batches recompiles
        # mid-run (observed: a bench timed region silently eating a compile).
        prev = getattr(self, "_cap_cache", 0)
        if cap <= prev:
            cap = prev
        else:
            self._cap_cache = cap
        return cap if cap < G * walk_total_cap(self.max_steps) else 0

    def prime_caps(self, batches) -> None:
        """Host-only pass seeding the monotone compile-shape caches (group
        cap, step bucket, walk cap, candidate-table K) to the maxima over
        ``batches`` — so a run over them compiles each program variant ONCE
        during warmup instead of recompiling at every new high-water mark
        mid-run (a silent 30-60 s stall per variant through the remote
        compile service).  Benchmarks call this before their warmup."""
        from ohm_tpu.mapping.batch import prepare_rayflow

        for rays in self._presplit_all(batches):
            rf = prepare_rayflow(self.map, rays)
            if rf is None:
                continue
            self._k_cache_rf = max(getattr(self, "_k_cache_rf", 4), rf.table_k)
            steps = -(-(rf.max_axis_steps + 1) // 32) * 32
            self._steps_cache_rf = max(getattr(self, "_steps_cache_rf", 0), steps)
            wcap = -(-(int(rf.crossings.max()) + 2) // 64) * 64 if rf.n_rays else 64
            self._wcap_cache_rf = max(getattr(self, "_wcap_cache_rf", 0), wcap)
            G, snake = self._rayflow_grouping(rf.rpad)
            cap = self._rayflow_group_cap(rf.crossings, G, snake)
            self._cap_cache_rf = max(getattr(self, "_cap_cache_rf", 0), cap)

    @staticmethod
    def _rayflow_grouping(rpad: int) -> tuple[int, bool]:
        """Strided group size G (OHM_RAYFLOW_G override; 8 when rpad doesn't
        divide) and snake-ordering flag — ONE source of truth shared by
        prime_caps and dispatch so priming seeds the caps the run will use."""
        import os
        G = int(os.environ.get("OHM_RAYFLOW_G", 64))
        if rpad % G:
            G = 8
        snake = os.environ.get("OHM_SNAKE", "1") != "0" and rpad % G == 0
        return G, snake

    @staticmethod
    def _rayflow_group_cap(crossings, G: int, snake: bool, perm=None) -> int:
        """Quantised per-group record cap for the strided compaction.

        Stream length = rows * cap drives the sort and the scatter (both
        ~linear).  Snake-balanced group sums sit within ~0.2% of the mean, so
        a 2% margin + 256-quantise suffices; the unbalanced path keeps ~6% +
        512 against batch-to-batch jitter (each new high-water mark is a new
        compiled program variant).  ``perm`` reuses a caller-computed snake
        permutation (the dispatch path computes it for the wire anyway)."""
        from ohm_tpu.mapping.batch import snake_perm

        if len(crossings) % G:
            return 0
        if snake and perm is None:
            perm = snake_perm(crossings, G)
        cr = crossings[perm] if snake else crossings
        gmax = int(cr.reshape(G, -1).sum(axis=0).max())
        if not gmax:
            return 0
        if snake:
            return max(512, -(-(gmax + max(128, gmax >> 6)) // 256) * 256)
        return max(512, -(-(gmax + max(256, gmax >> 4)) // 512) * 512)

    def _rayflow_setup(self, rays, timestamps, intensities, ray_update_flags):
        """Try the full-ray wire path; returns (batch dict, cfg, n_rays) or
        None to fall back to the segmented path.  See
        mapping.batch.prepare_rayflow / ops.integrate rayflow branch."""
        setup = self._rayflow_setup_host(rays, timestamps, intensities,
                                         ray_update_flags)
        if setup is None:
            return None
        wire, cfg, n_rays = setup
        return {"rayw": jnp.asarray(wire)}, cfg, n_rays

    def _rayflow_setup_host(self, rays, timestamps, intensities,
                            ray_update_flags, allow_evict: bool = True):
        """Host half of _rayflow_setup: returns (numpy wire, cfg, n_rays) or
        None, WITHOUT the device transfer — the coalesced submission path
        stacks several wires into one transfer (mapping.arena.NeedsEviction
        propagates when allow_evict=False and allocation would evict)."""
        from ohm_tpu.mapping.batch import (
            prepare_rayflow, rayflow_wire, snake_perm, frac_dict_of)

        if self.arena.capacity > 8191:
            # Candidate entries pack (slot+1) << 18 into an int32: slot+1 must
            # stay below 2^13 or the sign bit sets and _resolve_slots rejects
            # the (valid) match, silently dropping updates for high slots.
            return None
        rf = prepare_rayflow(self.map, rays, timestamps=timestamps,
                             intensities=intensities,
                             ray_update_flags=ray_update_flags,
                             min_table_k=getattr(self, "_k_cache_rf", 4))
        if rf is None:
            return None
        self._k_cache_rf = max(getattr(self, "_k_cache_rf", 4), rf.table_k)
        self.arena.ensure_regions(rf.region_keys, host_map=self.map,
                                  allow_evict=allow_evict)
        # Dictionary wire: candidate bytes drop 4K -> K per ray (u8 dict,
        # <= 255 regions) or 4K -> 2K (u16 dict, <= 2047 regions — e.g. the
        # box bench scene's ~320) — the tunnel is the steady-state wall at
        # ~27-40 MB/s.  Each variant is a single compiled program, so a
        # scene crossing a boundary costs one extra warmup compile, not
        # mid-run jitter.
        nreg = len(rf.region_keys)
        cdict = 1 if nreg <= 255 else (2 if nreg <= 2047 else 0)
        # Per-axis step bucket and candidate-table width K (monotone-cached;
        # each combination is a compiled program variant) and strided 8-ray
        # group cap, all exact from the host-quantised endpoint coords.
        steps = -(-(rf.max_axis_steps + 1) // 32) * 32
        self._steps_cache_rf = max(getattr(self, "_steps_cache_rf", 0), steps)
        # Walk truncation cap from the exact max TOTAL crossings (the
        # sqrt(3)*steps default under-caps diagonal full rays).
        wcap = -(-(int(rf.crossings.max()) + 2) // 64) * 64 if rf.n_rays else 64
        self._wcap_cache_rf = max(getattr(self, "_wcap_cache_rf", 0), wcap)
        # Large strided groups: per-group padding is the max-over-groups of a
        # sum of G near-iid per-ray crossing counts, so relative padding
        # shrinks ~1/sqrt(G).  Measured on the box bench scene: G=8 carried
        # 64% padding (224 rec/ray vs 137 true); G=64 cuts the stream ~1.4x
        # for a slightly wider (G*walk_cap) row sort.  Snake ordering
        # (crossings-balanced row permutation, mapping.batch.snake_perm)
        # puts the cap at the mean group sum, not the max.  G/snake/cap all
        # come from the shared helpers so prime_caps seeds what runs use.
        G, snake = self._rayflow_grouping(rf.rpad)
        perm = snake_perm(rf.crossings, G) if snake else None
        # start_frac dictionary (12 -> 1 B/ray): static-scan batches share
        # bit-identical start_frac triples; moving origins fall back to the
        # full float block (frac_dict_of returns None past 255 distinct).
        fdict = frac_dict_of(rf)
        wire = rayflow_wire(rf, self.arena.table,
                            with_touch=self.with_touch,
                            with_intensity=getattr(self, "_rayflow_intensity", False),
                            cdict=cdict, fdict=fdict, perm=perm)
        cap = self._rayflow_group_cap(rf.crossings, G, snake, perm=perm)
        self._cap_cache_rf = max(getattr(self, "_cap_cache_rf", 0), cap)
        cfg = self._config(ray_update_flags, group_cap=self._cap_cache_rf,
                           max_steps=self._steps_cache_rf, group_size=G,
                           table_k=rf.table_k, walk_cap=self._wcap_cache_rf,
                           rayw_cdict=cdict, rayw_fdict=fdict is not None)
        return wire, cfg, rf.n_rays

    def _auto_size_scatter_cap(self, stats, n_rays) -> None:
        """One-time readback sizing the compacted-deposit scatter window
        (2x headroom, monotone pow2; see the scatter_cap docstring).

        Sizes from the FOURTH batch, not the first: on an empty map nearly
        every record is a fresh voxel, so first-batch touched overshoots the
        steady state several-fold and the resulting cap lands past the
        stream length, silently disabling compaction (observed: TSDF bench
        auto-sized to 2M > the 1.3M stream).  Batches before sizing run the
        uncapped (exact, slower) deposit.  Shared by the TSDF/NDT mappers
        whose dispatch bypasses _dispatch."""
        if not (self._auto_scatter and (
                self.scatter_cap == 0 or n_rays > getattr(self, "_cap_rays", 0))):
            return
        if self.scatter_cap == 0 and self._stats["batches"] < 3:
            return
        t = int(stats["touched"])
        cap = 1 << 16
        while cap < 2 * t:
            cap *= 2
        self.scatter_cap = max(self.scatter_cap,
                               min(cap, self.arena.scatter_pad))
        self._cap_rays = n_rays

    def _fused_row_cap_for(self, n_segments: int, group_cap: int) -> int:
        """The fused two-level deposit's row_cap when eligible, else 0.

        ONE home for the gate (occupancy and NDT both route through it):
        OHM_FUSED on, row_cap sized and sized for >= this many segments, and
        the 16-bit packed-count width bounds — per-voxel totals are bounded
        by one record per segment (so n_segments <= 16384 keeps walk + end
        counts under 2^16) and per-row run counts by group_cap < 2^16.

        Compaction-payoff gate (round-4 hardware ablation, probe_apply8/9):
        the fused level-2 merge stream is rows*row_cap + ends vs the split
        sort's rows*group_cap + ends, so fused only pays when the per-row
        unique budget actually COMPACTS the rows.  On duplicate-sparse scenes
        (0.1 m box bench: ~63% of records are voxel-lasts) row_cap sizes past
        group_cap and fused measured 12.2 ms vs split 10.8 — route those to
        split-phase instead."""
        if (self.fused and self.row_cap > 0 and 0 < n_segments <= 16384
                and n_segments <= 2 * self._row_cap_rays
                and 0 < group_cap < (1 << 16)
                and (self.row_cap < group_cap or self._fused_force)):
            return self.row_cap
        return 0

    def _auto_size_row_cap(self, stats, n_rays) -> None:
        """Size the fused apply's per-row unique-voxel budget from the
        expand phase's 'row_lasts_max' stat (same policy as the scatter cap:
        skip the first three batches — an empty map overshoots the steady
        state — then 2x headroom, pow2, monotone).  The readback happens
        only on sizing batches; afterwards the stat stays on device.  The
        2x re-size trigger matches the cap's own headroom — segment counts
        jitter a few percent batch to batch on the segmented wire."""
        if not (self.fused and (
                self.row_cap == 0 or n_rays > 2 * self._row_cap_rays)):
            return
        if self.row_cap == 0 and self._stats["batches"] < 3:
            return
        m = int(stats.get("row_lasts_max", -1))
        if m < 0:
            return
        cap = 256
        while cap < 2 * m:
            cap *= 2
        self.row_cap = max(self.row_cap, cap)
        self._row_cap_rays = n_rays

    def _config(self, ray_flags: int, group_cap: int = 0,
                max_steps: int | None = None, group_size: int = 64,
                table_k: int = 0, walk_cap: int = 0,
                rayw_cdict: int = 0,
                rayw_fdict: bool = False) -> IntegrateConfig:
        rayw_intensity = getattr(self, "_rayflow_intensity", False)
        m = self.map
        return IntegrateConfig(
            resolution=float(m.resolution),
            region_shift=self.region_shift,
            capacity=self.arena.capacity,
            max_steps=self.max_steps if max_steps is None else max_steps,
            ray_flags=int(ray_flags),
            with_mean=self.with_mean,
            with_traversal=self.with_traversal,
            with_touch_time=self.with_touch,
            with_incident=self.with_incident,
            hit_value=float(np.float32(m.hit_value)),
            miss_value=float(np.float32(m.miss_value)),
            occupancy_threshold=float(np.float32(m.occupancy_threshold_value)),
            min_value=float(np.float32(m.min_voxel_value)),
            max_value=float(np.float32(m.max_voxel_value)),
            saturation_min=float(np.float32(m.saturation_min)),
            saturation_max=float(np.float32(m.saturation_max)),
            scatter_pad=self.arena.scatter_pad,
            zero_unobserved=True,
            scatter_cap=self.scatter_cap,
            group_cap=group_cap,
            group_size=group_size,
            table_k=table_k,
            walk_cap=walk_cap,
            rayw_intensity=rayw_intensity,
            rayw_cdict=rayw_cdict,
            rayw_fdict=rayw_fdict,
            unordered_walk=bool(group_cap) and not (
                int(ray_flags) & RayFlag.STOP_ON_FIRST_OCCUPIED),
            pallas_deposit=self.pallas_deposit,
            pallas_expand=self.pallas_expand,
        )

    def integrate_rays(self, rays, intensities=None, timestamps=None, ray_update_flags: int = 0) -> int:
        """Integrate interleaved origin/sample rays (2N, 3). Returns N.

        A batch whose region demand exceeds the arena capacity is split in
        half and retried (the arena analogue of the reference's cache-full
        flush-and-retry, ohmgpu/GpuMap.cpp:922-1017)."""
        ray_update_flags = normalize_reverse_walk(ray_update_flags)
        return self._integrate_with_retry(rays, intensities, timestamps, ray_update_flags)

    def _presplit_all(self, batches):
        """Apply the stream-budget split rule to a batch list (host-only) so
        cap priming sees the same shapes the run will dispatch."""
        out = []
        stack = [np.asarray(b, dtype=np.float64).reshape(-1, 3) for b in batches]
        stack.reverse()
        while stack:
            r = stack.pop()
            n = r.shape[0] // 2
            if self.stream_budget and n > 256:
                est = int(np.abs(r[1::2] - r[0::2]).sum() / self.map.resolution) + 3 * n
                if est > self.stream_budget:
                    h = n // 2
                    stack.append(r[2 * h:])
                    stack.append(r[: 2 * h])
                    continue
            out.append(r)
        return out

    def _split_and_integrate(self, rays, intensities, timestamps, ray_update_flags) -> int:
        """Integrate a batch as two half-batches (recursively)."""
        r = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
        n = r.shape[0] // 2
        h = n // 2

        def part(x, a, b):
            if x is None:
                return None
            x = np.asarray(x).reshape(-1)
            return x[a:b] if x.size == n else None

        total = self._integrate_with_retry(
            r[: 2 * h], part(intensities, 0, h), part(timestamps, 0, h),
            ray_update_flags)
        total += self._integrate_with_retry(
            r[2 * h:], part(intensities, h, n), part(timestamps, h, n),
            ray_update_flags)
        return total

    def _integrate_with_retry(self, rays, intensities, timestamps, ray_update_flags) -> int:
        from ohm_tpu.mapping.arena import CacheFull

        r = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
        n = r.shape[0] // 2
        if self.stream_budget and n > 256:
            # Resolution-aware batch sizing: the device record stream scales
            # with total WALL CROSSINGS (sum_i |delta_i|_1 / resolution), not
            # ray count, and long outdoor rays inflate it ~3x per ray — while
            # large streams run super-linearly slower on this runtime
            # (docs/STATUS.md: 32k-ray batches 230 ms vs 8k at 30 ms).  Split
            # until the estimated stream fits the budget; the estimate is a
            # numpy pass, no quantisation needed (exact within ~3/ray).
            est = int(np.abs(r[1::2] - r[0::2]).sum() / self.map.resolution) + 3 * n
            if est > self.stream_budget:
                return self._split_and_integrate(r, intensities, timestamps,
                                                 ray_update_flags)
        try:
            return self._integrate_batch(r, intensities, timestamps, ray_update_flags)
        except CacheFull:
            if n <= 1:
                raise
            return self._split_and_integrate(r, intensities, timestamps,
                                             ray_update_flags)

    def _integrate_batch(self, rays, intensities=None, timestamps=None, ray_update_flags: int = 0) -> int:
        m = self.map
        m.touch()
        if self.rayflow and not (ray_update_flags & RayFlag.STOP_ON_FIRST_OCCUPIED):
            setup = self._rayflow_setup(rays, timestamps, intensities, ray_update_flags)
            if setup is not None:
                batch, cfg, n_rays = setup
                return self._dispatch_rayflow(batch, cfg, n_rays, ray_update_flags)
        prepared = prepare_ray_batch(
            m, rays, timestamps=timestamps, intensities=intensities,
            ray_update_flags=ray_update_flags, segment_length=self.segment_length,
        )
        n_rays = np.asarray(rays).reshape(-1, 3).shape[0] // 2
        if prepared.n_segments == 0:
            return n_rays

        self.arena.ensure_regions(prepared.region_keys, host_map=m)
        fill_corner_slots(prepared, self.arena.table)

        dims0 = int(self.map.region_voxel_dims[0])
        if dims0 <= 32 and self.arena.capacity < 32767:
            # One packed transfer instead of five (each host->device array
            # costs a tunnel round trip); single C++ packing pass when built.
            batch = {"wire": jnp.asarray(build_wire(
                prepared, dims0, with_mean=self.with_mean, with_tsdf=False,
                with_touch=self.with_touch))}
        else:
            batch = {k: jnp.asarray(v) for k, v in prepared.arrays.items()}
        stop = bool(ray_update_flags & RayFlag.STOP_ON_FIRST_OCCUPIED)
        cfg = self._config(ray_update_flags,
                           group_cap=0 if stop else self._group_cap(prepared))
        return self._dispatch(batch, cfg, n_rays, prepared.n_segments, ray_update_flags)

    def _dispatch_rayflow(self, batch, cfg, n_rays, ray_update_flags) -> int:
        """Dispatch one prepared rayflow batch (wire already on device).

        The hook the coalesced submission path (_integrate_group) drives;
        the NDT/TSDF mappers override it with their own program sets."""
        return self._dispatch(batch, cfg, n_rays, n_rays, ray_update_flags)

    def _dispatch(self, batch, cfg, n_rays, n_segments, ray_update_flags) -> int:
        """Run the jitted integrate on a prepared device batch (segmented wire
        or rayflow) and adopt the new arena state."""
        stop = bool(ray_update_flags & RayFlag.STOP_ON_FIRST_OCCUPIED)
        # OHM_MONOLITH=1: route everything through the single-program
        # pipeline (one dispatch/batch instead of two) — an A/B lever for
        # re-measuring dispatch overhead; round-2 measured the monolith
        # slightly slower on-device, but the wire and apply have since
        # changed shape.
        import os as _os
        if _os.environ.get("OHM_MONOLITH", "0") == "1":
            stop = True
        state = self.arena.device_state()
        # Auto-capped delta routing: a batch with more rays than the one
        # that sized the cap falls back to split-phase (and re-sizes the cap
        # from its own touched count) — the 4x headroom only covers scene
        # drift, not systematic batch growth.
        delta_ok = self.delta_path and delta_path_ok(cfg) and not (
            self._auto_scatter and n_rays > getattr(self, "_cap_rays", 0))
        if stop:
            # State-dependent prefix masking needs the monolithic pipeline.
            new_state, stats = integrate_occupancy_jit(state, batch, cfg)
        elif delta_ok:
            # Delta fast path: sort + blocked-cummax reduce + compaction sort
            # + one sorted scatter-add (ops.integrate.apply_delta).  Internal
            # i64 keys need x64 tracing; inputs/outputs stay i32/f32.
            records, stats = expand_records_jit(batch, cfg)
            with jax.enable_x64(True):
                occ, dstats = apply_delta_jit(state["occupancy"], records["key"], cfg)
            new_state = dict(state)
            new_state["occupancy"] = occ
            if self.with_mean or self.with_touch or self.with_incident:
                rest = {k: v for k, v in new_state.items() if k != "occupancy"}
                rest = apply_samples_jit(rest, records, batch, cfg)
                new_state.update(rest)
            stats = dict(stats)
            stats.update(dstats)
        else:
            # Split-phase: two smaller XLA programs compile reliably through
            # the remote TPU compile service and hit the persistent cache.
            records, stats = expand_records_jit(batch, cfg)
            self._auto_size_row_cap(stats, n_segments)
            rc = self._fused_row_cap_for(n_segments, cfg.group_cap)
            if rc:
                import dataclasses as _dc
                fcfg = _dc.replace(cfg, row_cap=rc)
                new_state, touched, dropped = apply_records_fused_jit(
                    state, records, batch, fcfg)
            else:
                new_state, touched, dropped = apply_records_jit(state, records, batch, cfg)
            stats = dict(stats)
            stats["touched"] = touched
            stats["dropped_updates"] = dropped
            if not stop:
                self._auto_size_scatter_cap({"touched": touched}, n_rays)
        self.arena.update_state(new_state)

        self._stats["rays"] += n_rays
        self._stats["segments"] += n_segments
        self._stats["batches"] += 1
        self._pending_stats.append(stats)
        if self.validate:
            self._drain_stats()
            assert self._stats["missed_updates"] == 0, "device slot resolution missed — host allocation bug"
            assert self._stats["overflow"] == 0, "DDA step cap exceeded — segmentation bug"
            assert self._stats["dropped_updates"] == 0, \
                "scatter_cap exceeded — raise TpuRayMapper(scatter_cap=...)"
            assert self._stats["compaction_dropped"] == 0, \
                "group compaction dropped live records — host group_cap bug"
        return n_rays

    # ------------------------------------------------------------------ #
    # Pipelined submission: a single worker thread runs the host half
    # (prepare/allocate/pack/transfer/dispatch) of batch i+1 while the
    # device crunches batch i — the analogue of the reference's
    # double-buffered uploads (ohmgpu/GpuMap.cpp:878, GpuMapDetail.h:80).
    # Ordering is preserved (one worker, FIFO queue); sync_voxels drains.
    #
    # Coalesced transfers: each tunnel transfer costs ~2-3 ms of fixed
    # latency on top of the bandwidth term (docs/STATUS.md transfer model),
    # so the worker drains up to OHM_COALESCE queued batches, preps their
    # rayflow wires host-side, ships them as ONE stacked device_put and
    # splits rows back out on device (one jit per stack shape).  Eviction
    # is forbidden while a group is pending — a wire already packed for a
    # pending batch references arena slots by number, and an eviction for
    # a later batch could reassign them (arena.NeedsEviction flushes the
    # group first).  Batches that cannot join (segmented fallback, STOP
    # flag, stream-budget presplit, capacity pressure, shape change) flush
    # the group and run the plain path, preserving order.

    def integrate_rays_async(self, rays, intensities=None, timestamps=None,
                             ray_update_flags: int = 0) -> int:
        """Queue a ray batch; host prep overlaps device execution."""
        ray_update_flags = normalize_reverse_walk(ray_update_flags)
        if self._worker is None:
            import os
            import queue
            import threading

            coalesce = int(os.environ.get("OHM_COALESCE", "4"))
            self._coalesce = coalesce
            self._queue = queue.Queue(maxsize=max(4, coalesce))
            self._worker_error = None

            def _loop():
                done = False
                while not done:
                    items = [self._queue.get()]
                    while coalesce > 1 and len(items) < coalesce:
                        try:
                            items.append(self._queue.get_nowait())
                        except queue.Empty:
                            break
                    if items[-1] is None:
                        done = True
                        items.pop()
                    if items:
                        try:
                            self._integrate_group(items)
                        except BaseException as e:  # surfaced on sync/drain
                            self._worker_error = e
                        for _ in items:
                            self._queue.task_done()
                if done:
                    self._queue.task_done()  # the sentinel

            self._worker = threading.Thread(target=_loop, daemon=True)
            self._worker.start()
        self._queue.put((rays, intensities, timestamps, ray_update_flags))
        return np.asarray(rays).reshape(-1, 3).shape[0] // 2

    def _integrate_group(self, items) -> None:
        """Integrate a list of queued batches, coalescing consecutive
        same-shape rayflow wires into single stacked transfers."""
        from ohm_tpu.mapping.arena import CacheFull, NeedsEviction

        pending = []  # (wire np.uint8[L], cfg, n_rays, flags)

        def flush():
            if not pending:
                return
            if len(pending) == 1:
                wire, cfg, n_rays, fl = pending[0]
                self._dispatch_rayflow({"rayw": jnp.asarray(wire)}, cfg,
                                       n_rays, fl)
            elif self._chain_cfg(pending) is not None:
                # Chained mega-dispatch: ONE compiled program runs
                # expand+apply for the whole group (ops.integrate.
                # integrate_chain) — each dispatch RPC costs ~5 ms through
                # the tunnel (docs/PERF.md round-4 decomposition), so the
                # group's 2K+1 dispatches collapse to 1.  Bit-identical to
                # the per-batch programs (same stage functions, same order).
                self._dispatch_chain(pending)
            else:
                stacked = np.stack([p[0] for p in pending])
                rows = _split_rows(jnp.asarray(stacked))
                for row, (_, cfg, n_rays, fl) in zip(rows, pending):
                    self._dispatch_rayflow({"rayw": row}, cfg, n_rays, fl)
            pending.clear()

        for rays, intensities, timestamps, fl in items:
            r = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
            n = r.shape[0] // 2
            presplit = False
            if self.stream_budget and n > 256:
                est = int(np.abs(r[1::2] - r[0::2]).sum() / self.map.resolution) + 3 * n
                presplit = est > self.stream_budget
            if (not self.rayflow or presplit
                    or (fl & RayFlag.STOP_ON_FIRST_OCCUPIED)):
                flush()
                self._integrate_with_retry(r, intensities, timestamps, fl)
                continue
            self.map.touch()
            try:
                setup = self._rayflow_setup_host(
                    r, timestamps, intensities, fl,
                    allow_evict=not pending)
            except NeedsEviction:
                flush()
                try:
                    setup = self._rayflow_setup_host(r, timestamps,
                                                     intensities, fl)
                except CacheFull:
                    self._split_and_integrate(r, intensities, timestamps, fl)
                    continue
            except CacheFull:
                flush()
                self._split_and_integrate(r, intensities, timestamps, fl)
                continue
            if setup is None:  # segmented/filtered fallback path
                flush()
                self._integrate_with_retry(r, intensities, timestamps, fl)
                continue
            wire, cfg, n_rays = setup
            if pending and wire.shape != pending[0][0].shape:
                flush()
            pending.append((wire, cfg, n_rays, fl))
        flush()

    def _chain_cfg(self, pending):
        """Return the single chain IntegrateConfig (row_cap resolved) when the
        pending group is eligible for the chained mega-dispatch, else None.

        Eligibility: base-class dispatch only (NDT/TSDF mappers override
        _dispatch_rayflow with their own program sets), OHM_CHAIN=1 (default),
        no delta/monolith routing, identical cfgs across the group, FULL
        groups only (the chain program is shape-specialised on the group
        size K; straggler groups of other sizes would each pay a fresh
        multi-second remote compile/load — measured ~4 s first-dispatch even
        with the persistent cache (scripts/probe_async.py) — so they take
        the cheap stacked-split route instead), and the deposit windows
        already sized (the chain returns summed stats, so the per-batch
        sizing readbacks must be over)."""
        import os as _os
        if (_os.environ.get("OHM_CHAIN", "1") == "0"
                or _os.environ.get("OHM_MONOLITH", "0") == "1"
                or type(self)._dispatch_rayflow is not TpuRayMapper._dispatch_rayflow
                or self.delta_path):
            return None
        if len(pending) != getattr(self, "_coalesce", len(pending)):
            return None
        cfg0 = pending[0][1]
        # cfg equality covers the per-ray update flags too (cfg.ray_flags).
        if any(p[1] != cfg0 for p in pending[1:]):
            return None
        if self.fused:
            if self.row_cap == 0:
                return None  # fused sizing readbacks still pending
            rcs = {self._fused_row_cap_for(p[2], cfg0.group_cap) for p in pending}
            if len(rcs) != 1:
                return None
            rc = rcs.pop()
            if rc > 0:
                import dataclasses as _dc
                return _dc.replace(cfg0, row_cap=rc)
            # rc == 0 with row_cap sized: the compaction-payoff gate chose
            # split-phase — chain the split pipeline (row_cap stays 0).
        if self._auto_scatter and self.scatter_cap == 0:
            return None  # scatter window not sized yet
        return cfg0

    def _dispatch_chain(self, pending) -> None:
        """One stacked transfer + ONE chained program for the whole group."""
        from ohm_tpu.ops.integrate import integrate_chain_jit

        cfg = self._chain_cfg(pending)
        stacked = jnp.asarray(np.stack([p[0] for p in pending]))
        state = self.arena.device_state()
        new_state, stats = integrate_chain_jit(state, stacked, cfg, len(pending))
        self.arena.update_state(new_state)
        for _, _, n_rays, _ in pending:
            self._stats["rays"] += n_rays
            self._stats["segments"] += n_rays
            self._stats["batches"] += 1
        self._pending_stats.append(stats)
        if self.validate:
            self._drain_stats()
            assert self._stats["missed_updates"] == 0
            assert self._stats["overflow"] == 0
            assert self._stats["dropped_updates"] == 0
            assert self._stats["compaction_dropped"] == 0

    def flush(self):
        """Wait for all queued batches to be submitted to the device."""
        if self._worker is not None:
            self._queue.join()
            if self._worker_error is not None:
                err, self._worker_error = self._worker_error, None
                raise err

    def _drain_stats(self):
        new_drops = 0
        new_ndt_overflow = 0
        max_batch_overflow = 0
        for stats in self._pending_stats:
            self._stats["missed_updates"] += int(stats["missed_updates"])
            self._stats["overflow"] += int(stats["overflow"])
            if "dropped_updates" in stats:
                d = int(stats["dropped_updates"])
                self._stats["dropped_updates"] += d
                new_drops += d
            if "compaction_dropped" in stats:
                self._stats["compaction_dropped"] += int(stats["compaction_dropped"])
            if "ndt_overflow" in stats:
                v = int(stats["ndt_overflow"])
                self._stats["ndt_overflow"] = self._stats.get("ndt_overflow", 0) + v
                new_ndt_overflow += v
                max_batch_overflow = max(max_batch_overflow, v)
        self._pending_stats.clear()
        if (new_ndt_overflow and getattr(self, "_miss_k_sized", False)
                and self.miss_k < 1 << 16):
            # Auto-sized miss-phase K overflowed: the extra flagged records
            # degraded to standard misses (counted).  Escalate ONE-SHOT to
            # 2x the worst observed demand (old K + that batch's overflow),
            # not by doubling — a densifying scene (the flagged count grows
            # as the map fills) can exceed the 4th-batch sizing by 100x, and
            # each escalation step is a fresh shape-specialised compile
            # (measured: a 1M-ray NDT-TM frame overflowed a K=4096 window by
            # 410k records; stepwise doubling would recompile ~7 times).
            k = self.miss_k
            while k < 2 * (self.miss_k + max_batch_overflow) and k < 1 << 16:
                k *= 2
            self.miss_k = k
            import logging
            logging.getLogger("ohm_tpu").warning(
                "NDT miss-phase K overflow (%d records, worst batch %d); "
                "escalating miss_k to %d",
                new_ndt_overflow, max_batch_overflow, self.miss_k)
        if new_drops:
            # Scene drift past the auto-sized windows (same-size batches with
            # more touched voxels, e.g. moving indoors -> outdoors).  The
            # dropped batches lost their over-window voxel-lasts (reference
            # GpuLayerCache degrades the same way under pressure); escalate
            # the windows so SUBSEQUENT batches stop dropping, and say so —
            # silence was the round-3 review finding.
            import logging
            esc = []
            if self._auto_scatter and 0 < self.scatter_cap < self.arena.scatter_pad:
                self.scatter_cap = min(self.scatter_cap * 2, self.arena.scatter_pad)
                esc.append(f"scatter_cap->{self.scatter_cap}")
            if self.row_cap:
                self.row_cap *= 2
                esc.append(f"row_cap->{self.row_cap}")
            logging.getLogger("ohm_tpu").warning(
                "integrate dropped %d voxel updates (deposit window exceeded); "
                "escalating %s", new_drops, ", ".join(esc) or "nothing (pinned caps)")

    def sync_voxels(self):
        """Flush device voxel state into the host OccupancyMap (GpuMap::syncVoxels)."""
        self.flush()
        jax.block_until_ready(self.arena.arrays["occupancy"])
        self._drain_stats()
        self.arena.sync_to_host(self.map, stamp=self.map.stamp)

    @property
    def stats(self) -> dict:
        self.flush()
        self._drain_stats()
        return dict(self._stats)
