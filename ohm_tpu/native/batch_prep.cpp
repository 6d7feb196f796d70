// Native host-side ray batch preparation.
//
// C++ implementation of the per-batch hot path otherwise performed in numpy
// (ohm_tpu/mapping/batch.py): ray filtering, segmentation to region-edge
// pieces, float64 two-step voxel quantisation (reference: ohm/MapRegion.cpp
// voxelKey + ohm/MapCoord.h), voxel-local float32 frame construction
// (reference precision model: ohmgpu/GpuMap.cpp:666-676), corner-region
// enumeration, and region-table slot resolution (probe sequence must match
// ohm_tpu/ops/regiontable.py).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC batch_prep.cpp -o libbatchprep.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

namespace {

constexpr double kRegionEps = 1e-6;  // ohm/MapCoord.h:45-80

struct MapParams {
  double origin[3];
  double region_spatial[3];
  double resolution;
  int32_t region_dim;  // cubic power-of-two voxel dim
};

inline int32_t point_to_region(double coord, double region_size) {
  return (int32_t)std::floor(coord / region_size + 0.5);
}

inline int32_t point_to_region_voxel(double coord, double res, double region_size) {
  if (coord < 0 && coord >= -kRegionEps) coord = 0;
  else if (coord >= region_size && coord - kRegionEps < region_size) coord -= kRegionEps;
  return (int32_t)std::floor(coord / res);
}

// Two-step quantisation: point -> (region, local) -> absolute voxel coord +
// voxel centre (global), matching ohm_tpu.core.keys.voxel_key/voxel_centre.
inline void quantise(const MapParams& p, const double* pt, int32_t* abs_out,
                     double* centre_out) {
  for (int a = 0; a < 3; ++a) {
    const double local_pt = pt[a] - p.origin[a];
    const int32_t region = point_to_region(local_pt, p.region_spatial[a]);
    const double region_min = region * p.region_spatial[a] - 0.5 * p.region_spatial[a];
    int32_t local = point_to_region_voxel(local_pt - region_min, p.resolution, p.region_spatial[a]);
    if (local < 0) local = 0;
    if (local >= p.region_dim) local = p.region_dim - 1;
    abs_out[a] = region * p.region_dim + local;
    double centre = (double)region * p.region_spatial[a];
    centre -= 0.5 * p.region_spatial[a];
    centre += p.origin[a];
    centre += (double)local * p.resolution;
    centre += 0.5 * p.resolution;
    centre_out[a] = centre;
  }
}

// Walk ONE ray at region granularity (supercover DDA + grazing margins +
// endpoint wall-proximity margins), calling emit(r) for every candidate
// region the device's f32 voxel walk could visit.  Fills abs0/abs1 with the
// f64 two-step quantised endpoint voxel coords.  Returns false when emit
// aborts (global region cap overflow).  Used by rayflow_build.
template <class EmitFn>
inline bool walk_ray_regions(const MapParams& p, const double* s, const double* e,
                             int32_t* abs0, int32_t* abs1, double* c0,
                             EmitFn&& emit) {
  double c1[3];
  quantise(p, s, abs0, c0);
  quantise(p, e, abs1, c1);
  const int32_t dim = p.region_dim;
  int32_t r0[3], r1[3];
  for (int a = 0; a < 3; ++a) {
    r0[a] = abs0[a] >= 0 ? abs0[a] / dim : -(((-abs0[a]) + dim - 1) / dim);
    r1[a] = abs1[a] >= 0 ? abs1[a] / dim : -(((-abs1[a]) + dim - 1) / dim);
  }
  // Walk the voxel-space line at region granularity: supercover DDA over
  // region cells (includes diagonal neighbours at crossings, so every
  // voxel the f32 device walk can visit lies in an emitted region).
  double d[3] = {(double)(abs1[0] - abs0[0]), (double)(abs1[1] - abs0[1]),
                 (double)(abs1[2] - abs0[2])};
  int32_t cur[3] = {r0[0], r0[1], r0[2]};
  if (!emit(cur)) return false;
  const double len2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2];
  if (len2 > 0) {
    int32_t steps_total = 0;
    for (int a = 0; a < 3; ++a) steps_total += std::abs(r1[a] - r0[a]);
    // t in units of the voxel-coordinate line parameter [0, 1].
    double tnext[3], dt[3];
    int32_t stp[3];
    for (int a = 0; a < 3; ++a) {
      stp[a] = d[a] > 0 ? 1 : (d[a] < 0 ? -1 : 0);
      if (d[a] == 0) { tnext[a] = 2.0; dt[a] = 2.0; continue; }
      // voxel coordinate of next region wall in direction of travel
      const double wall = (double)(d[a] > 0 ? (cur[a] + 1) * dim : cur[a] * dim)
                          - 0.5;  // walls between voxel dim-1 and dim
      tnext[a] = (wall - (double)abs0[a]) / d[a];
      dt[a] = (double)dim / std::abs(d[a]);
    }
    for (int32_t k = 0; k < steps_total; ++k) {
      int ax = 0;
      if (tnext[1] < tnext[ax]) ax = 1;
      if (tnext[2] < tnext[ax]) ax = 2;
      const double t = tnext[ax];
      cur[ax] += stp[ax];
      tnext[ax] += dt[ax];
      if (!emit(cur)) return false;
      // Supercover margin: the device's f32 walk follows the continuous
      // ray, which deviates from this lattice chord by <= ~1 voxel (the
      // endpoint quantisation error interpolates linearly).  When the
      // crossing point is within 2 voxels of a wall on ANOTHER axis, the
      // deviated path may cross the two walls in the other order; emit
      // both the diagonal region AND the transposed-order intermediate
      // (this cell with the just-stepped axis un-stepped).
      int32_t near_db[3] = {0, 0, 0};
      for (int b = 0; b < 3; ++b) {
        if (b == ax || d[b] == 0) continue;
        const double vb = (double)abs0[b] + t * d[b];     // voxel coord
        const double fr = vb - (double)(cur[b] * dim);    // within region
        const int32_t db = fr < 1.5 ? -1 : (fr > (double)dim - 1.5 ? 1 : 0);
        if (db == 0) continue;
        near_db[b] = db;
        int32_t nb[3] = {cur[0], cur[1], cur[2]};
        nb[b] += db;
        if (!emit(nb)) return false;
        nb[ax] -= stp[ax];
        if (!emit(nb)) return false;
      }
      // Triple-corner case: BOTH other axes near a wall — transposed
      // orders can also visit the double-diagonal cells.
      if ((!!near_db[0] + !!near_db[1] + !!near_db[2]) == 2) {
        int32_t nb[3] = {cur[0] + near_db[0], cur[1] + near_db[1],
                         cur[2] + near_db[2]};
        if (!emit(nb)) return false;
        nb[ax] -= stp[ax];
        if (!emit(nb)) return false;
      }
    }
  }
  // Endpoint proximity margin: wall distance per axis is affine along the
  // ray, so its extremes are at the endpoints or at crossings (all checked
  // in the loop above).  Emit wall neighbours of the endpoint regions when
  // the endpoint voxel sits within 2 voxels of a region wall.
  const int32_t* epts[2] = {abs0, abs1};
  const int32_t* regs[2] = {r0, r1};
  for (int epi = 0; epi < 2; ++epi) {
    int32_t db[3] = {0, 0, 0};
    for (int b = 0; b < 3; ++b) {
      const double fr = (double)epts[epi][b] - (double)(regs[epi][b] * dim);
      db[b] = fr < 1.5 ? -1 : (fr > (double)dim - 1.5 ? 1 : 0);
    }
    // All wall-neighbour combinations (up to 7 when near a corner).
    for (int c = 1; c < 8; ++c) {
      if (((c & 1) && !db[0]) || ((c & 2) && !db[1]) || ((c & 4) && !db[2]))
        continue;
      int32_t nb[3] = {regs[epi][0] + ((c & 1) ? db[0] : 0),
                       regs[epi][1] + ((c & 2) ? db[1] : 0),
                       regs[epi][2] + ((c & 4) ? db[2] : 0)};
      if (!emit(nb)) return false;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Count segments per ray. Returns total segments.
// lengths/n_seg are per accepted ray (n entries).
int64_t count_segments(const double* starts, const double* ends, const uint8_t* accept,
                       int64_t n, double segment_length, int32_t* n_seg_out) {
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!accept[i]) { n_seg_out[i] = 0; continue; }
    double d2 = 0;
    for (int a = 0; a < 3; ++a) {
      const double d = ends[3 * i + a] - starts[3 * i + a];
      d2 += d * d;
    }
    const double len = std::sqrt(d2);
    int32_t s = (int32_t)std::ceil(len / segment_length);
    if (s < 1) s = 1;
    n_seg_out[i] = s;
    total += s;
  }
  return total;
}

// Fill packed per-segment arrays.  Layout must match
// ohm_tpu/ops/integrate.py (_unpack_batch):
//   ints  i32[size,17]: start_abs xyz | end_abs xyz | rmin xyz | corner_slots[8]
//   floats f32[size,12]: start_frac | direction | length | end_frac | t0 | full_len
//   flags u8[size,4]: is_sample | end_as_miss | exclude_start | valid
//   touch u32[size]
// corner_regions i32[total,8,3]; ray_index i32[total].
void fill_segments(const double* starts, const double* ends, const uint8_t* accept,
                   const uint32_t* filter_flags, const double* timestamps,
                   double time_base, int64_t n_rays, const int32_t* n_seg,
                   double segment_length, int sample_in_ray_flag,
                   const MapParams* params,
                   int32_t* ints, float* floats, uint8_t* flags, uint32_t* touch,
                   int32_t* corner_regions, int32_t* ray_index) {
  const MapParams p = *params;
  int64_t seg = 0;
  for (int64_t i = 0; i < n_rays; ++i) {
    if (!accept[i]) continue;
    const double* s = starts + 3 * i;
    const double* e = ends + 3 * i;
    double delta[3] = {e[0] - s[0], e[1] - s[1], e[2] - s[2]};
    const double len = std::sqrt(delta[0] * delta[0] + delta[1] * delta[1] + delta[2] * delta[2]);
    double unit[3] = {0, 0, 0};
    if (len > 0) { unit[0] = delta[0] / len; unit[1] = delta[1] / len; unit[2] = delta[2] / len; }
    const int32_t segments = n_seg[i];
    // kRffClippedEnd == 1 << 2 (ohm/RayFilter.h:28).
    const bool clipped_end = (filter_flags && (filter_flags[i] & 4u)) != 0;
    const bool fold_sample = clipped_end || sample_in_ray_flag;
    const uint32_t touch_enc = (timestamps && time_base >= 0)
        ? (uint32_t)((timestamps[i] - time_base) / 0.001) : 0u;

    for (int32_t k = 0; k < segments; ++k, ++seg) {
      const bool last = (k == segments - 1);
      const double t0 = k * segment_length;
      const double t1 = last ? len : (k + 1) * segment_length;
      double p0[3], p1[3];
      for (int a = 0; a < 3; ++a) {
        p0[a] = s[a] + unit[a] * t0;
        p1[a] = last ? e[a] : s[a] + unit[a] * t1;
      }
      int32_t abs0[3], abs1[3];
      double c0[3], c1[3];
      quantise(p, p0, abs0, c0);
      quantise(p, p1, abs1, c1);

      int32_t* I = ints + 17 * seg;
      float* F = floats + 12 * seg;
      uint8_t* G = flags + 4 * seg;
      int32_t rmin[3], rmax[3];
      for (int a = 0; a < 3; ++a) {
        I[a] = abs0[a];
        I[3 + a] = abs1[a];
        // floor-divide for negatives
        int32_t r0 = abs0[a] >= 0 ? abs0[a] / p.region_dim
                                  : -(((-abs0[a]) + p.region_dim - 1) / p.region_dim);
        int32_t r1 = abs1[a] >= 0 ? abs1[a] / p.region_dim
                                  : -(((-abs1[a]) + p.region_dim - 1) / p.region_dim);
        rmin[a] = std::min(r0, r1);
        rmax[a] = std::max(r0, r1);
        I[6 + a] = rmin[a];
        F[a] = (float)(p0[a] - c0[a]);
        F[3 + a] = (float)unit[a];
        F[7 + a] = (float)(p1[a] - c1[a]);
      }
      for (int c = 0; c < 8; ++c) {
        I[9 + c] = -1;
        int32_t* R = corner_regions + (seg * 8 + c) * 3;
        R[0] = (c & 1) ? rmax[0] : rmin[0];
        R[1] = (c & 2) ? rmax[1] : rmin[1];
        R[2] = (c & 4) ? rmax[2] : rmin[2];
      }
      F[6] = (float)(t1 - t0);
      F[10] = (float)t0;
      F[11] = (float)len;
      G[0] = last && !fold_sample;  // is_sample
      G[1] = last && fold_sample;   // end_as_miss
      G[2] = (k == 0);              // exclude_start candidate (first segment)
      G[3] = 1;                     // valid
      touch[seg] = touch_enc;
      ray_index[seg] = (int32_t)i;
    }
  }
}

// Region hash-table slot lookup; probe sequence mirrors
// ohm_tpu/ops/regiontable.py (hash_region/pack_ab, PROBE_DEPTH=8).
void lookup_slots(const int32_t* regions, int64_t n,
                  const int32_t* table_ab, const int32_t* table_z,
                  const int32_t* table_slot, int32_t table_size,
                  int32_t* slots_out) {
  const int32_t mask = table_size - 1;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t x = regions[3 * i + 0];
    const int32_t y = regions[3 * i + 1];
    const int32_t z = regions[3 * i + 2];
    const int32_t ab = (x & 0xFFFF) | (int32_t)((uint32_t)y << 16);
    int32_t h = (int32_t)((uint32_t)(x * 73856093) ^ (uint32_t)(y * 19349669)
                          ^ (uint32_t)(z * 83492791)) & mask;
    int32_t slot = -1;
    for (int k = 0; k < 8; ++k) {
      const int32_t idx = (h + k) & mask;
      if (table_slot[idx] >= 0 && table_ab[idx] == ab && table_z[idx] == z) {
        slot = table_slot[idx];
        break;
      }
    }
    slots_out[i] = slot;
  }
}

// Pack unique region keys: writes int64 packed keys for dedup on the Python
// side (numpy unique on int64 is the fast path there already); provided for
// completeness if callers want a single C pass.
void pack_regions(const int32_t* regions, int64_t n, int64_t* packed_out) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t x = regions[3 * i + 0] & 0xFFFF;
    const int64_t y = regions[3 * i + 1] & 0xFFFF;
    const int64_t z = regions[3 * i + 2] & 0xFFFF;
    packed_out[i] = x | (y << 16) | (z << 32);
  }
}

// Deduplicate region triples via an open-addressing hash set; one C pass
// replaces pack_region_key + np.unique + unpack_region_key (~5 ms/batch of
// the host prep budget at 8k rays on this host).  `out` must hold at least
// `cap` triples; returns the unique count, or -1 if it would exceed cap.
// table_size must be a power of two > expected uniques * 2.
int64_t unique_regions(const int32_t* regions, int64_t n, int32_t* out,
                       int64_t cap) {
  int64_t table_size = 1024;
  while (table_size < 4 * cap) table_size <<= 1;
  // Flat probe table of packed keys; 0x7FFFFFFFFFFFFFFF = empty.
  constexpr int64_t kEmpty = INT64_MAX;
  int64_t* table = new int64_t[table_size];
  for (int64_t i = 0; i < table_size; ++i) table[i] = kEmpty;
  const int64_t mask = table_size - 1;
  int64_t count = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int64_t x = (uint16_t)regions[3 * i + 0];
    const int64_t y = (uint16_t)regions[3 * i + 1];
    const int64_t z = (uint16_t)regions[3 * i + 2];
    const int64_t key = x | (y << 16) | (z << 32);
    uint64_t h = (uint64_t)key * 0x9E3779B97F4A7C15ull;
    int64_t idx = (int64_t)(h >> 32) & mask;
    for (;;) {
      if (table[idx] == key) break;
      if (table[idx] == kEmpty) {
        if (count >= cap) { delete[] table; return -1; }
        table[idx] = key;
        int32_t* o = out + 3 * count;
        o[0] = regions[3 * i + 0];
        o[1] = regions[3 * i + 1];
        o[2] = regions[3 * i + 2];
        ++count;
        break;
      }
      idx = (idx + 1) & mask;
    }
  }
  delete[] table;
  return count;
}

// One-pass compact wire packing (layout contract: mapping.batch.pack_wire /
// ops.integrate._unpack_batch).  Writes the single uint8 transfer buffer:
//   [floats f32 B*W | offs u32 B*2 | touch u32 B (optional) |
//    ints16 i16 B*11 | flags u8 B*4]  (caller pads to 4-byte multiple)
// ints layout: start_abs xyz | end_abs xyz | rmin xyz | corner_slots[8].
void compact_wire(const int32_t* ints, const float* floats, const uint8_t* flags,
                  const uint32_t* touch, int64_t b, int32_t region_dim,
                  int32_t width, int with_touch, uint8_t* out) {
  float* fout = (float*)out;
  for (int64_t i = 0; i < b; ++i) {
    const float* F = floats + 12 * i;
    float* O = fout + width * i;
    for (int32_t w = 0; w < width; ++w) O[w] = F[w];
  }
  uint32_t* offs = (uint32_t*)(out + 4 * width * b);
  for (int64_t i = 0; i < b; ++i) {
    const int32_t* I = ints + 17 * i;
    const uint32_t sx = (uint32_t)(I[0] - I[6] * region_dim);
    const uint32_t sy = (uint32_t)(I[1] - I[7] * region_dim);
    const uint32_t sz = (uint32_t)(I[2] - I[8] * region_dim);
    const uint32_t ex = (uint32_t)(I[3] - I[6] * region_dim);
    const uint32_t ey = (uint32_t)(I[4] - I[7] * region_dim);
    const uint32_t ez = (uint32_t)(I[5] - I[8] * region_dim);
    offs[2 * i + 0] = sx | (sy << 6) | (sz << 12);
    offs[2 * i + 1] = ex | (ey << 6) | (ez << 12);
  }
  uint8_t* next = (uint8_t*)(offs + 2 * b);
  if (with_touch) {
    std::memcpy(next, touch, 4 * b);
    next += 4 * b;
  }
  int16_t* i16 = (int16_t*)next;
  for (int64_t i = 0; i < b; ++i) {
    const int32_t* I = ints + 17 * i;
    int16_t* O = i16 + 11 * i;
    for (int k = 0; k < 11; ++k) O[k] = (int16_t)I[6 + k];
  }
  std::memcpy((uint8_t*)(i16 + 11 * b), flags, 4 * b);
}

// ---------------------------------------------------------------------------
// Fused rayflow prep (round 3).  The two-call legacy path (ray_regions then
// fill_rayflow) quantised every endpoint twice and left crossing counts and
// candidate packing to numpy; at 8k rays that put ~10 ms of host work on the
// ONE-core critical path between batches.  The fused path walks each ray
// exactly once:
//
//   rayflow_build  — region DDA + quantisation + wire blocks + crossings in
//                    a single pass (before region allocation);
//   rayflow_finish — after the Python side has allocated regions into the
//                    arena, resolves candidate slots against the arena hash
//                    table and assembles the complete transfer buffer
//                    (layout: mapping.batch wire docstring) in one pass.
//
// All state between the calls lives in caller-allocated numpy arrays — no
// opaque handles to leak.

// Single-pass build.  Returns the unique region count, or -1 when it would
// exceed region_cap.  Per-ray candidate-table overflow (> ray_k regions on
// one ray) is reported via ray_count[i] = -1; the caller falls back to the
// segmented wire.  stats_out: [0] max per-axis crossing count, [1] max total
// crossings, [2] max per-ray candidate count.
int64_t rayflow_build(const double* starts, const double* ends,
                      const uint32_t* filter_flags, const double* timestamps,
                      double time_base, const float* intensities,
                      int64_t n_rays, int sample_in_ray_flag,
                      const MapParams* params,
                      int32_t* regions_out, int64_t region_cap,
                      int32_t* bbox_out,
                      int32_t* ray_table, int32_t ray_k, int32_t* ray_count,
                      uint16_t* ray_cidx,
                      float* floats, int32_t* abs_i32, uint32_t* meta,
                      uint32_t* touch, float* intens, int32_t* crossings,
                      float* frac_dict, uint8_t* frac_idx,
                      int32_t* stats_out) {
  const MapParams p = *params;
  int64_t table_size = 1024;
  while (table_size < 4 * region_cap) table_size <<= 1;
  constexpr int64_t kEmpty = INT64_MAX;
  int64_t* table = new int64_t[table_size];
  int32_t* table_ord = new int32_t[table_size];  // batch ordinal per entry
  for (int64_t i = 0; i < table_size; ++i) table[i] = kEmpty;
  const int64_t mask = table_size - 1;
  int64_t count = 0;
  int32_t bmin[3] = {INT32_MAX, INT32_MAX, INT32_MAX};
  int32_t bmax[3] = {INT32_MIN, INT32_MIN, INT32_MIN};
  int32_t max_axis = 0, max_cross = 0, max_k = 0;

  // start_frac dictionary (12 -> 1 B/ray on the wire when <= 255 distinct
  // triples; mapping.batch.frac_dict_of semantics).  Tiny open-addressed
  // table over the 12-byte bit patterns; nearly free inside the build loop
  // (the numpy dedup cost ~3 ms/8k batch on the one-core host).
  constexpr int kFracBits = 10;
  constexpr int kFracSize = 1 << kFracBits;  // > 4 * 256 entries
  uint32_t frac_keys[kFracSize][3];
  int16_t frac_slot[kFracSize];
  for (int i = 0; i < kFracSize; ++i) frac_slot[i] = -1;
  int32_t n_frac = 0;  // sticks at 256 once overflowed
  auto frac_emit = [&](const float f[3]) -> uint8_t {
    if (n_frac > 255) return 0;
    uint32_t k[3];
    std::memcpy(k, f, 12);
    uint64_t h = ((uint64_t)k[0] * 0x9E3779B97F4A7C15ull)
                 ^ ((uint64_t)k[1] * 0xC2B2AE3D27D4EB4Full)
                 ^ ((uint64_t)k[2] * 0x165667B19E3779F9ull);
    int32_t idx = (int32_t)(h >> 32) & (kFracSize - 1);
    for (;;) {
      if (frac_slot[idx] >= 0 && frac_keys[idx][0] == k[0]
          && frac_keys[idx][1] == k[1] && frac_keys[idx][2] == k[2]) {
        return (uint8_t)frac_slot[idx];
      }
      if (frac_slot[idx] < 0) {
        if (n_frac >= 255) { n_frac = 256; return 0; }  // overflow marker
        frac_keys[idx][0] = k[0]; frac_keys[idx][1] = k[1];
        frac_keys[idx][2] = k[2];
        frac_slot[idx] = (int16_t)n_frac;
        std::memcpy(frac_dict + 3 * n_frac, f, 12);
        return (uint8_t)n_frac++;
      }
      idx = (idx + 1) & (kFracSize - 1);
    }
  };

  int32_t* cur_table = nullptr;
  uint16_t* cur_cidx = nullptr;
  int32_t cur_count = 0;
  auto ray_emit = [&](const int32_t r[3], int32_t ord) {
    if (cur_count < 0) return;
    for (int32_t j = 0; j < cur_count; ++j) {
      if (cur_cidx[j] == (uint16_t)ord) return;
    }
    if (cur_count >= ray_k) { cur_count = -1; return; }
    int32_t* t = cur_table + 3 * cur_count;
    t[0] = r[0]; t[1] = r[1]; t[2] = r[2];
    cur_cidx[cur_count] = (uint16_t)ord;
    ++cur_count;
  };
  auto emit = [&](const int32_t r[3]) -> bool {
    const int64_t key = (int64_t)(uint16_t)r[0] | ((int64_t)(uint16_t)r[1] << 16)
                        | ((int64_t)(uint16_t)r[2] << 32);
    uint64_t h = (uint64_t)key * 0x9E3779B97F4A7C15ull;
    int64_t idx = (int64_t)(h >> 32) & mask;
    for (;;) {
      if (table[idx] == key) break;
      if (table[idx] == kEmpty) {
        if (count >= region_cap) return false;
        table[idx] = key;
        table_ord[idx] = (int32_t)count;
        int32_t* o = regions_out + 3 * count;
        o[0] = r[0]; o[1] = r[1]; o[2] = r[2];
        for (int a = 0; a < 3; ++a) {
          if (r[a] < bmin[a]) bmin[a] = r[a];
          if (r[a] > bmax[a]) bmax[a] = r[a];
        }
        ++count;
        break;
      }
      idx = (idx + 1) & mask;
    }
    ray_emit(r, table_ord[idx]);
    return true;
  };

  for (int64_t i = 0; i < n_rays; ++i) {
    cur_table = ray_table + (int64_t)3 * ray_k * i;
    cur_cidx = ray_cidx + (int64_t)ray_k * i;
    cur_count = 0;
    const double* s = starts + 3 * i;
    const double* e = ends + 3 * i;
    int32_t abs0[3], abs1[3];
    double c0[3];
    if (!walk_ray_regions(p, s, e, abs0, abs1, c0, emit)) {
      delete[] table;
      delete[] table_ord;
      return -1;
    }
    ray_count[i] = cur_count;
    if (cur_count > max_k) max_k = cur_count;

    // Wire blocks (mapping.batch rayflow layout), absolute voxel coords —
    // the bbox-relative u16 conversion happens in rayflow_finish once the
    // batch bbox is final.
    double delta[3] = {e[0] - s[0], e[1] - s[1], e[2] - s[2]};
    const double len = std::sqrt(delta[0] * delta[0] + delta[1] * delta[1]
                                 + delta[2] * delta[2]);
    float* F = floats + 7 * i;
    int32_t* A = abs_i32 + 6 * i;
    int32_t cross = 0;
    for (int a = 0; a < 3; ++a) {
      F[a] = (float)(s[a] - c0[a]);
      F[3 + a] = (float)(len > 0 ? delta[a] / len : 0.0);
      A[a] = abs0[a];
      A[3 + a] = abs1[a];
      const int32_t d = std::abs(abs1[a] - abs0[a]);
      cross += d;
      if (d > max_axis) max_axis = d;
    }
    F[6] = (float)len;
    frac_idx[i] = frac_emit(F);
    crossings[i] = cross;
    if (cross > max_cross) max_cross = cross;
    const bool clipped_end = filter_flags && (filter_flags[i] & 4u);
    meta[i] = 1u | ((clipped_end || sample_in_ray_flag) ? 2u : 0u);
    touch[i] = (timestamps && time_base >= 0)
        ? (uint32_t)((timestamps[i] - time_base) / 0.001) : 0u;
    intens[i] = intensities ? intensities[i] : 0.0f;
  }
  delete[] table;
  delete[] table_ord;
  for (int a = 0; a < 3; ++a) {
    bbox_out[a] = count ? bmin[a] : 0;
    bbox_out[3 + a] = count ? bmax[a] : 0;
  }
  stats_out[0] = max_axis;
  stats_out[1] = max_cross;
  stats_out[2] = max_k;
  stats_out[3] = n_frac;  // 256 marks >255 distinct (fdict unavailable)
  return count;
}

// Assemble the complete rayflow transfer buffer.  wire_out must be
// pre-zeroed and sized 32 + rpad*(28 + 12 + 4 [+4 touch] [+4 intens] + 4*K)
// bytes; rows >= n_rays stay zero (valid bit 0, tcand 0).  Candidate slot
// resolution probes the arena hash table with the same sequence as
// lookup_slots / ops.regiontable; every candidate was emitted to the
// allocation set by rayflow_build, so lookups only miss if the caller
// skipped ensure_regions (such entries pack slot bits <= 0 and never
// resolve on device).
// dict_mode == 1 replaces the per-ray i32 candidate block with a per-BATCH
// 256-entry packed-candidate dictionary plus u8 indices (cidx) per ray —
// 4K -> K bytes/ray on the wire (the tunnel runs ~40 MB/s, so candidate
// bytes were ~60% of the transfer cost).  Requires n_regions <= 255; index
// 255 is the null entry (dict[255] = 0, never resolves on device).  The
// device reconstructs tcand = dict[cidx] bit-identically.
// dict_mode == 2 is the u16 variant: 2048 entries + u16 indices (2K B/ray),
// for batches touching 256..2047 regions (null index 2047).
void rayflow_finish(int64_t n_rays, int64_t rpad, int32_t ray_k, int32_t out_k,
                    const int32_t* bbox, const MapParams* params,
                    const float* floats, const int32_t* abs_i32,
                    const uint32_t* meta, const uint32_t* touch,
                    const float* intens,
                    const int32_t* ray_table, const int32_t* ray_count,
                    const uint16_t* ray_cidx,
                    const int32_t* regions, int64_t n_regions,
                    const int32_t* tab_ab, const int32_t* tab_z,
                    const int32_t* tab_slot, int32_t table_size,
                    int with_touch, int with_intensity, int dict_mode,
                    int frac_mode, const float* frac_dict,
                    const uint8_t* frac_idx,
                    const int32_t* perm, uint8_t* wire_out) {
  // perm (optional, length rpad): wire row i is filled from source ray
  // perm[i] — the crossings-balanced "snake" ordering that equalises the
  // strided compaction groups' record sums (group cap ~= mean instead of
  // max, ~18% less stream padding).  The source index rides in meta bits
  // 16+ so order-sensitive consumers (TSDF per-visit sequence, NDT sample
  // recursion) keep the ORIGINAL ray order regardless of the permutation.
  const int32_t dim = params->region_dim;
  const int32_t bmin_vox[3] = {bbox[0] * dim, bbox[1] * dim, bbox[2] * dim};
  uint8_t* w = wire_out;
  // gmeta i32[8]: bbox min region coords, rest zero.
  std::memcpy(w, bbox, 3 * sizeof(int32_t));
  w += 8 * sizeof(int32_t);
  // Float block: full (start_frac, dir, len) f32[R,7], or — frac_mode —
  // just (dir, len) f32[R,4] with start_frac dictionary-encoded (rays from
  // one sensor pose share a bit-identical start_frac triple; the caller
  // deduplicates and passes dict + per-ray u8 index when <= 255 distinct).
  float* fl = (float*)w;
  const int fw = frac_mode ? 4 : 7;
  for (int64_t i = 0; i < rpad; ++i) {
    const int64_t s = perm ? perm[i] : i;
    if (s >= n_rays) continue;  // wire pre-zeroed
    std::memcpy(fl + fw * i, floats + 7 * s + (7 - fw), fw * sizeof(float));
  }
  w += (size_t)rpad * fw * sizeof(float);
  // abs16 words carry the endpoint voxel coords (bbox-relative, <= 2047 =
  // 63 regions x 32 voxels, 11 bits) in their low bits and the former meta
  // word in the 4x5 spare high bits: word0 gets valid|fold (bits 11-12) +
  // source-ray-index bits 0-2, words 1-3 get index bits 3-15.  Saves the
  // 4 B/ray meta block off the wire (the tunnel is bandwidth-bound).
  uint16_t* a16 = (uint16_t*)w;
  for (int64_t i = 0; i < rpad; ++i) {
    const int64_t s = perm ? perm[i] : i;
    if (s >= n_rays) continue;
    const int32_t* A = abs_i32 + 6 * s;
    uint16_t* O = a16 + 6 * i;
    for (int a = 0; a < 3; ++a) {
      O[a] = (uint16_t)(A[a] - bmin_vox[a]);
      O[3 + a] = (uint16_t)(A[3 + a] - bmin_vox[a]);
    }
    const uint32_t order = (uint32_t)s;
    O[0] |= (uint16_t)(((meta[s] & 3u) | ((order & 7u) << 2)) << 11);
    O[1] |= (uint16_t)(((order >> 3) & 31u) << 11);
    O[2] |= (uint16_t)(((order >> 8) & 31u) << 11);
    O[3] |= (uint16_t)(((order >> 13) & 7u) << 11);
  }
  w += (size_t)rpad * 6 * sizeof(uint16_t);
  if (with_touch) {
    uint32_t* to = (uint32_t*)w;
    for (int64_t i = 0; i < rpad; ++i) {
      const int64_t s = perm ? perm[i] : i;
      to[i] = s < n_rays ? touch[s] : 0u;
    }
    w += (size_t)rpad * sizeof(uint32_t);
  }
  if (with_intensity) {
    float* io = (float*)w;
    for (int64_t i = 0; i < rpad; ++i) {
      const int64_t s = perm ? perm[i] : i;
      io[i] = s < n_rays ? intens[s] : 0.0f;
    }
    w += (size_t)rpad * sizeof(float);
  }
  if (frac_mode) {
    std::memcpy(w, frac_dict, 256 * 3 * sizeof(float));
    w += 256 * 3 * sizeof(float);
    uint8_t* fo = w;
    for (int64_t i = 0; i < rpad; ++i) {
      const int64_t s = perm ? perm[i] : i;
      fo[i] = s < n_rays ? frac_idx[s] : 0u;
    }
    w += (size_t)rpad;
  }
  const int32_t mask = table_size - 1;
  auto pack_cand = [&](const int32_t* r) -> int32_t {
    const int32_t x = r[0], y = r[1], z = r[2];
    const int32_t ab = (x & 0xFFFF) | (int32_t)((uint32_t)y << 16);
    int32_t h = (int32_t)((uint32_t)(x * 73856093) ^ (uint32_t)(y * 19349669)
                          ^ (uint32_t)(z * 83492791)) & mask;
    int32_t slot = -1;
    for (int k = 0; k < 8; ++k) {
      const int32_t idx = (h + k) & mask;
      if (tab_slot[idx] >= 0 && tab_ab[idx] == ab && tab_z[idx] == z) {
        slot = tab_slot[idx];
        break;
      }
    }
    return ((slot + 1) << 18)
           | (x - bbox[0]) | ((y - bbox[1]) << 6) | ((z - bbox[2]) << 12);
  };
  if (dict_mode == 2) {
    // u16 dictionary: 2048 packed-candidate entries + u16 indices — covers
    // batches touching 256..2047 regions (past the u8 dict) at 2K B/ray +
    // a fixed 8 KiB block instead of 4K B/ray.  Index 2047 is the null
    // entry (dict[2047] = 0, never resolves on device).
    int32_t* dict = (int32_t*)w;
    for (int32_t j = 0; j < 2048; ++j)
      dict[j] = j < n_regions ? pack_cand(regions + 3 * j) : 0;
    w += 2048 * sizeof(int32_t);
    uint16_t* cidx = (uint16_t*)w;
    for (int64_t i = 0; i < rpad * out_k; ++i) cidx[i] = 2047;
    for (int64_t i = 0; i < rpad; ++i) {
      const int64_t s = perm ? perm[i] : i;
      if (s >= n_rays) continue;
      const uint16_t* rc = ray_cidx + (int64_t)ray_k * s;
      uint16_t* ci = cidx + (int64_t)out_k * i;
      const int32_t kn = ray_count[s] < out_k ? ray_count[s] : out_k;
      for (int32_t j = 0; j < kn; ++j) ci[j] = rc[j];
    }
    return;
  }
  if (dict_mode) {
    int32_t* dict = (int32_t*)w;
    for (int32_t j = 0; j < 256; ++j)
      dict[j] = j < n_regions ? pack_cand(regions + 3 * j) : 0;
    w += 256 * sizeof(int32_t);
    uint8_t* cidx = w;
    std::memset(cidx, 0xFF, (size_t)rpad * out_k);  // 255 -> null entry
    for (int64_t i = 0; i < rpad; ++i) {
      const int64_t s = perm ? perm[i] : i;
      if (s >= n_rays) continue;
      const uint16_t* rc = ray_cidx + (int64_t)ray_k * s;
      uint8_t* ci = cidx + (int64_t)out_k * i;
      const int32_t kn = ray_count[s] < out_k ? ray_count[s] : out_k;
      for (int32_t j = 0; j < kn; ++j) ci[j] = (uint8_t)rc[j];
    }
    return;
  }
  int32_t* tcand = (int32_t*)w;
  for (int64_t i = 0; i < rpad; ++i) {
    const int64_t s = perm ? perm[i] : i;
    if (s >= n_rays) continue;
    const int32_t* rt = ray_table + (int64_t)3 * ray_k * s;
    int32_t* tc = tcand + (int64_t)out_k * i;
    const int32_t kn = ray_count[s] < out_k ? ray_count[s] : out_k;
    for (int32_t j = 0; j < kn; ++j) tc[j] = pack_cand(rt + 3 * j);
  }
}

}  // extern "C"
