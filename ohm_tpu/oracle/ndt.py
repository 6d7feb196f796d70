"""CPU oracle NDT (Normal Distributions Transform) ray mapper.

Exact behavioural port, in float64 with float32 storage, of:
- ohm/CovarianceVoxelCompute.h — packed triangular sqrt covariance, modified
  Gram-Schmidt rank-1 update (Maybeck 1978), sample likelihoods and the
  NDT-OM miss adjustment (Saarinen et al., eqs. 22-25, 28);
- ohm/RayMapperNdt.cpp — the NDT-OM / NDT-TM integration loop;
- ohm/NdtMap.cpp + private/NdtMapDetail.h — parameter defaults.

Used as ground truth for differential tests of the TPU NDT pipeline
(the reference compares its GPU NDT against this same CPU logic —
tests/ohmtestgpu/GpuNdtTests.cpp, tests/ohmtestcommon/CovarianceTestUtil).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ohm_tpu.core import keys as keymath
from ohm_tpu.core import subvoxel
from ohm_tpu.core.layout import (
    OCCUPANCY_LAYER,
    MEAN_LAYER,
    COVARIANCE_LAYER,
    TRAVERSAL_LAYER,
    INTENSITY_LAYER,
    HIT_MISS_COUNT_LAYER,
    TOUCH_TIME_LAYER,
    INCIDENT_NORMAL_LAYER,
)
from ohm_tpu.core.probability import probability_to_value
from ohm_tpu.core.rayflags import (RayFlag, RayFilterFlag,
                                   normalize_reverse_walk)
from ohm_tpu.oracle import linewalk

_UNOBSERVED = np.float32(np.inf)
_COV_KEYS = ("P00", "P01", "P11", "P02", "P12", "P22")


def ndt_adaptation_rate_from_miss_probability(miss_probability: float, scale: float = 2.0) -> float:
    """Reference: ohm/NdtMap.h:146-149."""
    return max(0.0, min(scale * (1.0 - 2.0 * miss_probability), 1.0))


@dataclasses.dataclass
class NdtParams:
    """NDT map parameters (reference: ohm/private/NdtMapDetail.h:21-45)."""

    sensor_noise: float = 0.05
    sample_threshold: int = 3
    adaptation_rate: float = 0.0  # 0 -> derive from miss probability
    reinitialise_covariance_threshold: float = float(probability_to_value(0.2))
    reinitialise_covariance_point_count: int = 100
    initial_intensity_covariance: float = 1.0
    ndt_tm: bool = False


def initialise_covariance(resolution: float) -> np.ndarray:
    """Seed sqrt covariance = 0.1 * res * I (ohm/CovarianceVoxelCompute.h:92-101)."""
    cov = np.zeros(6, dtype=np.float64)
    cov[0] = cov[2] = cov[5] = 0.1 * resolution
    return cov


def cov_sqrt_to_matrix(cov6) -> np.ndarray:
    """Packed lower-triangular sqrt [0;1 2;3 4 5] -> full covariance P = S S^T."""
    s = np.zeros((3, 3), dtype=np.float64)
    s[0, 0] = cov6[0]
    s[1, 0] = cov6[1]
    s[1, 1] = cov6[2]
    s[2, 0] = cov6[3]
    s[2, 1] = cov6[4]
    s[2, 2] = cov6[5]
    return s @ s.T


def _packed_dot(a9, j, k):
    """Reference: packedDot (ohm/CovarianceVoxelCompute.h:107-120)."""
    col_first = (0, 1, 3)
    m = j if j <= k else k
    d = a9[6 + k] * a9[6 + j]
    for i in range(m + 1):
        d += a9[col_first[j] + i] * a9[col_first[k] + i]
    return d


def solve_triangular(cov6, y):
    """Forward substitution on the packed sqrt matrix (ohm/CovarianceVoxelCompute.h:183-202)."""
    x0 = y[0] / cov6[0]
    x1 = (y[1] - cov6[1] * x0) / cov6[2]
    x2 = (y[2] - cov6[3] * x0 - cov6[4] * x1) / cov6[5]
    return np.array([x0, x1, x2], dtype=np.float64)


def calculate_sample_likelihoods(cov6, sensor, sample, voxel_mean, sensor_noise):
    """NDT likelihoods (ohm/CovarianceVoxelCompute.h:226-272).

    Returns (x_ML, p(x_ML | voxel gaussian), p(x_ML | sample)).
    """
    sensor_to_sample = sample - sensor
    sensor_ray = sensor_to_sample / np.linalg.norm(sensor_to_sample)
    mean_to_sensor = sensor - voxel_mean

    a = solve_triangular(cov6, sensor_ray)
    b_norm = solve_triangular(cov6, mean_to_sensor)
    t = -np.dot(a, b_norm) / np.dot(a, a)
    x_ml = sensor_ray * t + sensor

    sol = solve_triangular(cov6, x_ml - voxel_mean)
    p_given_voxel = math.exp(-0.5 * np.dot(sol, sol))
    noise_var = sensor_noise * sensor_noise
    d = x_ml - sample
    p_given_sample = math.exp(-0.5 * np.dot(d, d) / noise_var)
    return x_ml, p_given_voxel, p_given_sample


def calculate_hit_with_covariance(cov6, voxel_value, sample, voxel_mean, point_count, hit_value,
                                  resolution, reinit_threshold, reinit_count):
    """Gram-Schmidt sqrt covariance hit update (ohm/CovarianceVoxelCompute.h:301-370).

    Returns (new cov6, new value, reinitialised flag).
    """
    initial = np.float32(voxel_value)
    was_uncertain = initial == _UNOBSERVED
    reinitialised = False
    cov6 = np.array(cov6, dtype=np.float64)

    if point_count == 0 or (initial < reinit_threshold and point_count >= reinit_count):
        cov6 = initialise_covariance(resolution)
        reinitialised = True
        point_count = 0

    new_value = np.float32(hit_value) if was_uncertain else np.float32(hit_value) + initial

    sample_to_mean = (sample - voxel_mean) if not reinitialised else np.zeros(3)

    # unpackCovariance (ohm/CovarianceVoxelCompute.h:153-171)
    one_on = 1.0 / (point_count + 1.0)
    sc1 = math.sqrt(point_count * one_on) if point_count else 1.0
    sc2 = one_on * math.sqrt(point_count)
    a9 = np.zeros(9, dtype=np.float64)
    a9[:6] = sc1 * cov6
    a9[6:9] = sc2 * np.asarray(sample_to_mean, dtype=np.float64)

    new_cov = np.array(cov6, dtype=np.float64)
    for k in range(3):
        ind1 = (k * (k + 3)) >> 1
        indk = ind1 - k
        ak = math.sqrt(_packed_dot(a9, k, k))
        new_cov[ind1] = ak
        if ak > 0:
            aki = 1.0 / ak
            for j in range(k + 1, 3):
                indj = (j * (j + 1)) >> 1
                c = _packed_dot(a9, j, k) * aki
                new_cov[indj + k] = c
                c *= aki
                a9[j + 6] -= c * a9[k + 6]
                for ll in range(k + 1):
                    a9[indj + ll] -= c * a9[indk + ll]
    return new_cov, new_value, reinitialised


def calculate_miss_ndt(cov6, voxel_value, sensor, sample, voxel_mean, point_count,
                       miss_value, adaptation_rate, sensor_noise, sample_threshold):
    """NDT-OM miss adjustment (ohm/CovarianceVoxelCompute.h:508-637).

    Returns (new value (pre-clamp 'adjusted'), is_miss).
    """
    value = np.float32(voxel_value)
    if value == _UNOBSERVED:
        return np.float32(miss_value), True
    if point_count < sample_threshold:
        return value + np.float32(miss_value), True

    _, p_voxel, p_sample = calculate_sample_likelihoods(cov6, sensor, sample, voxel_mean, sensor_noise)
    scaling = 0.5 * adaptation_rate
    prod = p_voxel * (1.0 - p_sample)
    probability_update = 0.5 - scaling * prod
    is_miss = prod < scaling
    if probability_update == probability_update:  # NaN guard as in the reference
        value = value + np.float32(math.log(probability_update / (1.0 - probability_update)))
    return value, is_miss


def calculate_hit_miss_update_on_hit(cov6, voxel_value, hit_count, miss_count, sensor, sample,
                                     voxel_mean, point_count, params: NdtParams):
    """NDT-TM hit/miss consistency counts (ohm/CovarianceVoxelCompute.h:446-505)."""
    needs_reset = (np.float32(voxel_value) == _UNOBSERVED) or (
        point_count == 0
        or (np.float32(voxel_value) < params.reinitialise_covariance_threshold
            and point_count >= params.reinitialise_covariance_point_count)
    )
    initial_hit = 0 if needs_reset else hit_count
    initial_miss = 0 if needs_reset else miss_count
    _, p_voxel, p_sample = calculate_sample_likelihoods(cov6, sensor, sample, voxel_mean, params.sensor_noise)
    prod = p_voxel * p_sample
    eta = 0.5 * params.adaptation_rate
    inc_hit = needs_reset or point_count < params.sample_threshold or prod >= eta
    inc_miss = (not needs_reset) and point_count >= params.sample_threshold and prod < eta and p_voxel >= eta
    return initial_hit + (1 if inc_hit else 0), initial_miss + (1 if inc_miss else 0)


def calculate_intensity_update_on_hit(int_mean, int_cov, voxel_value, intensity_sample, point_count,
                                      params: NdtParams):
    """NDT-TM intensity stats (ohm/CovarianceVoxelCompute.h:383-412), f32 math."""
    needs_reset = point_count == 0 or (
        np.float32(voxel_value) < params.reinitialise_covariance_threshold
        and point_count >= params.reinitialise_covariance_point_count
    )
    delta = np.float32(int_mean) - np.float32(intensity_sample)
    n = np.float32(point_count)
    inv = np.float32(1.0) / (n + np.float32(1.0))
    if needs_reset:
        return np.float32(intensity_sample), np.float32(params.initial_intensity_covariance)
    new_mean = inv * (n * np.float32(int_mean) + np.float32(intensity_sample))
    new_cov = inv * (n * np.float32(int_cov) + inv * delta * delta)
    return new_mean, new_cov


class RayMapperNdt:
    """Sequential NDT-OM/NDT-TM integrator (reference: ohm/RayMapperNdt.cpp)."""

    def __init__(self, map_obj, params: NdtParams | None = None):
        self.map = map_obj
        self.params = params or NdtParams()
        if self.params.adaptation_rate <= 0:
            from ohm_tpu.core.probability import value_to_probability

            miss_p = float(value_to_probability(map_obj.miss_value))
            self.params.adaptation_rate = ndt_adaptation_rate_from_miss_probability(miss_p)
        lay = map_obj.layout
        lay.add_occupancy()
        lay.add_mean()
        lay.add_covariance()
        if self.params.ndt_tm:
            lay.add_intensity()
            lay.add_hit_miss_count()
        map_obj.ensure_chunk_layers()
        self.occupancy_layer = map_obj.layer_index(OCCUPANCY_LAYER)
        self.mean_layer = map_obj.layer_index(MEAN_LAYER)
        self.cov_layer = map_obj.layer_index(COVARIANCE_LAYER)
        self.traversal_layer = map_obj.layer_index(TRAVERSAL_LAYER)
        self.intensity_layer = map_obj.layer_index(INTENSITY_LAYER)
        self.hit_miss_layer = map_obj.layer_index(HIT_MISS_COUNT_LAYER)
        self.touch_time_layer = map_obj.layer_index(TOUCH_TIME_LAYER)
        self.incident_layer = map_obj.layer_index(INCIDENT_NORMAL_LAYER)

    def _read_cov(self, chunk, idx):
        arr = chunk.layers[self.cov_layer]
        return np.array([arr[k][idx] for k in _COV_KEYS], dtype=np.float64)

    def _write_cov(self, chunk, idx, cov6):
        arr = chunk.layers[self.cov_layer]
        for k, v in zip(_COV_KEYS, cov6):
            arr[k][idx] = np.float32(v)

    def integrate_rays(self, rays, intensities=None, timestamps=None, ray_update_flags=0):
        m = self.map
        p = self.params
        rays = np.asarray(rays, dtype=np.float64).reshape(-1, 3)
        n_rays = rays.shape[0] // 2
        starts_in = rays[0::2]
        ends_in = rays[1::2]
        flags = normalize_reverse_walk(ray_update_flags)
        dims = m.region_voxel_dims
        res = m.resolution

        voxel_min = np.float32(m.min_voxel_value)
        voxel_max = np.float32(m.max_voxel_value)
        sat_min = np.float32(m.saturation_min)
        sat_max = np.float32(m.saturation_max)
        miss_value = np.float32(m.miss_value)
        hit_value = np.float32(m.hit_value)

        touch_stamp = m.touch()
        if timestamps is not None:
            m.update_first_ray_time(float(np.asarray(timestamps).flat[0]))
        time_base = m.first_ray_time

        if m.ray_filter is not None:
            starts, ends, filter_flags, accept = m.ray_filter(starts_in, ends_in)
        else:
            starts, ends = starts_in, ends_in
            filter_flags = np.zeros(n_rays, dtype=np.uint32)
            accept = np.ones(n_rays, dtype=bool)

        state = {"last_exit_range": 0.0}

        for i in range(n_rays):
            if not accept[i]:
                continue
            start = starts[i]
            sample = ends[i]
            intensity = float(np.asarray(intensities).flat[i]) if intensities is not None else 0.0
            fflags = int(filter_flags[i])

            include_sample_in_ray = bool(fflags & RayFilterFlag.CLIPPED_END) or bool(flags & RayFlag.END_POINT_AS_FREE)
            walk_flags = 0 if include_sample_in_ray else linewalk.EXCLUDE_END_VOXEL
            if flags & RayFlag.EXCLUDE_ORIGIN:
                walk_flags |= linewalk.EXCLUDE_START_VOXEL

            def visit(abs_key, _marker, enter_range, exit_range):
                region, local = keymath.abs_to_key(abs_key, dims)
                chunk = m.region(region, allow_create=True)
                idx = int(keymath.voxel_index(local, dims))
                occ = chunk.layers[self.occupancy_layer][OCCUPANCY_LAYER]
                mean_arr = chunk.layers[self.mean_layer]
                initial = occ[idx]
                cov6 = self._read_cov(chunk, idx)
                centre = m.voxel_centre_global(region, local)
                mean = subvoxel.sub_voxel_to_local_coord(mean_arr["coord"][idx], res).astype(np.float64) + centre
                count = int(mean_arr["count"][idx])

                adjusted, is_miss = calculate_miss_ndt(
                    cov6, initial, start, sample, mean, count, miss_value,
                    p.adaptation_rate, p.sensor_noise, p.sample_threshold,
                )
                if p.ndt_tm and is_miss:
                    hm = chunk.layers[self.hit_miss_layer]
                    hm["miss_count"][idx] += 1
                # occupancyAdjustDown (ohm/VoxelOccupancyCompute.h:144-153)
                uninit = initial == _UNOBSERVED
                if not (uninit or (sat_min < initial < sat_max)):
                    adjusted = initial
                occ[idx] = adjusted if adjusted == _UNOBSERVED else max(voxel_min, np.float32(adjusted))

                if self.traversal_layer >= 0:
                    trav = chunk.layers[self.traversal_layer]["traversal"]
                    trav[idx] = trav[idx] + np.float32(exit_range - enter_range)
                chunk.dirty_stamp = touch_stamp
                state["last_exit_range"] = exit_range
                return True

            if not (flags & RayFlag.EXCLUDE_RAY):
                linewalk.walk_segment_keys(m, start, sample, visit, walk_flags)

            if not include_sample_in_ray:
                region, local = m.voxel_key(sample)
                chunk = m.region(region, allow_create=True)
                idx = int(keymath.voxel_index(local, dims))
                occ = chunk.layers[self.occupancy_layer][OCCUPANCY_LAYER]
                mean_arr = chunk.layers[self.mean_layer]
                centre = m.voxel_centre_global(region, local)
                initial = occ[idx]
                cov6 = self._read_cov(chunk, idx)
                mean = subvoxel.sub_voxel_to_local_coord(mean_arr["coord"][idx], res).astype(np.float64) + centre
                count = int(mean_arr["count"][idx])

                if p.ndt_tm:
                    hm = chunk.layers[self.hit_miss_layer]
                    hc, mc = calculate_hit_miss_update_on_hit(
                        cov6, initial, int(hm["hit_count"][idx]), int(hm["miss_count"][idx]),
                        start, sample, mean, count, p,
                    )
                    hm["hit_count"][idx] = hc
                    hm["miss_count"][idx] = mc
                    ia = chunk.layers[self.intensity_layer]
                    nm, nc = calculate_intensity_update_on_hit(
                        ia["mean"][idx], ia["cov"][idx], initial, intensity, count, p
                    )
                    ia["mean"][idx] = nm
                    ia["cov"][idx] = nc

                new_cov, adjusted, reset_mean = calculate_hit_with_covariance(
                    cov6, initial, sample, mean, count, hit_value, res,
                    p.reinitialise_covariance_threshold, p.reinitialise_covariance_point_count,
                )
                self._write_cov(chunk, idx, new_cov)
                # occupancyAdjustUp (ohm/VoxelOccupancyCompute.h:78-87)
                uninit = initial == _UNOBSERVED
                if not (uninit or (sat_min < initial < sat_max)):
                    adjusted = initial
                occ[idx] = adjusted if adjusted == _UNOBSERVED else min(voxel_max, np.float32(adjusted))

                count = 0 if reset_mean else count
                mean_arr["coord"][idx] = subvoxel.sub_voxel_update(
                    mean_arr["coord"][idx] if not reset_mean else np.uint32(0),
                    count, (sample - centre).astype(np.float32), res,
                )
                mean_arr["count"][idx] = count + 1

                if self.traversal_layer >= 0:
                    trav = chunk.layers[self.traversal_layer]["traversal"]
                    trav[idx] = trav[idx] + np.float32(np.linalg.norm(sample - start) - state["last_exit_range"])
                if self.touch_time_layer >= 0 and timestamps is not None:
                    chunk.layers[self.touch_time_layer]["touch"][idx] = subvoxel.encode_touch_time(
                        time_base, float(np.asarray(timestamps).flat[i])
                    )
                if self.incident_layer >= 0:
                    packed = chunk.layers[self.incident_layer]["packed_normal"][idx]
                    chunk.layers[self.incident_layer]["packed_normal"][idx] = subvoxel.update_incident_normal(
                        packed, (start - sample).astype(np.float32), count
                    )
                chunk.dirty_stamp = touch_stamp

        return n_rays
