"""Vectorised NDT math for the TPU pipeline.

Reference parity: ohm/CovarianceVoxelCompute.h.  Key architectural
translation (SURVEY.md section 7): the reference updates the packed sqrt
covariance with a per-sample modified Gram-Schmidt recursion executed by a
leader-elected GPU thread over sorted samples (ohmgpu/gpu/CovarianceHitNdt.cl).
The recursion is algebraically Welford's running mean/scatter update
(P_n = (M2_n + P_seed) / n), so a whole batch of samples per voxel merges in
closed form (Chan's parallel combine) followed by one 3x3 Cholesky — exact in
exact arithmetic, and fully parallel over voxels.

All geometry is voxel-local float32 (positions relative to the voxel centre),
mirroring the reference GPU's localisation trick (docs/gpu/docgpudetail.md:68-74).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Seed scale for a fresh covariance: sqrt cov = 0.1 * resolution * I
#: (ohm/CovarianceVoxelCompute.h:92-101).
COV_SEED_SCALE = 0.1


def solve_triangular_packed(cov6, y):
    """Forward substitution L x = y with packed lower-triangular L [..., 6].

    Packing [0; 1 2; 3 4 5] (ohm/CovarianceVoxelCompute.h:183-202).
    y: [..., 3].  Division guards mirror the reference's reliance on the
    seeded diagonal never being zero.
    """
    d0 = cov6[..., 0]
    d1 = cov6[..., 2]
    d2 = cov6[..., 5]
    x0 = y[..., 0] / d0
    x1 = (y[..., 1] - cov6[..., 1] * x0) / d1
    x2 = (y[..., 2] - cov6[..., 3] * x0 - cov6[..., 4] * x1) / d2
    return jnp.stack([x0, x1, x2], axis=-1)


def sample_likelihoods(cov6, sensor, sample, mean, sensor_noise):
    """NDT likelihoods (ohm/CovarianceVoxelCompute.h:226-272), vectorised.

    All positions voxel-local f32 [..., 3].  Returns (p_x_ml_given_voxel,
    p_x_ml_given_sample).
    """
    sensor_to_sample = sample - sensor
    norm = jnp.linalg.norm(sensor_to_sample, axis=-1, keepdims=True)
    sensor_ray = sensor_to_sample / jnp.maximum(norm, 1e-12)
    mean_to_sensor = sensor - mean

    a = solve_triangular_packed(cov6, sensor_ray)
    b_norm = solve_triangular_packed(cov6, mean_to_sensor)
    t = -jnp.sum(a * b_norm, axis=-1) / jnp.maximum(jnp.sum(a * a, axis=-1), 1e-20)
    x_ml = sensor_ray * t[..., None] + sensor

    sol = solve_triangular_packed(cov6, x_ml - mean)
    p_voxel = jnp.exp(-0.5 * jnp.sum(sol * sol, axis=-1))
    noise_var = jnp.float32(sensor_noise) * jnp.float32(sensor_noise)
    d = x_ml - sample
    p_sample = jnp.exp(-0.5 * jnp.sum(d * d, axis=-1) / noise_var)
    return p_voxel, p_sample


def ndt_miss_delta(cov6, sensor, sample, mean, adaptation_rate, sensor_noise):
    """Log-odds adjustment for an NDT miss on a Gaussian-bearing voxel.

    Reference: calculateMissNdt's occupied branch
    (ohm/CovarianceVoxelCompute.h:598-637).  Returns (delta, is_miss).
    The caller handles the unobserved / below-sample-threshold branches.
    """
    p_voxel, p_sample = sample_likelihoods(cov6, sensor, sample, mean, sensor_noise)
    scaling = jnp.float32(0.5) * jnp.float32(adaptation_rate)
    prod = p_voxel * (1.0 - p_sample)
    pu = jnp.float32(0.5) - scaling * prod
    is_miss = prod < scaling
    delta = jnp.log(pu / (1.0 - pu))
    # NaN guard mirrors the reference (keeps the value unchanged on NaN).
    delta = jnp.where(jnp.isnan(delta), 0.0, delta)
    return delta, is_miss


def tm_hit_consistency(cov6, sensor, sample, mean, count, occ, cfg_ndt):
    """NDT-TM per-sample hit/miss consistency (ohm/CovarianceVoxelCompute.h:446-505).

    Returns (needs_reset, inc_hit, inc_miss) booleans per sample.
    """
    needs_reset = jnp.isposinf(occ) | (count == 0) | (
        (occ < jnp.float32(cfg_ndt["reinit_threshold"])) & (count >= cfg_ndt["reinit_count"])
    )
    p_voxel, p_sample = sample_likelihoods(cov6, sensor, sample, mean, cfg_ndt["sensor_noise"])
    prod = p_voxel * p_sample
    eta = jnp.float32(0.5) * jnp.float32(cfg_ndt["adaptation_rate"])
    below = count < cfg_ndt["sample_threshold"]
    inc_hit = needs_reset | below | (prod >= eta)
    inc_miss = ~needs_reset & ~below & (prod < eta) & (p_voxel >= eta)
    return needs_reset, inc_hit, inc_miss


def cov6_to_full(cov6):
    """Packed sqrt [..., 6] -> full covariance P = S S^T as 6 packed entries
    [P00, P01, P11, P02, P12, P22] (upper-triangular storage order of the
    reference covariance layer)."""
    s00 = cov6[..., 0]
    s10 = cov6[..., 1]
    s11 = cov6[..., 2]
    s20 = cov6[..., 3]
    s21 = cov6[..., 4]
    s22 = cov6[..., 5]
    p00 = s00 * s00
    p01 = s10 * s00
    p11 = s10 * s10 + s11 * s11
    p02 = s20 * s00
    p12 = s20 * s10 + s21 * s11
    p22 = s20 * s20 + s21 * s21 + s22 * s22
    return jnp.stack([p00, p01, p11, p02, p12, p22], axis=-1)


def chol3_packed(p6, eps=1e-12):
    """3x3 Cholesky of packed symmetric [P00, P01, P11, P02, P12, P22]
    -> packed lower sqrt [L00; L10 L11; L20 L21 L22]."""
    p00 = jnp.maximum(p6[..., 0], eps)
    l00 = jnp.sqrt(p00)
    l10 = p6[..., 1] / l00
    l11 = jnp.sqrt(jnp.maximum(p6[..., 2] - l10 * l10, eps))
    l20 = p6[..., 3] / l00
    l21 = (p6[..., 4] - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(p6[..., 5] - l20 * l20 - l21 * l21, eps))
    return jnp.stack([l00, l10, l11, l20, l21, l22], axis=-1)


def _outer6(v):
    """v v^T as packed [00, 01, 11, 02, 12, 22]; v [..., 3]."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([x * x, x * y, y * y, x * z, y * z, z * z], axis=-1)


def merge_covariance_batch(cov6_old, mean_old, count_old, occ_old, k, z_sum, zz_sum,
                           resolution, reinit_threshold, reinit_count):
    """Closed-form batch hit merge.

    Equivalent (in exact arithmetic) to k sequential
    calculateHitWithCovariance + mean updates
    (ohm/CovarianceVoxelCompute.h:301-370): the reference recursion satisfies
    n P_n = M2_n + P_seed, so batch samples merge via Chan's parallel scatter
    combination.

    Inputs per voxel: old packed sqrt cov, voxel-local mean, count, occupancy
    (batch-start), batch count k (>0 where valid), batch sum of voxel-local
    samples z_sum [.,3] and packed outer-product sums zz_sum [.,6].

    Returns (new sqrt cov6, new mean, new count, reset mask).
    """
    count_old = count_old.astype(jnp.float32)
    reset = (count_old == 0) | (
        (occ_old < jnp.float32(reinit_threshold)) & (count_old >= jnp.float32(reinit_count))
    )
    n0 = jnp.where(reset, 0.0, count_old)
    mu0 = jnp.where(reset[..., None], 0.0, mean_old)

    kf = jnp.maximum(k, 1.0)
    mu_b = z_sum / kf[..., None]
    # Batch scatter about the batch mean: sum(zz^T) - k mu_b mu_b^T.
    m2_b = zz_sum - kf[..., None] * _outer6(mu_b)

    seed = jnp.float32((COV_SEED_SCALE * resolution) ** 2)
    seed6 = jnp.stack([jnp.full_like(kf, seed), jnp.zeros_like(kf), jnp.full_like(kf, seed),
                       jnp.zeros_like(kf), jnp.zeros_like(kf), jnp.full_like(kf, seed)], axis=-1)
    q0 = jnp.where((n0 > 0)[..., None], n0[..., None] * cov6_to_full(cov6_old), seed6)

    delta = mu_b - mu0
    corr = (n0 * kf / jnp.maximum(n0 + kf, 1.0))[..., None] * _outer6(delta)
    q = q0 + m2_b + corr
    n_new = n0 + kf
    p_new = q / n_new[..., None]
    cov_new = chol3_packed(p_new)
    mean_new = (mu0 * n0[..., None] + z_sum) / n_new[..., None]
    return cov_new, mean_new, n_new, reset
