"""Precise RoI Pooling (PrRoIPool), TPU-native.

Capability parity with the vendored CUDA kernel
(lib/utils/PreciseRoIPooling/src/prroi_pooling_gpu_impl.cu:1-443): the exact
(quadrature-free) integral of the bilinearly-interpolated feature surface
over each RoI bin, divided by the bin area — differentiable w.r.t. both
features and RoI coordinates.

TPU-first design instead of a translated kernel: the bilinear interpolant is
a tensor-product of 1D hat bases, so the 2D integral over a bin separates:

    integral = sum_ij F[i,j] * a_j * b_i,   a_j = ∫_bin hat_j(x) dx

which makes each RoI's pooling two dense matmuls (B @ F @ A^T) that map
straight onto the MXU, and the hand-written coordinate gradient of the CUDA
implementation falls out of jax.grad automatically (the hat integral is a
piecewise quadratic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hat_cumint(t: jnp.ndarray) -> jnp.ndarray:
    """H(t) = ∫_{-inf}^{t} max(0, 1-|u|) du  (piecewise quadratic, C^1)."""
    t = jnp.clip(t, -1.0, 1.0)
    neg = (t + 1.0) ** 2 / 2.0
    pos = 1.0 - (1.0 - t) ** 2 / 2.0
    return jnp.where(t <= 0, neg, pos)


def _axis_coeffs(starts: jnp.ndarray, ends: jnp.ndarray, size: int) -> jnp.ndarray:
    """Integral of each grid hat basis over [starts_k, ends_k].

    starts/ends: (P,) bin boundaries in pixel coords (centers at integers).
    Returns (P, size) coefficients.
    """
    idx = jnp.arange(size, dtype=jnp.float32)[None, :]
    return _hat_cumint(ends[:, None] - idx) - _hat_cumint(starts[:, None] - idx)


def prroi_pool_one(feature: jnp.ndarray, roi_xyxy: jnp.ndarray,
                   pooled_h: int, pooled_w: int,
                   spatial_scale: float = 1.0) -> jnp.ndarray:
    """feature (H, W, C); roi_xyxy (4,) in input-image coords. -> (ph, pw, C)."""
    h, w = feature.shape[0], feature.shape[1]
    x1, y1, x2, y2 = [roi_xyxy[i] * spatial_scale for i in range(4)]
    # per-axis clamp like the CUDA kernel (prroi_pooling_gpu_impl.cu:175-176):
    # without it a doubly-inverted roi (x2<x1 AND y2<y1) has positive
    # bin_w*bin_h and would return a reversed-box average instead of 0
    bin_w = jnp.maximum(x2 - x1, 0.0) / pooled_w
    bin_h = jnp.maximum(y2 - y1, 0.0) / pooled_h
    px = jnp.arange(pooled_w, dtype=jnp.float32)
    py = jnp.arange(pooled_h, dtype=jnp.float32)
    a = _axis_coeffs(x1 + px * bin_w, x1 + (px + 1) * bin_w, w)  # (pw, W)
    b = _axis_coeffs(y1 + py * bin_h, y1 + (py + 1) * bin_h, h)  # (ph, H)
    integral = jnp.einsum("pH,HWc,qW->pqc", b, feature.astype(jnp.float32), a,
                          preferred_element_type=jnp.float32)
    area = jnp.maximum(bin_w * bin_h, 0.0)
    return jnp.where(area > 0, integral / jnp.maximum(area, 1e-12), 0.0)


def prroi_pool(features: jnp.ndarray, rois: jnp.ndarray, pooled_h: int,
               pooled_w: int, spatial_scale: float = 1.0) -> jnp.ndarray:
    """features (N, H, W, C) NHWC; rois (R, 5) = [batch_idx, x1, y1, x2, y2]
    in input-image coordinates. Returns (R, pooled_h, pooled_w, C).

    Matches the PyTorch binding's contract
    (PreciseRoIPooling/pytorch/prroi_pool/prroi_pool.py) with NHWC layout.
    """
    batch_idx = rois[:, 0].astype(jnp.int32)
    gathered = features[batch_idx]  # (R, H, W, C)
    return jax.vmap(
        lambda f, r: prroi_pool_one(f, r, pooled_h, pooled_w, spatial_scale)
    )(gathered, rois[:, 1:5])
