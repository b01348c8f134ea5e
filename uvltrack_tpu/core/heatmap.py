"""Gaussian classification-label heatmaps (CenterNet-style) — pure jnp, batched.

Functional parity with the reference label generator
(lib/train/data/processing_utils.py:15-57,143-157): a Gaussian of sigma
(2r+1)/6 is drawn in a (2r+1)^2 window at the integer box center; radius is
either fixed (2) or the CenterNet gaussian_radius of the box size.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS64 = float(jnp.finfo(jnp.float64).eps) if hasattr(jnp, "float64") else 2.220446049250313e-16


def gaussian_radius(height: jnp.ndarray, width: jnp.ndarray, min_overlap: float) -> jnp.ndarray:
    """CenterNet gaussian radius (elementwise over broadcastable h/w arrays)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 - sq1) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 - sq2) / (2 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def generate_cls_label(boxes_xywh: jnp.ndarray, out_size: int,
                       gaussian_iou: float = 0.7, dynamic: bool = False) -> jnp.ndarray:
    """(B,4) normalized xywh -> (B, out_size, out_size) Gaussian heatmaps.

    Center is the truncated-int box center in grid units; the Gaussian is
    non-zero only inside the radius window (|dx|<=r, |dy|<=r) and where its
    value exceeds float64-eps * peak, matching the reference's draw_gaussian.
    """
    b = boxes_xywh.shape[0]
    bx = boxes_xywh * out_size  # grid units
    x, y, w, h = bx[:, 0], bx[:, 1], bx[:, 2], bx[:, 3]
    cx = jnp.asarray(x + w / 2, jnp.float32).astype(jnp.int32)  # int() truncation
    cy = jnp.asarray(y + h / 2, jnp.float32).astype(jnp.int32)

    if dynamic:
        radius = jnp.maximum(0, gaussian_radius(h, w, gaussian_iou).astype(jnp.int32))
    else:
        radius = jnp.full((b,), 2, dtype=jnp.int32)
    radius_f = radius.astype(jnp.float32)
    sigma = (2.0 * radius_f + 1.0) / 6.0  # (B,)

    ii = jnp.arange(out_size, dtype=jnp.int32)
    dy = ii[None, :, None] - cy[:, None, None]  # (B,H,1)
    dx = ii[None, None, :] - cx[:, None, None]  # (B,1,W)
    d2 = (dx.astype(jnp.float32)) ** 2 + (dy.astype(jnp.float32)) ** 2  # (B,H,W)
    g = jnp.exp(-d2 / (2.0 * sigma[:, None, None] ** 2))
    window = (jnp.abs(dy) <= radius[:, None, None]) & (jnp.abs(dx) <= radius[:, None, None])
    g = jnp.where(window & (g >= _EPS64), g, 0.0)
    return g
