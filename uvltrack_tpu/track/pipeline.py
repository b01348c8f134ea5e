"""Device-side image pipeline: crop/resize/normalize fused into the XLA step.

Replaces the reference's host cv2 preprocessing (sample_target,
lib/train/data/processing_utils.py:159-243; grounding_resize, :60-141;
Preprocessor_wo_mask, lib/test/tracker/tracker_utils.py:20-29) with
static-shape jnp so the whole tracking step is one device call.

The square crop uses the reference's exact window geometry (integer-rounded
corner, ceil crop size) and cv2.INTER_LINEAR sampling semantics
(half-pixel centers, edge clamping *within* the crop, zero outside the
image), implemented as a separable two-tap bilinear gather — crop size stays
a traced scalar so frame resolution is the only compile-time shape.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _axis_taps(out_sz: int, crop_sz, offset, limit: int):
    """Bilinear taps along one axis.

    out_sz: static output size. crop_sz: traced crop size (float). offset:
    traced crop corner in image coords (int). limit: static image extent.
    Returns (idx0, idx1, w0, w1) where idx* are clamped image indices and w*
    already include the zero weight for out-of-image taps.

    The reference pads the far side by `max(x2 - W + 1, 0)` (sample_target,
    lib/train/data/processing_utils.py:188-192), so on any bottom/right
    spill — including an exact fit x2 == W — the LAST in-image row/col is
    also dropped to zero: valid image indices are [max(x1,0), min(x2, W-1)).
    """
    j = jnp.arange(out_sz, dtype=jnp.float32)
    scale = crop_sz.astype(jnp.float32) / out_sz
    s = (j + 0.5) * scale - 0.5
    s = jnp.clip(s, 0.0, crop_sz.astype(jnp.float32) - 1.0)
    c0 = jnp.floor(s)
    w1 = s - c0
    w0 = 1.0 - w1
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, crop_sz.astype(jnp.int32) - 1)
    i0 = offset + c0i
    i1 = offset + c1i
    upper = jnp.minimum(offset + crop_sz.astype(jnp.int32), limit - 1)
    v0 = ((i0 >= 0) & (i0 < upper)).astype(jnp.float32)
    v1 = ((i1 >= 0) & (i1 < upper)).astype(jnp.float32)
    return jnp.clip(i0, 0, limit - 1), jnp.clip(i1, 0, limit - 1), w0 * v0, w1 * v1


def crop_resize(frame: jnp.ndarray, x1, y1, crop_sz, out_sz: int) -> jnp.ndarray:
    """frame (H,W,3) uint8 or float -> (out_sz, out_sz, 3) f32 bilinear crop.

    x1/y1: traced int crop corner; crop_sz: traced int crop side. The cast
    to f32 happens AFTER the row gather so a uint8 frame never materializes
    as an 11MB f32 copy (720p: 68 vs 79 us/crop measured on v5e).

    Rows are gathered FIRST on purpose: an axis-0 gather reads whole
    contiguous (W, 3) rows, so the strided column gather then runs on the
    small (out, W) intermediate. The "shrink the longer axis first to
    minimize the f32 intermediate" reordering was measured on chip and
    REJECTED — on a landscape 720p frame, cols-first costs 79 vs 73
    us/crop single and 506 vs 302 us at vmap-16 (the strided gather over
    the full-height frame dwarfs the intermediate-size saving;
    scripts/bench_crop_order.py, output/round4_crop_order.stdout).
    """
    h, w = frame.shape[0], frame.shape[1]
    ry0, ry1, wy0, wy1 = _axis_taps(out_sz, crop_sz, y1, h)
    rx0, rx1, wx0, wx1 = _axis_taps(out_sz, crop_sz, x1, w)
    rows = (frame[ry0].astype(jnp.float32) * wy0[:, None, None]
            + frame[ry1].astype(jnp.float32) * wy1[:, None, None])
    cols = (rows[:, rx0] * wx0[None, :, None] + rows[:, rx1] * wx1[None, :, None])
    return cols


def normalize(img: jnp.ndarray) -> jnp.ndarray:
    """uint8-range (H,W,3) -> ImageNet-normalized float32."""
    return (img / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def sample_target_device(frame: jnp.ndarray, box_xywh: jnp.ndarray,
                         search_area_factor: float, out_sz: int):
    """Square crop of area factor^2 * wh centered on the box, resized to
    out_sz and ImageNet-normalized. Returns (patch (1,out,out,3), resize_factor).

    Geometry matches sample_target (processing_utils.py:176-193).
    """
    from ..core.geometry import crop_params

    # ONE copy of the crop-window math (parity-tested in test_geometry.py)
    x1, y1, crop_i, resize_factor = crop_params(
        box_xywh, search_area_factor, out_sz)
    patch = crop_resize(frame, x1, y1, crop_i, out_sz)
    return normalize(patch)[None], resize_factor


def letterbox_params(h: int, w: int, out_sz: int):
    """Static letterbox geometry (grounding_resize, processing_utils.py:60-141).

    Returns (oh, ow, y_pad, x_pad) as Python ints.
    """
    if w > h:
        ow = out_sz
        oh = int(out_sz * h / w)
    else:
        oh = out_sz
        ow = int(out_sz * w / h)
    y1 = (out_sz - oh) // 2 if (out_sz - oh) % 2 == 0 else int((out_sz - oh) / 2) + 1
    x1 = (out_sz - ow) // 2 if (out_sz - ow) % 2 == 0 else int((out_sz - ow) / 2) + 1
    # reference: y1=y2=int((out-oh)/2); then y1 += 1 if short by one
    y1_pad = int((out_sz - oh) / 2)
    x1_pad = int((out_sz - ow) / 2)
    if 2 * y1_pad + oh != out_sz:
        y1_pad += 1
    if 2 * x1_pad + ow != out_sz:
        x1_pad += 1
    return oh, ow, y1_pad, x1_pad


def grounding_letterbox(frame: jnp.ndarray, out_sz: int) -> jnp.ndarray:
    """Aspect-preserving resize + center zero-pad + normalize -> (1,out,out,3).

    Frame H/W are static per call site; compile is per-resolution.
    """
    import jax

    h, w = int(frame.shape[0]), int(frame.shape[1])
    oh, ow, y_pad, x_pad = letterbox_params(h, w, out_sz)
    resized = jax.image.resize(frame, (oh, ow, 3), method="linear", antialias=False)
    canvas = jnp.zeros((out_sz, out_sz, 3), frame.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (y_pad, x_pad, 0))
    return normalize(canvas)[None]
