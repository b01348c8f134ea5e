"""Crop geometry, token masks, and box mapping — pure jnp, static shapes.

These are the device-side analogues of the reference's numpy/cv2 geometry:
- anno2mask            (lib/test/tracker/uvltrack.py:183-194, lib/train/actors/uvltrack.py:95-109)
- cont_gt              (lib/train/actors/uvltrack.py:75-93)
- crop_params / map_box_back  (lib/train/data/processing_utils.py:159-193,
                                lib/test/tracker/uvltrack.py:167-173)

All functions are batched and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from .box_ops import box_cxcywh_to_xyxy, box_xywh_to_cxcywh, box_xywh_to_cxcywh_scale, box_xywh_to_xyxy


def anno2mask(boxes_xywh: jnp.ndarray, size: int) -> jnp.ndarray:
    """Rasterize normalized xywh boxes to (B, size*size) boolean token masks.

    A grid cell is inside if its center (i+0.5) lies strictly inside the box
    scaled to grid units; the cell containing the box center is always set.
    """
    b = boxes_xywh.shape[0]
    bx = box_xywh_to_xyxy(boxes_xywh) * size  # (B,4)
    cood = jnp.arange(size, dtype=boxes_xywh.dtype) + 0.5  # (sz,)
    x_in = (cood[None, :] > bx[:, 0:1]) & (cood[None, :] < bx[:, 2:3])  # (B,w)
    y_in = (cood[None, :] > bx[:, 1:2]) & (cood[None, :] < bx[:, 3:4])  # (B,h)
    mask = y_in[:, :, None] & x_in[:, None, :]  # (B,h,w)
    cx = jnp.clip(jnp.floor((bx[:, 0] + bx[:, 2]) / 2).astype(jnp.int32), 0, size - 1)
    cy = jnp.clip(jnp.floor((bx[:, 1] + bx[:, 3]) / 2).astype(jnp.int32), 0, size - 1)
    # force the center cell on (scatter via one-hot to stay vectorized)
    ctr = (jnp.arange(size)[None, :, None] == cy[:, None, None]) & (
        jnp.arange(size)[None, None, :] == cx[:, None, None]
    )
    mask = mask | ctr
    return mask.reshape(b, size * size)


def rotate_half_batch(x: jnp.ndarray) -> jnp.ndarray:
    """Swap the two halves of the batch dim (context-shuffling used in training)."""
    h = x.shape[0] // 2
    return jnp.concatenate([x[h:], x[:h]], axis=0)


def cont_gt(boxes_xywh: jnp.ndarray, size: int, ctr_ratio: float = 0.75) -> jnp.ndarray:
    """Per-cell contrastive target: 0 = center region, 1 = outside box, -1 = ignore.

    The center region is the box shrunk by ctr_ratio about its center (cells
    there are class 0, plus the exact center cell); cells inside the full box
    but outside the center region are ignored (-1); the rest is class 1.
    """
    b = boxes_xywh.shape[0]
    size_f = float(size)

    def inside(bx):  # bx: (B,4) xyxy in grid units -> (B,h,w) bool
        cood = jnp.arange(size, dtype=boxes_xywh.dtype) + 0.5
        x_in = (cood[None, :] > bx[:, 0:1]) & (cood[None, :] < bx[:, 2:3])
        y_in = (cood[None, :] > bx[:, 1:2]) & (cood[None, :] < bx[:, 3:4])
        return y_in[:, :, None] & x_in[:, None, :]

    bx_c = box_cxcywh_to_xyxy(box_xywh_to_cxcywh_scale(boxes_xywh, ctr_ratio)) * size_f
    mask_c = inside(bx_c)
    cx = jnp.clip(jnp.floor((bx_c[:, 0] + bx_c[:, 2]) / 2).astype(jnp.int32), 0, size - 1)
    cy = jnp.clip(jnp.floor((bx_c[:, 1] + bx_c[:, 3]) / 2).astype(jnp.int32), 0, size - 1)
    ctr = (jnp.arange(size)[None, :, None] == cy[:, None, None]) & (
        jnp.arange(size)[None, None, :] == cx[:, None, None]
    )
    mask_c = mask_c | ctr

    bx_t = box_cxcywh_to_xyxy(box_xywh_to_cxcywh(boxes_xywh)) * size_f
    mask_t = 1 - 2 * inside(bx_t).astype(jnp.int32)  # inside box -> -1, outside -> 1
    mask_t = jnp.where(mask_c, 0, mask_t)  # center region -> class 0
    return mask_t.reshape(b, size * size)


# --------------------------------------------------------------------------
# Square-crop geometry (host-free; mirrors sample_target's integer rounding)
# --------------------------------------------------------------------------

def crop_params(box_xywh: jnp.ndarray, search_area_factor: float, output_sz: int):
    """Compute the square crop window around an xywh box.

    Returns (x1, y1, crop_sz, resize_factor) with the reference's exact
    rounding: crop_sz = ceil(sqrt(w*h)*factor); corner = round(center - crop/2)
    truncated toward zero after round (int() of round in python = rint).
    """
    x, y, w, h = box_xywh[..., 0], box_xywh[..., 1], box_xywh[..., 2], box_xywh[..., 3]
    crop_sz = jnp.ceil(jnp.sqrt(w * h) * search_area_factor)
    # device-safe stand-in for the reference's `if crop_sz < 1: raise
    # Exception('Too small bounding box.')` — jitted tracker code cannot
    # raise, so a degenerate box clamps instead of dividing by zero
    crop_sz = jnp.maximum(crop_sz, 1.0)
    x1 = jnp.floor(jnp.round(x + 0.5 * w - crop_sz * 0.5)).astype(jnp.int32)
    y1 = jnp.floor(jnp.round(y + 0.5 * h - crop_sz * 0.5)).astype(jnp.int32)
    resize_factor = output_sz / crop_sz
    return x1, y1, crop_sz.astype(jnp.int32), resize_factor


def crop_box_normalized(box_xywh: jnp.ndarray, search_area_factor: float) -> jnp.ndarray:
    """The crop-relative normalized xywh of the (centered) target box.

    Mirrors sample_target's returned bbox (processing_utils.py:215):
    [(0.5 - w/crop/2), (0.5 - h/crop/2), w/crop, h/crop].
    """
    w, h = box_xywh[..., 2], box_xywh[..., 3]
    crop_sz = jnp.ceil(jnp.sqrt(w * h) * search_area_factor)
    return jnp.stack(
        [0.5 - w / crop_sz / 2, 0.5 - h / crop_sz / 2, w / crop_sz, h / crop_sz],
        axis=-1,
    )


def map_box_back(pred_cxcywh_crop: jnp.ndarray, prev_xywh: jnp.ndarray,
                 resize_factor: jnp.ndarray, search_size: int) -> jnp.ndarray:
    """Map a predicted box from crop coordinates back to image coordinates.

    pred_cxcywh_crop: (...,4) cxcywh in *crop pixel* units (already scaled by
    search_size/resize_factor). prev_xywh: previous state in image coords.
    Returns xywh in image coords.
    """
    cx_prev = prev_xywh[..., 0] + 0.5 * prev_xywh[..., 2]
    cy_prev = prev_xywh[..., 1] + 0.5 * prev_xywh[..., 3]
    half_side = 0.5 * search_size / resize_factor
    cx = pred_cxcywh_crop[..., 0] + (cx_prev - half_side)
    cy = pred_cxcywh_crop[..., 1] + (cy_prev - half_side)
    w = pred_cxcywh_crop[..., 2]
    h = pred_cxcywh_crop[..., 3]
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h, w, h], axis=-1)
