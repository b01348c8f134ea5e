"""Box conversions, IoU/GIoU, and box clipping — pure jnp, fully vectorized.

Functional parity targets (semantics, not code): reference lib/utils/box_ops.py
(conversions :7-49, iou/giou :56-114, clip_box :117-128).

Conventions: boxes are (..., 4) arrays. `xywh` = top-left + size; `cxcywh` =
center + size; `xyxy` = corners. All ops broadcast over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def box_xyxy_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def box_xywh_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x + w / 2, y + h / 2, w, h], axis=-1)


def box_xywh_to_cxcywh_scale(b: jnp.ndarray, f: float = 1.0) -> jnp.ndarray:
    """xywh -> cxcywh with width/height scaled by `f` about the center."""
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x + w / 2, y + h / 2, w * f, h * f], axis=-1)


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def box_cxcywh_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, w, h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; returns (...)."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU of paired xyxy boxes (N,4)x(N,4) -> (N,), plus union."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise GIoU of paired xyxy boxes. Returns (giou, iou).

    Degenerate (x2<x1) boxes produce finite garbage rather than asserting —
    the caller is responsible for sane inputs (the training loss clamps gt).
    """
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    area = wh[..., 0] * wh[..., 1]
    giou = iou - (area - union) / jnp.maximum(area, 1e-9)
    return giou, iou


def giou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Mean (1 - GIoU) over paired xyxy boxes; also returns the per-pair IoU."""
    giou, iou = generalized_box_iou(boxes1, boxes2)
    return (1.0 - giou).mean(), iou


def clip_box_xywh(box: jnp.ndarray, h, w, margin: int = 0) -> jnp.ndarray:
    """Clip an xywh box into the [0,W]x[0,H] image, keeping >= margin size.

    jnp analogue of the reference clip_box (lib/utils/box_ops.py:117-128);
    works on (..., 4) arrays with scalar or broadcastable H/W.
    """
    x1, y1, bw, bh = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    x2, y2 = x1 + bw, y1 + bh
    x1 = jnp.clip(x1, 0, w - margin)
    x2 = jnp.clip(x2, margin, w)
    y1 = jnp.clip(y1, 0, h - margin)
    y2 = jnp.clip(y2, margin, h)
    bw = jnp.maximum(margin, x2 - x1)
    bh = jnp.maximum(margin, y2 - y1)
    return jnp.stack([x1, y1, bw, bh], axis=-1)
