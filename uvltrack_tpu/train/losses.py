"""Training losses (GIoU+L1 box, Gaussian-weighted focal cls, contrastive
prompt CE, per-layer aux contrastive CE).

Functional parity (semantics, not code) with:
- GaussWeightedLoss            lib/utils/box_ops.py:266-292
- UVLTrackActor.compute_losses lib/train/actors/uvltrack.py:135-177
- aux positive/negative mining lib/train/actors/uvltrack.py:111-132
- torch CrossEntropyLoss(weight=..., ignore_index=-1) semantics for `cont`

All pure jnp; batched; static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.box_ops import box_cxcywh_to_xyxy, box_xywh_to_xyxy, giou_loss


def gauss_weighted_focal_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                              reduction: str = "mean", eps: float = 1e-12) -> jnp.ndarray:
    """CenterNet-style focal loss on sigmoid maps vs Gaussian targets.

    pred, gt: (..., H, W) with pred in (0,1), gt peak == 1 at centers.
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    pos = gt == 1.0
    neg_w = jnp.power(1.0 - gt, 4)
    pos_loss = jnp.log(jnp.clip(pred, eps)) * jnp.power(1.0 - pred, 2)
    neg_loss = jnp.log(jnp.clip(1.0 - pred, eps)) * jnp.power(pred, 2) * neg_w
    total = jnp.where(pos, pos_loss, neg_loss).sum()
    if reduction == "mean":
        return -total / pred.size
    return -total


def weighted_ce_ignore(logits: jnp.ndarray, targets: jnp.ndarray,
                       class_weights: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss(weight=w, ignore_index=-1) semantics.

    logits (N, C) fp32; targets (N,) int with -1 = ignore.
    Returns sum(w[y]*nll) / sum(w[y]) over non-ignored rows.
    """
    logits = logits.astype(jnp.float32)
    valid = targets >= 0
    t = jnp.clip(targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, t[:, None], axis=-1)[:, 0]
    w = class_weights[t] * valid
    return (nll * w).sum() / jnp.maximum(w.sum(), 1e-12)


def ce_mean(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Plain mean cross entropy (torch CrossEntropyLoss default)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    return nll.mean()


def _bilinear_sample_border(maps: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample (B, H, W) maps at one normalized point each, border padding,
    align_corners=True (torch grid_sample convention).

    xy: (B, 2) in [-1, 1] as (x, y). Returns (B,).
    """
    b, h, w = maps.shape
    x = (xy[:, 0] + 1.0) / 2.0 * (w - 1)
    y = (xy[:, 1] + 1.0) / 2.0 * (h - 1)
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = x - x0
    wy = y - y0
    bid = jnp.arange(b)
    v00 = maps[bid, y0, x0]
    v01 = maps[bid, y0, x1]
    v10 = maps[bid, y1, x0]
    v11 = maps[bid, y1, x1]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


def aux_contrastive_loss(logits: jnp.ndarray, gt_bbox_xywh: jnp.ndarray,
                         num_neg: int = 9) -> jnp.ndarray:
    """Per-layer backbone contrastive alignment loss.

    logits: (B, L, sz, sz) search-vs-token similarity maps.
    gt_bbox_xywh: (B, 4) normalized. Positive = bilinear sample at the gt
    center; negatives = top-`num_neg` logits outside the gt box; CE with the
    positive as class 0.
    """
    b, n, sz, _ = logits.shape
    maps = logits.reshape(b * n, sz, sz).astype(jnp.float32)
    gt = jnp.clip(box_xywh_to_xyxy(gt_bbox_xywh), 0.0, 1.0)  # (B,4) xyxy
    gt = jnp.repeat(gt, n, axis=0)  # (B*L,4) — layer-major per sample

    ctr = (gt[:, :2] + gt[:, 2:]) / 2.0  # (B*L, 2) as (x, y)
    pos = _bilinear_sample_border(maps, ctr * 2.0 - 1.0)[:, None]  # (BL,1)

    cood = (jnp.arange(sz, dtype=jnp.float32) + 0.5) / sz
    x_in = (cood[None, :] > gt[:, 0:1]) & (cood[None, :] < gt[:, 2:3])
    y_in = (cood[None, :] > gt[:, 1:2]) & (cood[None, :] < gt[:, 3:4])
    inside = (y_in[:, :, None] & x_in[:, None, :]).reshape(b * n, sz * sz)
    masked = maps.reshape(b * n, sz * sz) - 1e9 * inside
    neg = jax.lax.top_k(masked, num_neg)[0]  # (BL, num_neg)

    all_logits = jnp.concatenate([pos, neg], axis=-1)
    targets = jnp.zeros((b * n,), jnp.int32)
    return ce_mean(all_logits, targets)


def box_losses(pred_boxes: jnp.ndarray, gt_bbox_xywh: jnp.ndarray):
    """GIoU + L1 on the decoded boxes vs the gt box.

    pred_boxes: (B, S, 4) cxcywh normalized — in the reference this is the
    head's `pred_boxes` output, i.e. ONLY the argmax-of-cls·cont position's
    box (S=1), not the dense bbox_map (lib/train/actors/uvltrack.py:146-155
    with pred_dict['pred_boxes'] = bbox_map[b_idx, s_idx].unsqueeze(1) from
    modality_adaptive_box_head.py:108-119). gt: (B, 4) xywh normalized.
    Returns (giou_loss, l1_loss, mean_iou).
    """
    b, s, _ = pred_boxes.shape
    pred = box_cxcywh_to_xyxy(pred_boxes.astype(jnp.float32)).reshape(-1, 4)
    gt = jnp.clip(box_xywh_to_xyxy(gt_bbox_xywh.astype(jnp.float32)), 0.0, 1.0)
    gt = jnp.repeat(gt[:, None, :], s, axis=1).reshape(-1, 4)
    gl, iou = giou_loss(pred, gt)
    l1 = jnp.abs(pred - gt).mean()
    return gl, l1, iou.mean()
