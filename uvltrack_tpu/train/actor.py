"""UVLTrack training actor: forward pass + loss assembly.

Functional parity with UVLTrackActor (lib/train/actors/uvltrack.py:14-177):
(n_frames, B) batches are flattened to n*B with the template repeated per
search frame; the context mask is the half-batch-rotated search-box mask;
losses are GIoU(2.0) + L1(5.0) on the dense bbox map, Gaussian-weighted
focal on the cls map, weighted ignore-CE on prompt-vs-search scores, and the
per-layer aux contrastive CE.

Pure function of (variables, batch, cfg) -> (loss, metrics) — jit/grad-able
and shardable along the batch axis.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..core.geometry import anno2mask, cont_gt, rotate_half_batch
from .losses import (aux_contrastive_loss, box_losses, gauss_weighted_focal_loss,
                     weighted_ce_ignore)


def flatten_batch(batch: dict) -> dict:
    """(n_frames, B, ...) -> (n*B, ...) with template repeated per frame.

    Layout matches the reference collate (stack_dim=1; LTRLoader) where the
    sampler emits n search frames per template.
    """
    n, b = batch["search_images"].shape[:2]
    out = {}
    out["search_images"] = batch["search_images"].reshape((n * b,) + batch["search_images"].shape[2:])
    out["search_anno"] = batch["search_anno"].reshape(n * b, 4)
    out["search_cls"] = batch["search_cls"].reshape((n * b,) + batch["search_cls"].shape[2:])
    tmpl = batch["template_images"]  # (1, B, H, W, 3)
    out["template_images"] = jnp.tile(tmpl[0], (n, 1, 1, 1))
    out["template_anno"] = jnp.tile(batch["template_anno"][0], (n, 1))
    out["text"] = batch["text"].reshape(n * b, -1) if batch["text"].ndim == 3 else jnp.tile(batch["text"], (n, 1))
    out["text_mask"] = batch["text_mask"].reshape(n * b, -1) if batch["text_mask"].ndim == 3 else jnp.tile(batch["text_mask"], (n, 1))
    out["flag"] = jnp.tile(batch["flag"].reshape(1, b), (n, 1)).reshape(n * b)
    return out


def loss_weights(cfg) -> dict:
    return {
        "giou": float(cfg.TRAIN.GIOU_WEIGHT),
        "l1": float(cfg.TRAIN.L1_WEIGHT),
        "cls": 1.0,
        "aux": float(cfg.TRAIN.AUX_WEIGHT),
        "cont": float(cfg.TRAIN.CONT_WEIGHT),
    }


def cont_class_weights(cfg) -> jnp.ndarray:
    w = jnp.asarray([cfg.DATA.SEARCH.FACTOR ** 2, cfg.TRAIN.CTR_RATIO ** 2],
                    jnp.float32)
    return w / w.sum()


def forward_and_loss(model, variables: dict, batch: dict, cfg,
                     train: bool = True) -> Tuple[jnp.ndarray, dict]:
    """Run the train forward and assemble the weighted loss.

    batch (frame-major): template_images (1,B,Ht,Wt,3), search_images
    (n,B,Hs,Ws,3), template_anno (1,B,4), search_anno (n,B,4), search_cls
    (n,B,hc,wc), text (B,Nt) or (n,B,Nt), text_mask likewise, flag (B,) or (B,1).
    """
    fb = flatten_batch(batch)
    wt = fb["template_images"].shape[2] // 16
    ws = fb["search_images"].shape[2] // 16

    template_mask = anno2mask(fb["template_anno"], wt)
    context_mask = rotate_half_batch(anno2mask(fb["search_anno"], ws))

    mutable = ["batch_stats"] if train else False
    result = model.apply(variables, fb["template_images"], fb["search_images"],
                         fb["text"], fb["text_mask"], template_mask, context_mask,
                         fb["flag"], train=train, mutable=mutable)
    out, new_model_state = result if train else (result, {})

    w = loss_weights(cfg)
    gt_bbox = fb["search_anno"].astype(jnp.float32)
    # giou/l1 supervise only the argmax-selected box (reference
    # actors/uvltrack.py:146-155 uses pred_dict['pred_boxes'], shape (B,1,4))
    gl, l1, mean_iou = box_losses(out["pred_boxes"], gt_bbox)
    # head cls_score is flattened (B, s); the Gaussian gt is (B, hc, wc)
    cls_loss = gauss_weighted_focal_loss(
        out["cls_score"], fb["search_cls"].reshape(out["cls_score"].shape),
        reduction=cfg.TRAIN.REDUCTION)
    gt_cont = cont_gt(gt_bbox, ws, float(cfg.TRAIN.CTR_RATIO))
    cont_loss = weighted_ce_ignore(out["cont_score"].reshape(-1, 2),
                                   gt_cont.reshape(-1), cont_class_weights(cfg))
    aux_loss = jnp.asarray(0.0, jnp.float32)
    if w["aux"] > 0 and "logits" in out:
        aux_loss = aux_contrastive_loss(out["logits"], gt_bbox)

    loss = (w["giou"] * gl + w["l1"] * l1 + w["cls"] * cls_loss
            + w["aux"] * aux_loss + w["cont"] * cont_loss)
    metrics = {
        "Loss/total": loss,
        "Loss/giou": gl,
        "Loss/l1": l1,
        "Loss/cls": cls_loss,
        "Loss/aux": aux_loss,
        "Loss/cont": cont_loss,
        "IoU": mean_iou,
    }
    if not train:
        # validation accuracy at IoU 0.5 (parity: actors/uvltrack.py:174-176)
        from ..core.box_ops import box_cxcywh_to_xyxy, box_iou, box_xywh_to_xyxy

        pred = box_cxcywh_to_xyxy(out["pred_boxes"][:, 0].astype(jnp.float32))
        gtb = jnp.clip(box_xywh_to_xyxy(gt_bbox), 0.0, 1.0)
        best_iou, _ = box_iou(pred, gtb)
        metrics["Acc@0.5"] = (best_iou > 0.5).mean()
    return loss, (metrics, new_model_state)
