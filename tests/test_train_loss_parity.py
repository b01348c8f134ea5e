"""End-to-end TRAINING objective parity: forward_and_loss vs a torch oracle
of the reference's loss assembly (lib/train/actors/uvltrack.py:34-177) using
converted reference-style weights.

Locks the whole training objective: batch flattening, template repetition,
context-mask rotation, training-path prompts (2-column cont score), GIoU+L1
on the argmax-selected box, Gaussian focal, weighted ignore-CE cont loss, and
the grid-sample/top-9 aux loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from uvltrack_tpu.config import default_cfg  # noqa: E402
from uvltrack_tpu.data.synthetic import synthetic_batch  # noqa: E402
from uvltrack_tpu.models.convert import convert_uvltrack  # noqa: E402
from uvltrack_tpu.train.actor import forward_and_loss  # noqa: E402
from test_convert import _reference_style_state  # noqa: E402
from test_full_model_parity import FEAT, TorchOracle, _t  # noqa: E402
from test_model import NT, tiny_inputs, tiny_model  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`


def _cfg():
    c = default_cfg()
    c.DATA.TEMPLATE.SIZE = 32
    c.DATA.SEARCH.SIZE = 64
    c.DATA.SEARCH.FACTOR = 4.0
    c.TRAIN.CTR_RATIO = 0.75
    c.TRAIN.GIOU_WEIGHT = 2.0
    c.TRAIN.L1_WEIGHT = 5.0
    c.TRAIN.AUX_WEIGHT = 0.1
    c.TRAIN.CONT_WEIGHT = 1.0
    c.TRAIN.REDUCTION = "mean"
    c.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN = NT
    return c


def torch_losses(oracle, fb, cfg):
    """Reference loss assembly on the flattened batch (torch, fp32)."""
    sz = FEAT
    b = fb["search_images"].shape[0]
    flag = fb["flag"]
    t_t = _t(fb["template_images"]).permute(0, 3, 1, 2)
    s_t = _t(fb["search_images"]).permute(0, 3, 1, 2)
    bb = oracle.backbone(t_t, s_t, fb["text"], fb["text_mask"], flag)

    def anno2mask(boxes, grid, reverse=False):
        bx = torch.cat([_t(boxes[:, :2]), _t(boxes[:, :2] + boxes[:, 2:])], -1) * grid
        cood = torch.arange(grid).float()[None] + 0.5
        x_in = (cood > bx[:, 0:1]) & (cood < bx[:, 2:3])
        y_in = (cood > bx[:, 1:2]) & (cood < bx[:, 3:4])
        m = y_in[:, :, None] & x_in[:, None, :]
        cx = torch.clamp(torch.floor((bx[:, 0] + bx[:, 2]) / 2).long(), 0, grid - 1)
        cy = torch.clamp(torch.floor((bx[:, 1] + bx[:, 3]) / 2).long(), 0, grid - 1)
        m[torch.arange(b), cy, cx] = True
        m = m.reshape(b, -1)
        if reverse:
            m = torch.cat([m[b // 2:], m[: b // 2]], 0)
        return m

    tmask = anno2mask(fb["template_anno"], 2)  # template 32px -> 2x2 grid
    cmask = anno2mask(fb["search_anno"], sz, reverse=True)

    # training-path prompt: rotated context
    tok = torch.cat([bb["vis_token"], bb["txt_token"],
                     (bb["vis_token"] + bb["txt_token"]) / 2], 1)[
        torch.arange(b), np.asarray(flag)]
    ctx = torch.cat([bb["search"][b // 2:], bb["search"][: b // 2]], 0)
    prompt = oracle.prompter(bb["template"], tmask.numpy(), ctx, cmask.numpy(),
                             tok, flag)
    st = oracle.st
    scale = st["box_head.logit_scale"].exp()
    raw = scale * (F.normalize(bb["search"], dim=-1)
                   @ F.normalize(prompt, dim=-1).transpose(-2, -1))
    ext = torch.zeros_like(raw[:, :, :1])
    cont = torch.cat([raw[:, :, :1],
                      torch.cat([raw[:, :, 1:], ext], -1).max(-1, keepdim=True).values],
                     -1)  # softmax_one TRAIN path: 2 columns

    C = bb["search"].shape[-1]
    x2d = bb["search"].transpose(-2, -1).reshape(b, C, sz, sz)
    cls_map = torch.sigmoid(oracle.tower("box_head.conv_cls", x2d)).squeeze(1)
    offset = torch.sigmoid(oracle.tower("box_head.conv_offset", x2d))
    size_tr = torch.sigmoid(oracle.tower("box_head.conv_bbox", x2d))
    size_gr = torch.sigmoid(oracle.tower("box_head.conv_bbox_grounding", x2d))
    size_map = torch.stack([size_tr, size_gr, size_tr], 1)[
        torch.arange(b), np.asarray(flag)]
    xs, ys = torch.meshgrid(torch.arange(sz), torch.arange(sz), indexing="ij")
    coord = torch.cat([ys.reshape(-1)[None], xs.reshape(-1)[None]])[None].float()
    ctr = (coord + offset.reshape(b, 2, -1)) / sz
    bbox_map = torch.cat([ctr, size_map.reshape(b, 2, -1)], 1).transpose(-2, -1)

    # ---------------- losses (reference equations)
    gt = _t(fb["search_anno"])
    # giou/l1 are computed on pred_dict['pred_boxes'] — ONLY the
    # argmax-of-cls·cont box (actors/uvltrack.py:146-155, convert2bbox)
    cls_merged = cls_map.reshape(b, -1) * cont.softmax(-1)[:, :, 0]
    k_idx = cls_merged.argmax(-1)
    pred_box = bbox_map[torch.arange(b), k_idx]  # (b, 4) cxcywh
    pred_xyxy = torch.cat([pred_box[:, :2] - pred_box[:, 2:] / 2,
                           pred_box[:, :2] + pred_box[:, 2:] / 2], -1)
    gt_xyxy = torch.cat([gt[:, :2], gt[:, :2] + gt[:, 2:]], -1).clamp(0.0, 1.0)
    tl = torch.max(pred_xyxy[:, :2], gt_xyxy[:, :2])
    br = torch.min(pred_xyxy[:, 2:], gt_xyxy[:, 2:])
    inter = (br - tl).clamp(min=0).prod(-1)
    area_p = (pred_xyxy[:, 2:] - pred_xyxy[:, :2]).prod(-1)
    area_g = (gt_xyxy[:, 2:] - gt_xyxy[:, :2]).prod(-1)
    union = area_p + area_g - inter
    iou = inter / union.clamp(min=1e-9)
    etl = torch.min(pred_xyxy[:, :2], gt_xyxy[:, :2])
    ebr = torch.max(pred_xyxy[:, 2:], gt_xyxy[:, 2:])
    enc = (ebr - etl).clamp(min=0).prod(-1)
    giou = iou - (enc - union) / enc.clamp(min=1e-9)
    giou_loss = (1 - giou).mean()
    l1 = F.l1_loss(pred_xyxy, gt_xyxy)

    # gaussian focal (mean reduction)
    gcls = _t(fb["search_cls"]).reshape(b, -1)
    pred_cls = cls_map.reshape(b, -1)
    pos = gcls.eq(1)
    neg_w = (1 - gcls) ** 4
    pos_l = (torch.log(pred_cls) * (1 - pred_cls) ** 2)[pos].sum()
    neg_l = (torch.log(1 - pred_cls) * pred_cls ** 2 * neg_w)[~pos].sum()
    cls_loss = -(pos_l + neg_l) / pred_cls.numel()

    # cont: weighted CE ignore -1
    def cont_gt_torch():
        out = []
        for shrink in (0.75, 1.0):
            cx = gt[:, 0] + gt[:, 2] / 2
            cy = gt[:, 1] + gt[:, 3] / 2
            w = gt[:, 2] * (shrink if shrink != 1.0 else 1.0)
            h = gt[:, 3] * (shrink if shrink != 1.0 else 1.0)
            bx = torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1) * sz
            cood = torch.arange(sz).float()[None] + 0.5
            x_in = (cood > bx[:, 0:1]) & (cood < bx[:, 2:3])
            y_in = (cood > bx[:, 1:2]) & (cood < bx[:, 3:4])
            m = y_in[:, :, None] & x_in[:, None, :]
            out.append((m, bx))
        (mc, bxc), (mt, _) = out
        cxi = torch.clamp(torch.floor((bxc[:, 0] + bxc[:, 2]) / 2).long(), 0, sz - 1)
        cyi = torch.clamp(torch.floor((bxc[:, 1] + bxc[:, 3]) / 2).long(), 0, sz - 1)
        mc[torch.arange(b), cyi, cxi] = True
        t = 1 - 2 * mt.long()
        t[mc] = 0
        return t.reshape(-1)

    wgt = torch.tensor([cfg.DATA.SEARCH.FACTOR ** 2, cfg.TRAIN.CTR_RATIO ** 2])
    wgt = wgt / wgt.sum()
    cont_loss = torch.nn.CrossEntropyLoss(weight=wgt, ignore_index=-1)(
        cont.reshape(-1, 2), cont_gt_torch())

    # aux: grid-sample positive + top-9 negatives
    logits = bb["logits"]  # (b, L, sz, sz)
    L = logits.shape[1]
    lg = logits.reshape(-1, 1, sz, sz)
    gtr = gt_xyxy[:, None, :].repeat(1, L, 1).reshape(-1, 4)
    ctrp = (gtr[:, :2] + gtr[:, 2:]).reshape(-1, 1, 1, 2) / 2
    pos_lg = F.grid_sample(lg, ctrp * 2 - 1, padding_mode="border",
                           align_corners=True).reshape(b * L, -1)
    cood = (torch.arange(sz).float() + 0.5) / sz
    x_in = (cood[None] > gtr[:, 0:1]) & (cood[None] < gtr[:, 2:3])
    y_in = (cood[None] > gtr[:, 1:2]) & (cood[None] < gtr[:, 3:4])
    inside = (y_in[:, :, None] & x_in[:, None, :]).reshape(b * L, -1)
    neg = torch.sort(lg.reshape(b * L, -1) + inside * (-1e9), dim=-1,
                     descending=True).values[:, :9]
    aux_logits = torch.cat([pos_lg, neg], -1)
    aux_loss = torch.nn.CrossEntropyLoss()(aux_logits,
                                           torch.zeros(b * L, dtype=torch.long))

    total = (cfg.TRAIN.GIOU_WEIGHT * giou_loss + cfg.TRAIN.L1_WEIGHT * l1
             + cls_loss + cfg.TRAIN.AUX_WEIGHT * aux_loss
             + cfg.TRAIN.CONT_WEIGHT * cont_loss)
    return {
        "Loss/total": total.item(), "Loss/giou": giou_loss.item(),
        "Loss/l1": l1.item(), "Loss/cls": cls_loss.item(),
        "Loss/aux": aux_loss.item(), "Loss/cont": cont_loss.item(),
    }


def test_training_objective_matches_torch_oracle():
    cfg = _cfg()
    model = tiny_model()
    variables = jax.jit(lambda r: model.init(r, *tiny_inputs(), train=False))(
        jax.random.PRNGKey(0))
    st = _reference_style_state(variables["params"], variables["batch_stats"])
    # temper the random head weights: trained checkpoints keep the sigmoid
    # towers unsaturated, but raw N(0,1) conv stacks saturate them to exactly
    # 0/1 in fp32 and the (unclipped, reference-faithful) oracle focal loss
    # becomes log(0)
    for k in list(st):
        if k.startswith("box_head.conv_"):
            if k.endswith("0.weight") or k.endswith("4.weight"):
                st[k] = st[k] * 0.05
            elif k.endswith("running_mean"):
                st[k] = st[k] * 0.0
            elif k.endswith("running_var"):
                st[k] = np.ones_like(st[k])
    params, bstats, _ = convert_uvltrack(st, variables["params"],
                                         variables["batch_stats"])
    conv_vars = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, bstats)}

    rng = np.random.default_rng(3)
    batch_np = synthetic_batch(rng, 4, n_search=2, template_size=32,
                               search_size=64, n_text=NT, vocab=100)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)

    loss_j, (metrics_j, _) = jax.jit(
        lambda v, b: forward_and_loss(model, v, b, cfg, train=False))(conv_vars, batch)

    # flatten the batch the same way the actor does
    from uvltrack_tpu.train.actor import flatten_batch

    fb = {k: np.asarray(v) for k, v in flatten_batch(batch).items()}
    pos_z = np.asarray(params["backbone"]["pos_embed_z"])
    pos_x = np.asarray(params["backbone"]["pos_embed_x"])
    oracle = TorchOracle(st, pos_z, pos_x)
    with torch.no_grad():
        want = torch_losses(oracle, fb, cfg)

    for key, val in want.items():
        got = float(metrics_j[key])
        assert np.isclose(got, val, rtol=2e-3, atol=2e-3), (key, got, val)
