"""Modality-Adaptive Box Head (MABH) and the distribution-based prompter.

Capability parity with the reference head
(lib/models/heads/modality_adaptive_box_head.py, lib/models/heads/utils.py):

* Prompter: mines target / distractor / background prompt tokens from
  template+context features via cosine-similarity pooling, splitting
  "background" into distractor vs pure background at the 0.25 CDF threshold
  (divide_background, heads/utils.py:45-55). For flag==1 (grounding) the bare
  learned query embeddings are used instead (switcher, :94-97).
* Head: four 5-stage conv towers (cls / offset / tracking-size /
  grounding-size) over the 2D search feature map, a contrastive
  prompt-vs-search score that multiplies the cls map, and an argmax box
  decode producing a dense (cx,cy,w,h) bbox_map (convert2bbox, :108-119).

Convs run NHWC (TPU-native layout); BatchNorm carries running stats in the
flax "batch_stats" collection.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import rotate_half_batch
from .mufe import l2_normalize, select_by_flag

NEG_INF = -1e20


class QConv(nn.Module):
    """nn.Conv twin (same {kernel, bias} tree, same lecun_normal/zeros
    init, NHWC/HWIO) whose kernel may ship as an int8 QuantizedTensor —
    conv is linear in the filter, so the per-out-channel scale factors out
    of the contraction exactly and the filter streams from HBM at half
    width (ops/quant.py; cfg.TPU.WEIGHT_QUANT)."""

    out: int
    ksize: tuple = (3, 3)
    padding: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import QuantizedTensor

        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.ksize, x.shape[-1], self.out))
        b = self.param("bias", nn.initializers.zeros, (self.out,))
        dt = self.dtype
        pad = [(self.padding, self.padding)] * 2
        dn = ("NHWC", "HWIO", "NHWC")
        if isinstance(w, QuantizedTensor):
            y = jax.lax.conv_general_dilated(
                x.astype(dt), w.q.astype(dt), (1, 1), pad,
                dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            y = y * w.scale + b.astype(jnp.float32)
            return y.astype(dt)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), (1, 1), pad, dimension_numbers=dn)
        return y + b.astype(dt)


class ConvBnRelu(nn.Module):
    """conv -> BN -> relu (uvltrack/utils.py:5-18). freeze_bn=True mirrors
    FrozenBatchNorm2d (:20-50): stats AND affine params fixed — the scale/
    bias live in batch_stats-style constants so no gradient flows (the
    reference's freeze_bn branch is a dead option in shipped configs, kept
    for capability parity)."""

    out: int
    dtype: jnp.dtype = jnp.float32
    freeze_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = QConv(self.out, dtype=self.dtype, name="conv")(x)
        if self.freeze_bn:
            scale = self.variable("batch_stats", "frozen_scale",
                                  lambda: jnp.ones(self.out, jnp.float32))
            bias = self.variable("batch_stats", "frozen_bias",
                                 lambda: jnp.zeros(self.out, jnp.float32))
            mean = self.variable("batch_stats", "frozen_mean",
                                 lambda: jnp.zeros(self.out, jnp.float32))
            var = self.variable("batch_stats", "frozen_var",
                                lambda: jnp.ones(self.out, jnp.float32))
            inv = scale.value * jax.lax.rsqrt(var.value + 1e-5)
            x = x.astype(jnp.float32) * inv + (bias.value - mean.value * inv)
        else:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class ConvTower(nn.Module):
    """conv(ch) -> conv(ch/2) -> conv(ch/4) -> conv(ch/8) -> 1x1 conv(out)."""

    channel: int
    out: int
    dtype: jnp.dtype = jnp.float32
    freeze_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channel
        for i, ch in enumerate([c, c // 2, c // 4, c // 8]):
            x = ConvBnRelu(ch, self.dtype, self.freeze_bn,
                           name=f"stage_{i}")(x, train)
        return nn.Conv(self.out, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="final")(x)


class PrompterMlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)


class DistributionPrompter(nn.Module):
    """Generates 3 prompt tokens (target, distractor, background)."""

    dim: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.query_embed = self.param("query_embed", nn.initializers.normal(1.0),
                                      (3, self.dim))
        self.mlp = PrompterMlp(int(self.dim * self.mlp_ratio), self.dim,
                               self.dtype, name="mlp")
        self.logit_scale = self.param(
            "logit_scale", lambda rng: jnp.asarray(np.log(1.0 / 0.07), jnp.float32))

    def divide_background(self, bgd_score: jnp.ndarray) -> jnp.ndarray:
        """Cells in the upper (1-0.25) probability mass are 'distractors'.

        bgd_score: (B, 1, N) softmax scores. Sort ascending, accumulate until
        the CDF reaches 0.25; the smallest score past that point is the
        distractor threshold.
        """
        values = jnp.sort(bgd_score, axis=-1)
        below = jnp.cumsum(values, axis=-1) < 0.25
        threshold = jnp.min(jnp.where(below, 1.0, values), axis=-1, keepdims=True)
        return bgd_score >= threshold

    def distribute_attn(self, tgt, sim_logit, tgt_mask):
        """tgt (B,N,C); sim_logit (B,1,N); tgt_mask (B,1,N) True=target cell."""
        sim32 = sim_logit.astype(jnp.float32)
        tgt_score = nn.softmax(jnp.where(tgt_mask, sim32, NEG_INF), axis=-1)
        tgt_token = jnp.einsum("bqn,bnc->bqc", tgt_score.astype(tgt.dtype), tgt)

        bgd_logit = jnp.where(tgt_mask, NEG_INF, sim32)
        bgd_score = nn.softmax(bgd_logit, axis=-1)
        dis_mask = self.divide_background(bgd_score)

        pure_bgd = nn.softmax(jnp.where(dis_mask, NEG_INF, bgd_logit), axis=-1)
        dis = nn.softmax(jnp.where(dis_mask, bgd_logit, NEG_INF), axis=-1)
        bgd_token = jnp.einsum("bqn,bnc->bqc", pure_bgd.astype(tgt.dtype), tgt)
        dis_token = jnp.einsum("bqn,bnc->bqc", dis.astype(tgt.dtype), tgt)
        return tgt_token, bgd_token, dis_token

    def __call__(self, tem, tem_mask, ctx, ctx_mask, cls_token, flag):
        """tem (B,Nz,C), ctx (B,Nx,C), masks (B,N*) bool, cls_token (B,C),
        flag (B,) -> prompts (B, 3, C)."""
        b = ctx.shape[0]
        src_q = jnp.broadcast_to(self.query_embed.astype(self.dtype)[None],
                                 (b, 3, self.dim))
        src_q = src_q.at[:, 0].add(cls_token.astype(self.dtype))

        tgt = jnp.concatenate([tem, ctx], axis=1)
        tgt_mask = jnp.concatenate([tem_mask, ctx_mask], axis=1)[:, None, :]

        sim = jnp.einsum("bc,bnc->bn", l2_normalize(cls_token), l2_normalize(tgt))
        sim = (sim * jnp.exp(self.logit_scale))[:, None, :]

        tgt_token, bgd_token, dis_token = self.distribute_attn(tgt, sim, tgt_mask)
        src = jnp.concatenate([tgt_token, dis_token, bgd_token], axis=1) + src_q
        src = self.mlp(src) + src

        # switcher: flag==1 (grounding) falls back to the bare query embeds
        group = jnp.stack([src, src_q, src], axis=1)  # (B, 3, 3, C)
        return select_by_flag(group, flag)


class MABH(nn.Module):
    """Modality-adaptive box head over the (feat_sz x feat_sz) search map."""

    inplanes: int
    channel: int
    feat_sz: int
    stride: int = 16
    cls_tokenize: bool = True
    offset_sigmoid: bool = True
    joint_cls: bool = False
    softmax_one: bool = False
    # plumb of the reference conv()'s freeze_bn option (uvltrack/utils.py:6,
    # never set by the shipped head builder) down the four towers
    freeze_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.conv_cls = ConvTower(self.channel, 1, self.dtype,
                                  self.freeze_bn, name="conv_cls")
        self.conv_offset = ConvTower(self.channel, 2, self.dtype,
                                     self.freeze_bn, name="conv_offset")
        self.conv_bbox = ConvTower(self.channel, 2, self.dtype,
                                   self.freeze_bn, name="conv_bbox")
        self.conv_bbox_grounding = ConvTower(self.channel, 2, self.dtype,
                                             self.freeze_bn,
                                             name="conv_bbox_grounding")
        self.prompter = DistributionPrompter(self.inplanes, dtype=self.dtype,
                                             name="prompter")
        self.logit_scale = self.param(
            "logit_scale", lambda rng: jnp.asarray(np.log(1.0 / 0.07), jnp.float32))
        # flattened grid coords: row-major cell k=(row,col) -> (x=col, y=row)
        f = self.feat_sz
        cols = np.tile(np.arange(f, dtype=np.float32), f)
        rows = np.repeat(np.arange(f, dtype=np.float32), f)
        if self.offset_sigmoid:
            self.coordinate = jnp.asarray(np.stack([cols, rows]))  # (2, s)
        else:
            self.coordinate = jnp.asarray(np.stack([cols, rows]) + 0.5)

    # ------------------------------------------------------------- contrast
    def cont_score_from_prompt(self, search, prompt, test: bool):
        """search (B,Nx,C) x prompt (B,3,C) -> contrastive score columns.

        Train: (B, Nx, 2) = [target, max(distractor, background[, 0])].
        Test (softmax_one): (B, Nx, 3) with a zero third column.
        """
        raw = jnp.exp(self.logit_scale) * jnp.einsum(
            "bnc,bpc->bnp", l2_normalize(search), l2_normalize(prompt))
        target = raw[:, :, :1]
        rest = raw[:, :, 1:]
        if self.softmax_one:
            zero = jnp.zeros_like(target)
            neg = jnp.max(jnp.concatenate([rest, zero], axis=-1), axis=-1, keepdims=True)
        else:
            neg = jnp.max(rest, axis=-1, keepdims=True)
        cols = [target, neg]
        if test and self.softmax_one:
            cols.append(jnp.zeros_like(target))
        return jnp.concatenate(cols, axis=-1)

    # --------------------------------------------------------------- decode
    def convert2bbox(self, cls_map, offset_map, size_map, cont_score):
        """cls_map (B,s); offset/size (B,2,s); cont_score (B,s,K).

        Returns (bbox_map (B,s,4) cxcywh normalized, best bbox (B,1,4)).
        """
        b, s = cls_map.shape
        cont0 = nn.softmax(cont_score.astype(jnp.float32), axis=-1)[:, :, 0]
        merged = cls_map * cont0
        best = jnp.argmax(merged, axis=-1)
        ctr = (self.coordinate[None] + offset_map) / self.feat_sz  # (B,2,s)
        bbox_map = jnp.concatenate([ctr, size_map], axis=1).transpose(0, 2, 1)
        bbox = jnp.take_along_axis(bbox_map, best[:, None, None], axis=1)
        return bbox_map, bbox

    # -------------------------------------------------------------- forward
    def __call__(self, out_dict: dict, prompt: Optional[jnp.ndarray] = None,
                 train: bool = False):
        flag = out_dict["flag"]
        search = out_dict["search"]  # (B, s, C)
        b, s, c = search.shape
        f = self.feat_sz

        if prompt is None:
            # training path: mine prompts from half-batch-rotated context
            token = select_by_flag(
                jnp.concatenate([out_dict["vis_token"], out_dict["txt_token"],
                                 (out_dict["vis_token"] + out_dict["txt_token"]) / 2],
                                axis=1), flag)
            # same rotation the actor applies to context_mask — keep the
            # pair in one helper so the convention can't drift
            context = rotate_half_batch(search)
            prompt = self.prompter(out_dict["template"], out_dict["template_mask"],
                                   context, out_dict["context_mask"], token, flag)
            cont_score = self.cont_score_from_prompt(search, prompt, test=False)
        else:
            cont_score = self.cont_score_from_prompt(search, prompt, test=True)

        x2d = search.reshape(b, f, f, c)  # NHWC
        if self.cls_tokenize:
            token2d = select_by_flag(
                jnp.concatenate([out_dict["vis_token"], out_dict["txt_token"],
                                 (out_dict["vis_token"] + out_dict["txt_token"]) / 2],
                                axis=1), flag)[:, None, None, :]
            cls_in = x2d * token2d
        else:
            cls_in = x2d
        cls_map = nn.sigmoid(self.conv_cls(cls_in, train).astype(jnp.float32))
        cls_map = cls_map.reshape(b, s)

        offset = self.conv_offset(x2d, train).astype(jnp.float32)
        if self.offset_sigmoid:
            offset = nn.sigmoid(offset)
        offset = offset.reshape(b, s, 2).transpose(0, 2, 1)  # (B,2,s)

        size_tr = nn.sigmoid(self.conv_bbox(x2d, train).astype(jnp.float32))
        size_gr = nn.sigmoid(self.conv_bbox_grounding(x2d, train).astype(jnp.float32))
        size_tr = size_tr.reshape(b, s, 2).transpose(0, 2, 1)
        size_gr = size_gr.reshape(b, s, 2).transpose(0, 2, 1)
        size_map = select_by_flag(jnp.stack([size_tr, size_gr, size_tr], axis=1), flag)

        bbox_map, bbox = self.convert2bbox(cls_map, offset, size_map, cont_score)
        cont0_2d = nn.softmax(cont_score.astype(jnp.float32), axis=-1)[:, :, 0]

        out = dict(out_dict)
        out.update({
            "cls_score": cls_map * cont0_2d if self.joint_cls else cls_map,
            "bbox_map": bbox_map,
            "pred_boxes": bbox,
            "cont_score": cont_score,
            "prompts": prompt,
            "cls_score_test": cls_map,
        })
        return out

    def forward_prompt(self, out_dict: dict) -> jnp.ndarray:
        """Recompute prompts from cached backbone features (tracker update)."""
        flag = out_dict["flag"]
        token = select_by_flag(
            jnp.concatenate([out_dict["vis_token"], out_dict["txt_token"],
                             (out_dict["vis_token"] + out_dict["txt_token"]) / 2],
                            axis=1), flag)
        return self.prompter(out_dict["template"], out_dict["template_mask"],
                             out_dict["search"], out_dict["context_mask"], token, flag)
