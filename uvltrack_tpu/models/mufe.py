"""Modality-Unified Feature Extractor (MUFE).

Capability parity with the reference extractor
(lib/models/backbones/modality_unified_feature_extractor.py): one ViT and a
truncated BERT run layer-by-layer; below the fusion depth the two streams use
separate attention, at fusion layers a single joint attention runs over
[CLS | template | search | text] with a flag-conditioned key mask
(cat_mask, :43-50); per-layer contrastive logits align search tokens with a
flag-selected reference token (:85-93).

flag semantics (B,) int32: 0=BBOX (text masked), 1=NL (CLS+template masked),
2=NL+BBOX (nothing extra masked).
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .bert import BertConfig, BertEmbeddings, BertLayer, bert_attention_bias
from .vit import PatchEmbed, VitBlock, sincos_2d


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return x.astype(jnp.float32) / jnp.maximum(n, eps)


def select_by_flag(group: jnp.ndarray, flag: jnp.ndarray) -> jnp.ndarray:
    """group: (B, 3, ...), flag: (B,) in {0,1,2} -> (B, ...)."""
    idx = flag.reshape(flag.shape[0], *([1] * (group.ndim - 1)))
    return jnp.take_along_axis(group, idx, axis=1).squeeze(1)


class MUFE(nn.Module):
    # ViT geometry
    embed_dim: int
    depth: int
    num_heads: int
    template_size: int
    search_size: int
    patch_size: int = 16
    # interleave schedule
    fusion_layers: Sequence[int] = ()
    cont_loss_layers: Sequence[int] = ()
    txt_token_mode: str = "cls"
    learnable_pos: bool = False
    # text encoder
    bert: BertConfig = BertConfig()
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    drop_path_rate: float = 0.0  # stochastic depth, linear schedule over depth

    @property
    def num_patches_z(self) -> int:
        return (self.template_size // self.patch_size) ** 2

    @property
    def num_patches_x(self) -> int:
        return (self.search_size // self.patch_size) ** 2

    def setup(self):
        e = self.embed_dim
        self.patch_embed = PatchEmbed(e, self.patch_size, self.dtype, name="patch_embed")
        self.cls_token = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, e))
        gz = self.template_size // self.patch_size
        gx = self.search_size // self.patch_size
        self.pos_embed_z = self.param(
            "pos_embed_z", lambda rng: jnp.asarray(sincos_2d(e, gz)[None], jnp.float32))
        self.pos_embed_x = self.param(
            "pos_embed_x", lambda rng: jnp.asarray(sincos_2d(e, gx)[None], jnp.float32))
        self.modal_embed = self.param("modal_embed", nn.initializers.normal(0.02), (2, e))
        block = VitBlock
        if self.remat:
            # deterministic (arg 2 after self) must stay a python bool
            block = nn.remat(VitBlock, static_argnums=(3,))
        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        self.blocks = [
            block(e, self.num_heads, 4.0, self.dtype, drop_path=float(dpr[i]),
                  name=f"block_{i}")
            for i in range(self.depth)
        ]
        self.bert_embeddings = BertEmbeddings(self.bert, self.dtype, name="bert_embeddings")
        n_bert = min(self.fusion_layers) if len(self.fusion_layers) else self.bert.num_layers
        bert_layer = nn.remat(BertLayer) if self.remat else BertLayer
        self.bert_layers = [
            bert_layer(self.bert, self.dtype, name=f"bert_layer_{i}") for i in range(n_bert)
        ]
        self.text_proj = (
            nn.Dense(e, dtype=self.dtype, param_dtype=jnp.float32, name="text_proj")
            if self.bert.hidden_size != e
            else None
        )
        self.logit_scale = self.param(
            "logit_scale", lambda rng: jnp.asarray(np.log(1.0 / 0.07), jnp.float32))

    # ------------------------------------------------------------------ masks
    def cat_mask(self, text_mask: jnp.ndarray, flag: jnp.ndarray):
        """Returns (joint_key_masked (B, 1+Nz+Nx+Nt), visual_key_masked)."""
        b = flag.shape[0]
        is_nl = (flag == 1)[:, None]  # (B,1)
        c_masked = jnp.broadcast_to(is_nl, (b, 1))
        z_masked = jnp.broadcast_to(is_nl, (b, self.num_patches_z))
        x_masked = jnp.zeros((b, self.num_patches_x), bool)
        t_masked = (flag == 0)[:, None] | (text_mask == 0)
        joint = jnp.concatenate([c_masked, z_masked, x_masked, t_masked], axis=1)
        visual = jnp.concatenate([c_masked, z_masked, x_masked], axis=1)
        return joint, visual

    # ---------------------------------------------------------------- streams
    def patchify(self, template: jnp.ndarray, search: jnp.ndarray) -> jnp.ndarray:
        """NHWC template/search -> (B, 1+Nz+Nx, C) [CLS | z | x] tokens."""
        # When learnable_pos is False the optimizer masks pos-embed updates
        # (see train/optim.py), matching requires_grad=False in the reference.
        z = self.patch_embed(template) + self.pos_embed_z.astype(self.dtype)
        x = self.patch_embed(search) + self.pos_embed_x.astype(self.dtype)
        cls = jnp.broadcast_to(self.cls_token.astype(self.dtype),
                               (z.shape[0], 1, self.embed_dim))
        return jnp.concatenate([cls, z, x], axis=1)

    def txt_token(self, txt_feat: jnp.ndarray, text_mask: jnp.ndarray) -> jnp.ndarray:
        if self.txt_token_mode == "mean":
            m = text_mask[..., None].astype(txt_feat.dtype)
            return (txt_feat * m).sum(1, keepdims=True) / jnp.maximum(m.sum(1, keepdims=True), 1e-6)
        return txt_feat[:, :1]

    def contrastive_logits(self, img_feat, txt_feat, text_mask, flag):
        x = img_feat[:, 1 + self.num_patches_z :]
        vis_token = img_feat[:, :1]
        txt_tok = self.txt_token(txt_feat, text_mask)
        scale = jnp.exp(self.logit_scale)
        xn = l2_normalize(x)
        vis_logits = scale * jnp.einsum("bnc,bmc->bnm", xn, l2_normalize(vis_token))
        txt_logits = scale * jnp.einsum("bnc,bmc->bnm", xn, l2_normalize(txt_tok))
        group = jnp.stack([vis_logits, txt_logits, (vis_logits + txt_logits) / 2], axis=1)
        return select_by_flag(group, flag)  # (B, Nx, 1)

    # ---------------------------------------------------------- cached text
    def encode_text(self, text_ids, text_mask):
        """The pre-fusion text stream: embeddings -> text_proj -> the
        n_bert = min(fusion_layers) BertLayers, exactly as the main loop
        applies them for i < min(fusion_layers) (the interleave schedule is
        a contiguous tail — the loop indexes bert_layers[i] and would fail
        otherwise). Depends only on (text_ids, text_mask), which are
        constant for a whole tracking sequence, so the tracker computes it
        ONCE at initialize: bs=1 inference is weight-read bound and the
        pre-fusion BERT layers are ~85 MB bf16 of per-frame HBM traffic
        (6 x 7.1M params at ViT-B) the step then never pays. The reference
        re-runs them every frame (lib/models/uvltrack/uvltrack.py forward
        -> bert per call)."""
        txt_feat = self.bert_embeddings(text_ids)
        if self.text_proj is not None:
            txt_feat = self.text_proj(txt_feat)
        bert_bias = bert_attention_bias(text_mask)
        for layer in self.bert_layers:
            txt_feat = layer(txt_feat, bert_bias)
        return txt_feat

    def forward_cached_text(self, template, search, txt_feat, text_mask, flag):
        """Inference forward consuming precomputed pre-fusion text features
        (from encode_text). Identical math to __call__ minus the per-layer
        contrastive logits, which nothing consumes at test time (the head
        derives cont_score from the prompt; `logits` feeds only the training
        aux loss)."""
        img_feat = self.patchify(template, search)
        joint_masked, visual_masked = self.cat_mask(text_mask, flag)
        n_img = img_feat.shape[1]
        fusion = set(self.fusion_layers)
        for i in range(self.depth):
            if i in fusion:
                e = jnp.concatenate(
                    [img_feat + self.modal_embed[0].astype(self.dtype),
                     txt_feat + self.modal_embed[1].astype(self.dtype)], axis=1)
                e = self.blocks[i](e, joint_masked, True)
                img_feat, txt_feat = e[:, :n_img], e[:, n_img:]
            else:
                img_feat = self.blocks[i](img_feat, visual_masked, True)
        vis_token = img_feat[:, :1]
        z = img_feat[:, 1 : 1 + self.num_patches_z]
        x = img_feat[:, 1 + self.num_patches_z :]
        return {
            "search": x,
            "template": z,
            "text": txt_feat,
            "vis_token": vis_token,
            "txt_token": self.txt_token(txt_feat, text_mask),
            "flag": flag.reshape(-1),
        }

    # ---------------------------------------------------------------- forward
    def __call__(self, template, search, text_ids, text_mask, flag,
                 train: bool = False):
        """template/search: NHWC float; text_ids: (B,Nt) int; text_mask: (B,Nt);
        flag: (B,) int32. Returns the backbone feature dict. train=True
        enables stochastic depth (needs a 'dropout' rng when
        drop_path_rate > 0)."""
        det = not (train and self.drop_path_rate > 0)
        img_feat = self.patchify(template, search)
        txt_feat = self.bert_embeddings(text_ids)
        if self.text_proj is not None:
            txt_feat = self.text_proj(txt_feat)
        bert_bias = bert_attention_bias(text_mask)
        joint_masked, visual_masked = self.cat_mask(text_mask, flag)

        n_img = img_feat.shape[1]
        fusion = set(self.fusion_layers)
        cont = set(self.cont_loss_layers)
        logits_list: List[jnp.ndarray] = []
        for i in range(self.depth):
            if i in fusion:
                e = jnp.concatenate(
                    [img_feat + self.modal_embed[0].astype(self.dtype),
                     txt_feat + self.modal_embed[1].astype(self.dtype)], axis=1)
                e = self.blocks[i](e, joint_masked, det)
                img_feat, txt_feat = e[:, :n_img], e[:, n_img:]
            else:
                img_feat = self.blocks[i](img_feat, visual_masked, det)
                txt_feat = self.bert_layers[i](txt_feat, bert_bias)
            if i in cont:
                logits_list.append(self.contrastive_logits(img_feat, txt_feat, text_mask, flag))

        vis_token = img_feat[:, :1]
        z = img_feat[:, 1 : 1 + self.num_patches_z]
        x = img_feat[:, 1 + self.num_patches_z :]
        b, s, _ = x.shape
        fsz = int(round(s ** 0.5))
        out = {
            "search": x,
            "template": z,
            "text": txt_feat,
            "vis_token": vis_token,
            "txt_token": self.txt_token(txt_feat, text_mask),
            "flag": flag.reshape(-1),
        }
        if logits_list:
            out["logits"] = jnp.stack(logits_list, axis=1).reshape(b, -1, fsz, fsz)
        return out
