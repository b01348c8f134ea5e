"""End-to-end numerical parity: a torch implementation of the reference
equations (written here from the documented semantics, reference-style
parameter names) vs the JAX model loaded through convert_uvltrack.

This is the strongest converter+semantics guarantee available without the
released checkpoints: if this passes, loading a real UVLTrack .pth.tar will
reproduce the reference forward to float tolerance.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from uvltrack_tpu.models.convert import convert_uvltrack  # noqa: E402
from test_convert import _reference_style_state  # noqa: E402
from test_model import TINY, NT, tiny_inputs, tiny_model  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`

C = TINY["embed_dim"]
HEADS = TINY["num_heads"]
NZ = 4  # (32/16)^2
NX = 16  # (64/16)^2
FUSION = set(TINY["fusion_layers"])
CONT = sorted(TINY["cont_loss_layers"])
DEPTH = TINY["depth"]
N_BERT = 2
FEAT = 4


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


class TorchOracle:
    """Reference-equation forward using the synthetic state dict's names."""

    def __init__(self, st, pos_z, pos_x):
        self.st = {k: _t(v) for k, v in st.items()}
        self.pos_z = _t(pos_z)
        self.pos_x = _t(pos_x)

    def linear(self, name, x):
        return x @ self.st[name + ".weight"].T + self.st[name + ".bias"]

    def ln(self, name, x, eps):
        return F.layer_norm(x, (x.shape[-1],), self.st[name + ".weight"],
                            self.st[name + ".bias"], eps=eps)

    # ---------------------------------------------------------------- blocks
    def vit_block(self, i, x, key_masked):
        p = f"backbone.vit.blocks.{i}."
        b, n, c = x.shape
        d = c // HEADS
        y = self.ln(p + "norm1", x, 1e-6)
        qkv = self.linear(p + "attn.qkv", y).reshape(b, n, 3, HEADS, d)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        s = (q @ k.transpose(-2, -1)) * d ** -0.5
        if key_masked is not None:
            s = s.masked_fill(torch.tensor(key_masked)[:, None, None, :], -1e10)
        a = (s.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(b, n, c)
        x = x + self.linear(p + "attn.proj", a)
        y = self.ln(p + "norm2", x, 1e-6)
        h = F.gelu(self.linear(p + "mlp.fc1", y))
        return x + self.linear(p + "mlp.fc2", h)

    def bert_layer(self, i, x, bias):
        p = f"backbone.bert.encoder.layer.{i}."
        b, n, c = x.shape
        d = c // HEADS

        def heads(t):
            return t.reshape(b, n, HEADS, d).permute(0, 2, 1, 3)

        q = heads(self.linear(p + "attention.self.query", x))
        k = heads(self.linear(p + "attention.self.key", x))
        v = heads(self.linear(p + "attention.self.value", x))
        s = (q @ k.transpose(-2, -1)) / math.sqrt(d) + bias
        ctx = (s.softmax(-1) @ v).permute(0, 2, 1, 3).reshape(b, n, c)
        ctx = self.linear(p + "attention.output.dense", ctx)
        x = F.layer_norm(ctx + x, (c,), self.st[p + "attention.output.LayerNorm.gamma"],
                         self.st[p + "attention.output.LayerNorm.beta"], eps=1e-12)
        h = F.gelu(self.linear(p + "intermediate.dense", x))
        h = self.linear(p + "output.dense", h)
        return F.layer_norm(h + x, (c,), self.st[p + "output.LayerNorm.gamma"],
                            self.st[p + "output.LayerNorm.beta"], eps=1e-12)

    def tower(self, name, x, bn_eps=1e-5):
        # x: (B, C, H, W) NCHW
        for i in range(4):
            p = f"{name}.{i}."
            x = F.conv2d(x, self.st[p + "0.weight"], self.st[p + "0.bias"],
                         padding=1)
            x = F.batch_norm(x, self.st[p + "1.running_mean"],
                             self.st[p + "1.running_var"],
                             self.st[p + "1.weight"], self.st[p + "1.bias"],
                             training=False, eps=bn_eps)
            x = F.relu(x)
        return F.conv2d(x, self.st[f"{name}.4.weight"], self.st[f"{name}.4.bias"])

    # --------------------------------------------------------------- forward
    def backbone(self, template, search, text_ids, text_mask, flag):
        st = self.st
        b = template.shape[0]
        # patchify (NCHW conv, stride=patch)
        z = F.conv2d(template, st["backbone.vit.patch_embed.proj.weight"],
                     st["backbone.vit.patch_embed.proj.bias"], stride=16)
        z = z.flatten(2).transpose(1, 2) + self.pos_z
        x = F.conv2d(search, st["backbone.vit.patch_embed.proj.weight"],
                     st["backbone.vit.patch_embed.proj.bias"], stride=16)
        x = x.flatten(2).transpose(1, 2) + self.pos_x
        cls = st["backbone.vit.cls_token"].expand(b, -1, -1)
        img = torch.cat([cls, z, x], 1)

        # bert embeddings
        ids = torch.tensor(np.asarray(text_ids), dtype=torch.long)
        words = st["backbone.bert.embeddings.word_embeddings.weight"][ids]
        pos = st["backbone.bert.embeddings.position_embeddings.weight"][: ids.shape[1]][None]
        types = st["backbone.bert.embeddings.token_type_embeddings.weight"][0][None, None]
        txt = F.layer_norm(words + pos + types, (C,),
                           st["backbone.bert.embeddings.LayerNorm.gamma"],
                           st["backbone.bert.embeddings.LayerNorm.beta"], eps=1e-12)
        tm = _t(text_mask)
        bert_bias = ((1.0 - tm) * -10000.0)[:, None, None, :]

        flag_t = torch.tensor(np.asarray(flag)).reshape(-1, 1).float()
        # cat_mask semantics
        x_m = torch.ones(b, NX)
        z_m = torch.ones(b, NZ) * (flag_t != 1)
        c_m = torch.ones(b, 1) * (flag_t != 1)
        t_m = tm * (flag_t != 0)
        joint_masked = ~torch.cat([c_m, z_m, x_m, t_m], 1).bool()
        visual_masked = ~torch.cat([c_m, z_m, x_m], 1).bool()

        modal = st["backbone.vit.modal_embed"]
        logit_scale = st["backbone.logit_scale"].exp()
        logits_list = []
        for i in range(DEPTH):
            if i in FUSION:
                e = torch.cat([img + modal[0], txt + modal[1]], 1)
                e = self.vit_block(i, e, joint_masked.numpy())
                img, txt = e[:, : 1 + NZ + NX], e[:, 1 + NZ + NX:]
            else:
                img = self.vit_block(i, img, visual_masked.numpy())
                txt = self.bert_layer(i, txt, bert_bias)
            if i in CONT:
                xs = img[:, 1 + NZ:]
                vis_tok = img[:, :1]
                txt_tok = txt[:, :1]  # cls mode
                vl = logit_scale * (F.normalize(xs, dim=-1)
                                    @ F.normalize(vis_tok, dim=-1).transpose(-2, -1))
                tl = logit_scale * (F.normalize(xs, dim=-1)
                                    @ F.normalize(txt_tok, dim=-1).transpose(-2, -1))
                group = torch.stack([vl, tl, (vl + tl) / 2], 1)
                bid = torch.arange(b)
                logits_list.append(group[bid, np.asarray(flag)])
        out = {
            "search": img[:, 1 + NZ:],
            "template": img[:, 1: 1 + NZ],
            "vis_token": img[:, :1],
            "txt_token": txt[:, :1],
            "text": txt,
            "logits": torch.stack(logits_list, 1).reshape(b, -1, FEAT, FEAT),
        }
        return out

    def prompter(self, tem, tem_mask, ctx, ctx_mask, cls_token, flag):
        st = self.st
        b = ctx.shape[0]
        src_q = st["box_head.prompter.query_embed.weight"][None].repeat(b, 1, 1).clone()
        src_q[:, 0] = src_q[:, 0] + cls_token
        tgt = torch.cat([tem, ctx], 1)
        tgt_mask = torch.cat([_t(tem_mask), _t(ctx_mask)], 1).bool()[:, None, :]
        scale = st["box_head.prompter.logit_scale"].exp()
        sim = (F.normalize(cls_token, dim=-1).unsqueeze(1)
               @ F.normalize(tgt, dim=-1).transpose(-2, -1)) * scale
        tgt_score = sim.masked_fill(~tgt_mask, -1e20).softmax(-1)
        tgt_token = tgt_score @ tgt
        bgd_logit = sim.masked_fill(tgt_mask, -1e20)
        bgd_score = bgd_logit.softmax(-1)
        values, _ = bgd_score.sort(-1)
        below = values.cumsum(-1) < 0.25
        threshold = values.masked_fill(below, 1.0).min(-1, keepdim=True).values
        dis_mask = bgd_score >= threshold
        pure = bgd_logit.masked_fill(dis_mask, -1e20).softmax(-1) @ tgt
        dis = bgd_logit.masked_fill(~dis_mask, -1e20).softmax(-1) @ tgt
        src = torch.cat([tgt_token, dis, pure], 1) + src_q
        h = F.gelu(self.linear("box_head.prompter.mlp.fc1", src))
        src = self.linear("box_head.prompter.mlp.fc2", h) + src
        group = torch.stack([src, src_q, src], 1)
        bid = torch.arange(b)
        return group[bid, np.asarray(flag)]

    def head(self, out, prompt, flag):
        st = self.st
        b = out["search"].shape[0]
        scale = st["box_head.logit_scale"].exp()
        raw = scale * (F.normalize(out["search"], dim=-1)
                       @ F.normalize(prompt, dim=-1).transpose(-2, -1))
        ext = torch.zeros_like(raw[:, :, :1])
        # softmax_one test path: 3 columns
        cont = torch.cat([raw[:, :, :1],
                          torch.cat([raw[:, :, 1:], ext], -1).max(-1, keepdim=True).values,
                          ext], -1)
        x2d = out["search"].transpose(-2, -1).reshape(b, C, FEAT, FEAT)
        cls_map = torch.sigmoid(self.tower("box_head.conv_cls", x2d)).squeeze(1)
        offset = torch.sigmoid(self.tower("box_head.conv_offset", x2d))
        size_tr = torch.sigmoid(self.tower("box_head.conv_bbox", x2d))
        size_gr = torch.sigmoid(self.tower("box_head.conv_bbox_grounding", x2d))
        group = torch.stack([size_tr, size_gr, size_tr], 1)
        bid = torch.arange(b)
        size_map = group[bid, np.asarray(flag)]

        cls_flat = cls_map.reshape(b, -1) * cont.softmax(-1)[:, :, 0]
        k = cls_flat.argmax(-1)
        xs, ys = torch.meshgrid(torch.arange(FEAT), torch.arange(FEAT), indexing="ij")
        coord = torch.cat([ys.reshape(-1)[None], xs.reshape(-1)[None]])[None].float()
        ctr = (coord + offset.reshape(b, 2, -1)) / FEAT
        bbox_map = torch.cat([ctr, size_map.reshape(b, 2, -1)], 1).transpose(-2, -1)
        bbox = bbox_map[bid, k]
        return {
            "bbox_map": bbox_map,
            "pred_boxes": bbox.unsqueeze(1),
            "cls_score_test": cls_map.reshape(b, -1),
            "cont_score": cont,
        }


def test_full_forward_test_parity():
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(jax.random.PRNGKey(0))
    st = _reference_style_state(variables["params"], variables["batch_stats"])
    # make BN stats realistic (positive var already ensured)
    new_params, new_bstats, _ = convert_uvltrack(st, variables["params"],
                                                 variables["batch_stats"])
    conv_vars = {"params": jax.tree_util.tree_map(jnp.asarray, new_params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, new_bstats)}

    t, s, ti, tm, zm, cm, flag = tiny_inputs(flag_val=2)
    prompt_j = jax.jit(lambda v, *a: model.apply(
        v, *a, method=type(model).forward_prompt_init))(
        conv_vars, t, s, ti, tm, zm, cm, flag)
    out_j = jax.jit(lambda v, *a: model.apply(
        v, *a, method=type(model).forward_test))(
        conv_vars, t, s, ti, tm, prompt_j, flag)

    pos_z = np.asarray(new_params["backbone"]["pos_embed_z"])
    pos_x = np.asarray(new_params["backbone"]["pos_embed_x"])
    oracle = TorchOracle(st, pos_z, pos_x)
    with torch.no_grad():
        # torch oracle uses NCHW images
        t_t = _t(np.asarray(t)).permute(0, 3, 1, 2)
        s_t = _t(np.asarray(s)).permute(0, 3, 1, 2)
        bb = oracle.backbone(t_t, s_t, ti, tm, flag)
        # flag-selected token: [vis, txt, (vis+txt)/2][flag]
        tok_group = torch.cat([bb["vis_token"], bb["txt_token"],
                               (bb["vis_token"] + bb["txt_token"]) / 2], 1)
        token = tok_group[torch.arange(2), np.asarray(flag)]
        prompt_t = oracle.prompter(bb["template"], np.asarray(zm), bb["search"],
                                   np.asarray(cm), token, flag)
        out_t = oracle.head(bb, prompt_t, flag)

    np.testing.assert_allclose(np.asarray(prompt_j), prompt_t.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["cont_score"]),
                               out_t["cont_score"].numpy(), atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out_j["cls_score_test"]),
                               out_t["cls_score_test"].numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["bbox_map"]),
                               out_t["bbox_map"].numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["pred_boxes"]),
                               out_t["pred_boxes"].numpy(), atol=1e-4, rtol=1e-3)
    # backbone intermediate
    np.testing.assert_allclose(np.asarray(out_j["logits"]),
                               bb["logits"].numpy(), atol=5e-3, rtol=1e-2)

    # -------- grounding scenario (flag=1): zero template, masks empty,
    # the prompter switcher must return bare query embeds; CLS+template are
    # masked as attention keys.
    flag1 = jnp.ones((2,), jnp.int32)
    t0_ = jnp.zeros_like(t)
    zm0 = jnp.zeros_like(zm)
    cm0 = jnp.zeros_like(cm)
    out1_j = jax.jit(lambda v, *a: model.apply(
        v, *a, train=False))(conv_vars, t0_, s, ti, tm, zm0, cm0, flag1)
    with torch.no_grad():
        t0_t = _t(np.asarray(t0_)).permute(0, 3, 1, 2)
        bb1 = oracle.backbone(t0_t, s_t, ti, tm, flag1)
        tok1 = torch.cat([bb1["vis_token"], bb1["txt_token"],
                          (bb1["vis_token"] + bb1["txt_token"]) / 2], 1)[
            torch.arange(2), np.asarray(flag1)]
        prompt1_t = oracle.prompter(bb1["template"], np.asarray(zm0),
                                    torch.cat([bb1["search"][1:], bb1["search"][:1]], 0),
                                    np.asarray(cm0), tok1, flag1)
        out1_t = oracle.head(bb1, prompt1_t, flag1)
    np.testing.assert_allclose(np.asarray(out1_j["cls_score_test"]),
                               out1_t["cls_score_test"].numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out1_j["bbox_map"]),
                               out1_t["bbox_map"].numpy(), atol=1e-4, rtol=1e-3)
