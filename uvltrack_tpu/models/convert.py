"""PyTorch checkpoint -> flax variables converters.

Covers the three checkpoint families the reference loads:
- full UVLTrack checkpoints, dict key 'net' (lib/test/tracker/uvltrack.py:24)
- MAE-pretrained ViT, dict key 'model'  (modality_unified_feature_extractor.py:24)
- BERT pytorch_model.bin inside the tar.gz (bert_backbone.py:526-623, incl.
  the gamma/beta -> weight/bias renaming of old checkpoints)

All converters take a {name: np.ndarray} state dict (use load_torch_file to
read .pth/.bin via torch CPU) and return updated copies of the flax
params/batch_stats trees. Unknown keys are returned so callers can log them.
"""

from __future__ import annotations

import copy
import re
from typing import Dict, List, Tuple

import numpy as np


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy (CPU, no grad state)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("net", "model", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items() if hasattr(v, "shape") or isinstance(v, np.ndarray)}


def _t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _t_conv(w: np.ndarray) -> np.ndarray:
    # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _set(tree: dict, path: List[str], value: np.ndarray, strict_shape=True):
    node = tree
    for k in path[:-1]:
        node = node[k]
    old = node[path[-1]]
    if strict_shape and tuple(old.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{old.shape} vs {value.shape}")
    node[path[-1]] = value.astype(np.asarray(old).dtype)


def _vit_block_rules(i: int, dst: str):
    b = f"blocks.{i}."
    d = [dst, f"block_{i}"]
    return [
        (b + "norm1.weight", d + ["norm1", "scale"], None),
        (b + "norm1.bias", d + ["norm1", "bias"], None),
        (b + "attn.qkv.weight", d + ["qkv", "kernel"], _t_linear),
        (b + "attn.qkv.bias", d + ["qkv", "bias"], None),
        (b + "attn.proj.weight", d + ["proj", "kernel"], _t_linear),
        (b + "attn.proj.bias", d + ["proj", "bias"], None),
        (b + "norm2.weight", d + ["norm2", "scale"], None),
        (b + "norm2.bias", d + ["norm2", "bias"], None),
        (b + "mlp.fc1.weight", d + ["mlp", "fc1", "kernel"], _t_linear),
        (b + "mlp.fc1.bias", d + ["mlp", "fc1", "bias"], None),
        (b + "mlp.fc2.weight", d + ["mlp", "fc2", "kernel"], _t_linear),
        (b + "mlp.fc2.bias", d + ["mlp", "fc2", "bias"], None),
    ]


def _bert_layer_rules(i: int, src_prefix: str, dst: str):
    b = f"{src_prefix}encoder.layer.{i}."
    d = [dst, f"bert_layer_{i}"]
    return [
        (b + "attention.self.query.weight", d + ["query", "kernel"], _t_linear),
        (b + "attention.self.query.bias", d + ["query", "bias"], None),
        (b + "attention.self.key.weight", d + ["key", "kernel"], _t_linear),
        (b + "attention.self.key.bias", d + ["key", "bias"], None),
        (b + "attention.self.value.weight", d + ["value", "kernel"], _t_linear),
        (b + "attention.self.value.bias", d + ["value", "bias"], None),
        (b + "attention.output.dense.weight", d + ["attn_out", "kernel"], _t_linear),
        (b + "attention.output.dense.bias", d + ["attn_out", "bias"], None),
        (b + "attention.output.LayerNorm.weight", d + ["attn_norm", "scale"], None),
        (b + "attention.output.LayerNorm.bias", d + ["attn_norm", "bias"], None),
        (b + "intermediate.dense.weight", d + ["intermediate", "kernel"], _t_linear),
        (b + "intermediate.dense.bias", d + ["intermediate", "bias"], None),
        (b + "output.dense.weight", d + ["output", "kernel"], _t_linear),
        (b + "output.dense.bias", d + ["output", "bias"], None),
        (b + "output.LayerNorm.weight", d + ["out_norm", "scale"], None),
        (b + "output.LayerNorm.bias", d + ["out_norm", "bias"], None),
    ]


def _bert_embed_rules(src_prefix: str, dst: str):
    e = f"{src_prefix}embeddings."
    d = [dst, "bert_embeddings"]
    return [
        (e + "word_embeddings.weight", d + ["word_embeddings", "embedding"], None),
        (e + "position_embeddings.weight", d + ["position_embeddings", "embedding"], None),
        (e + "token_type_embeddings.weight", d + ["token_type_embeddings", "embedding"], None),
        (e + "LayerNorm.weight", d + ["LayerNorm", "scale"], None),
        (e + "LayerNorm.bias", d + ["LayerNorm", "bias"], None),
    ]


def _tower_rules(src: str, dst_tower: str):
    """conv tower: torch Sequential conv(i).{0 conv,1 bn} x4 + [4] final 1x1."""
    rules = []
    for i in range(4):
        s = f"{src}.{i}."
        d = ["head", dst_tower, f"stage_{i}"]
        rules += [
            (s + "0.weight", d + ["conv", "kernel"], _t_conv),
            (s + "0.bias", d + ["conv", "bias"], None),
            (s + "1.weight", d + ["bn", "scale"], None),
            (s + "1.bias", d + ["bn", "bias"], None),
        ]
    rules += [
        (f"{src}.4.weight", ["head", dst_tower, "final", "kernel"], _t_conv),
        (f"{src}.4.bias", ["head", dst_tower, "final", "bias"], None),
    ]
    return rules


def _tower_bn_stats(src: str, dst_tower: str):
    rules = []
    for i in range(4):
        s = f"{src}.{i}.1."
        d = ["head", dst_tower, f"stage_{i}", "bn"]
        rules += [
            (s + "running_mean", d + ["mean"], None),
            (s + "running_var", d + ["var"], None),
        ]
    return rules


def convert_uvltrack(state: Dict[str, np.ndarray], params: dict,
                     batch_stats: dict,
                     strict: bool = True) -> Tuple[dict, dict, List[str]]:
    """Full UVLTrack 'net' checkpoint -> (params, batch_stats, unused_keys).

    strict=True raises when an expected source key is absent — matching the
    reference's strict load_state_dict. Without it a truncated or
    wrong-config checkpoint would leave destination leaves at RANDOM INIT
    and track with garbage weights, silently."""
    # normalize old-BERT gamma/beta names
    state = {re.sub(r"\.gamma$", ".weight", re.sub(r"\.beta$", ".bias", k)): v
             for k, v in state.items()}
    params = copy.deepcopy(jax_tree_to_py(params))
    batch_stats = copy.deepcopy(jax_tree_to_py(batch_stats))
    if "text_proj" in params.get("backbone", {}):
        # text_proj only exists when bert.hidden_size != embed_dim — a
        # combination the reference cannot run (it pairs ViT-L with
        # bert-large), so no reference checkpoint carries weights for it.
        # Loading one into such a model would leave text_proj at random
        # init and track with a garbage text projection, silently.
        raise ValueError(
            "model has backbone.text_proj (BERT hidden_size != embed_dim); "
            "reference checkpoints never contain these weights — match the "
            "BERT variant to the ViT width (base/768, large/1024) as the "
            "reference does")
    rules, bn_rules = _uvltrack_rules(params)

    # the reference prefixes everything with 'backbone.' / 'box_head.'
    used = set()
    missing = []
    for src, dst, tf in rules:
        for prefix in ("backbone.", ""):
            key = (prefix + src) if src.startswith(("vit.", "bert.", "logit_scale")) else src
            if key in state:
                v = state[key]
                _set(params, dst, tf(v) if tf else v)
                used.add(key)
                break
        else:
            missing.append(src)
    for src, dst, tf in bn_rules:
        if src in state:
            _set(batch_stats, dst, state[src])
            used.add(src)
        else:
            missing.append(src)
    if missing and strict:
        raise ValueError(
            f"checkpoint is missing {len(missing)} expected keys (model "
            f"config/depth mismatch or truncated file), e.g. {missing[:5]}; "
            "pass strict=False to load the matching subset anyway")

    unused = [k for k in state if k not in used]
    return params, batch_stats, unused


def convert_mae_vit(state: Dict[str, np.ndarray], params: dict) -> Tuple[dict, List[str]]:
    """MAE-pretrained ViT ('model' dict) -> backbone block/patch-embed params.

    pos_embed from MAE (1,197,C) is ignored — the tracker uses its own
    rectangular sin-cos embeddings, mirroring strict=False in the reference.
    """
    params = copy.deepcopy(jax_tree_to_py(params))
    depth = sum(1 for k in params["backbone"] if k.startswith("block_"))
    rules = [
        ("cls_token", ["backbone", "cls_token"], None),
        ("patch_embed.proj.weight", ["backbone", "patch_embed", "proj", "kernel"], _t_conv),
        ("patch_embed.proj.bias", ["backbone", "patch_embed", "proj", "bias"], None),
    ]
    for i in range(depth):
        rules += _vit_block_rules(i, "backbone")
    used = set()
    for src, dst, tf in rules:
        if src in state:
            _set(params, dst, tf(state[src]) if tf else state[src])
            used.add(src)
    return params, [k for k in state if k not in used]


def load_bert_archive(path: str) -> Dict[str, np.ndarray]:
    """Read released-BERT weights from any of the shapes the reference accepts
    (bert_backbone.py:584-623): a tar.gz archive holding pytorch_model.bin, a
    directory already containing it, or a bare .bin/.pth state-dict file."""
    import os
    import tarfile
    import tempfile

    weights_name = "pytorch_model.bin"
    if os.path.isdir(path):
        return load_torch_file(os.path.join(path, weights_name))
    if tarfile.is_tarfile(path):
        with tarfile.open(path, "r:*") as archive, \
                tempfile.TemporaryDirectory() as tmp:
            member = next((m for m in archive.getmembers()
                           if os.path.basename(m.name) == weights_name), None)
            if member is None:
                raise FileNotFoundError(f"{weights_name} not in {path}")
            try:
                archive.extract(member, tmp, filter="data")
            except TypeError:  # pre-PEP-706 interpreters lack filter=
                archive.extract(member, tmp)
            return load_torch_file(os.path.join(tmp, member.name))
    return load_torch_file(path)


def load_pretrained(cfg, variables: dict, settings=None) -> dict:
    """Apply MAE-ViT + BERT pretrained weights at model construction time,
    mirroring modality_unified_feature_extractor.py:20-37 (MAE 'model' dict
    into the ViT, BertModel.from_pretrained for the language branch). Paths
    resolve relative to <repo>/ like the reference's workspace-relative
    conventions; missing files are skipped with a warning (the reference
    would crash — here synthetic/unit runs must work without the archives)."""
    import os
    import sys

    if settings is None:
        from ..eval.environment import env_settings
        settings = env_settings()

    from ..eval.environment import resolve_path

    def resolve(p):
        return resolve_path(settings, p)

    params = variables["params"]
    mae_path = resolve(cfg.MODEL.BACKBONE.PRETRAINED_PATH)
    if mae_path and os.path.exists(mae_path):
        params, unused = convert_mae_vit(load_torch_file(mae_path), params)
        sys.stderr.write(f"loaded MAE ViT from {mae_path} "
                         f"({len(unused)} unused keys)\n")
    elif cfg.MODEL.BACKBONE.PRETRAINED_PATH:
        sys.stderr.write(f"MAE weights not found at {mae_path}; "
                         "training from random init\n")

    bert_path = resolve(getattr(cfg.MODEL.BACKBONE.LANGUAGE, "PATH", ""))
    if not (bert_path and os.path.exists(bert_path)):
        # the reference passes LANGUAGE.TYPE to from_pretrained (a dir path)
        bert_path = resolve(cfg.MODEL.BACKBONE.LANGUAGE.TYPE)
    if bert_path and os.path.exists(bert_path):
        params, unused = convert_bert(load_bert_archive(bert_path), params)
        sys.stderr.write(f"loaded BERT from {bert_path} "
                         f"({len(unused)} unused keys)\n")
    else:
        sys.stderr.write("BERT archive not found; language branch keeps "
                         "random init\n")
    return {**variables, "params": params}


def convert_bert(state: Dict[str, np.ndarray], params: dict) -> Tuple[dict, List[str]]:
    """BERT pytorch_model.bin -> bert embeddings + encoder layer params."""
    state = {re.sub(r"\.gamma$", ".weight", re.sub(r"\.beta$", ".bias", k)): v
             for k, v in state.items()}
    params = copy.deepcopy(jax_tree_to_py(params))
    n_bert = sum(1 for k in params["backbone"] if k.startswith("bert_layer_"))
    rules = _bert_embed_rules("", "backbone")
    for i in range(n_bert):
        rules += _bert_layer_rules(i, "", "backbone")
    used = set()
    for src, dst, tf in rules:
        for prefix in ("bert.", ""):
            if prefix + src in state:
                v = state[prefix + src]
                _set(params, dst, tf(v) if tf else v)
                used.add(prefix + src)
                break
    return params, [k for k in state if k not in used]


def jax_tree_to_py(tree):
    """Convert a (possibly frozen) flax tree into plain nested dicts of numpy."""
    if isinstance(tree, dict):
        return {k: jax_tree_to_py(v) for k, v in tree.items()}
    return np.asarray(tree)


def _get(tree: dict, path: List[str]) -> np.ndarray:
    node = tree
    for k in path:
        node = node[k]
    return np.asarray(node)


def _uvltrack_rules(params: dict):
    """The full (src_key, dst_path, transform) table convert_uvltrack uses,
    materialized for reuse by the exporter."""
    depth = sum(1 for k in params["backbone"] if k.startswith("block_"))
    n_bert = sum(1 for k in params["backbone"] if k.startswith("bert_layer_"))
    rules = [
        ("logit_scale", ["backbone", "logit_scale"], None),
        ("vit.cls_token", ["backbone", "cls_token"], None),
        ("vit.pos_embed_z", ["backbone", "pos_embed_z"], None),
        ("vit.pos_embed_x", ["backbone", "pos_embed_x"], None),
        ("vit.modal_embed", ["backbone", "modal_embed"], None),
        ("vit.patch_embed.proj.weight",
         ["backbone", "patch_embed", "proj", "kernel"], _t_conv),
        ("vit.patch_embed.proj.bias",
         ["backbone", "patch_embed", "proj", "bias"], None),
        ("box_head.logit_scale", ["head", "logit_scale"], None),
        ("box_head.prompter.logit_scale", ["head", "prompter", "logit_scale"], None),
        ("box_head.prompter.query_embed.weight",
         ["head", "prompter", "query_embed"], None),
        ("box_head.prompter.mlp.fc1.weight",
         ["head", "prompter", "mlp", "fc1", "kernel"], _t_linear),
        ("box_head.prompter.mlp.fc1.bias",
         ["head", "prompter", "mlp", "fc1", "bias"], None),
        ("box_head.prompter.mlp.fc2.weight",
         ["head", "prompter", "mlp", "fc2", "kernel"], _t_linear),
        ("box_head.prompter.mlp.fc2.bias",
         ["head", "prompter", "mlp", "fc2", "bias"], None),
    ]
    for i in range(depth):
        rules += [(f"vit.{s}", d, t) for s, d, t in _vit_block_rules(i, "backbone")]
    rules += [(f"bert.{s}", d, t) for s, d, t in _bert_embed_rules("", "backbone")]
    for i in range(n_bert):
        rules += [(f"bert.{s}", d, t)
                  for s, d, t in _bert_layer_rules(i, "", "backbone")]
    for tower in ("conv_cls", "conv_offset", "conv_bbox", "conv_bbox_grounding"):
        rules += _tower_rules(f"box_head.{tower}", tower)
    bn_rules = []
    for tower in ("conv_cls", "conv_offset", "conv_bbox", "conv_bbox_grounding"):
        bn_rules += _tower_bn_stats(f"box_head.{tower}", tower)
    return rules, bn_rules


def export_uvltrack(params: dict, batch_stats: dict,
                    passthrough: Dict[str, np.ndarray] = None
                    ) -> Dict[str, np.ndarray]:
    """Inverse of convert_uvltrack: flax trees -> a reference-keyed torch
    state dict ('backbone.vit...', 'box_head...'), with kernels transposed
    back to torch layouts. Round-trips exactly on weights and BN running
    stats (tests/test_convert.py) — useful for exporting a TPU-trained model
    to the PyTorch reference, or diffing checkpoints across frameworks.

    passthrough: extra reference keys carried through verbatim — pass the
    `unused` list data from convert_uvltrack to preserve bookkeeping buffers
    like BN num_batches_tracked (they have no flax-side home; without
    passthrough they are emitted as 0). bf16 trees (cast_inference_variables
    output) are upcast to float32 — torch.from_numpy cannot take ml_dtypes.

    The transforms are involutions on the layouts used here: linear kernels
    transpose back with .T, conv kernels invert (kh,kw,I,O)->(O,I,kh,kw)."""

    def up(v):
        v = np.asarray(v)
        return v.astype(np.float32) if v.dtype.kind in "fV" and v.dtype.itemsize < 4 else v

    params = jax_tree_to_py(params)
    batch_stats = jax_tree_to_py(batch_stats)
    if "text_proj" in params.get("backbone", {}):
        raise ValueError(
            "model has backbone.text_proj (BERT hidden_size != embed_dim); "
            "the reference has no such layer, so the exported checkpoint "
            "could not be loaded by it — match the BERT variant to the ViT "
            "width instead")
    rules, bn_rules = _uvltrack_rules(params)
    state: Dict[str, np.ndarray] = {}
    for src, dst, tf in rules:
        v = up(_get(params, dst))
        if tf is _t_linear:
            v = np.ascontiguousarray(v.T)
        elif tf is _t_conv:
            v = np.ascontiguousarray(v.transpose(3, 2, 0, 1))
        else:
            # fail fast if the shared rules table ever grows a transform the
            # exporter does not know how to invert
            assert tf is None, f"no inverse for transform of {src}"
        prefix = "backbone." if src.startswith(("vit.", "bert.", "logit_scale")) else ""
        state[prefix + src] = v
    for src, dst, _ in bn_rules:
        state[src] = up(_get(batch_stats, dst))
        # torch BN checkpoints carry num_batches_tracked (no flax-side home)
        nb = src.rsplit(".", 1)[0] + ".num_batches_tracked"
        if passthrough and nb in passthrough:
            state[nb] = np.asarray(passthrough[nb])
        else:
            state.setdefault(nb, np.asarray(0, np.int64))
    return state


def save_torch_checkpoint(path: str, params: dict, batch_stats: dict,
                          epoch: int = 0,
                          passthrough: Dict[str, np.ndarray] = None) -> None:
    """Write a reference-loadable .pth.tar ({'net': state, 'epoch': N},
    cf. lib/test/tracker/uvltrack.py:24 reading ['net'])."""
    import torch

    state = {k: torch.from_numpy(np.asarray(v).copy())
             for k, v in export_uvltrack(params, batch_stats,
                                         passthrough=passthrough).items()}
    torch.save({"net": state, "epoch": epoch}, path)
