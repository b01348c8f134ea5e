"""Import harness for the actual reference implementation at /root/reference.

The reference is CUDA-era PyTorch and assumes packages this sandbox lacks
(easydict, timm, torchvision, pytorch_pretrained_bert) plus a GPU. This module
installs minimal shims for exactly the symbols the reference touches on its
main path, patches .cuda() to be a no-op, and exposes builders that construct
the genuine reference model / actor / tracker at full size with random
weights so tests can assert numerical equivalence against uvltrack_tpu.

Shimmed surface (all verified against the reference sources):
- easydict.EasyDict               (lib/config/uvltrack/config.py:1)
- timm.models.vision_transformer.PatchEmbed — dead import, shadowed by the
  local class (lib/models/backbones/mae_vit.py:21,80)
- torchvision.ops.boxes.box_area  (lib/utils/box_ops.py:2)
- pytorch_pretrained_bert.file_utils.{cached_path,WEIGHTS_NAME,CONFIG_NAME}
  (lib/models/backbones/bert_backbone.py:35) and BertTokenizer
  (lib/test/tracker/uvltrack.py:16) — backed by uvltrack_tpu's WordPiece
  tokenizer, which implements the same algorithm.
"""

from __future__ import annotations

import json
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "lib"))


class _EasyDict(dict):
    """Attribute-access dict matching easydict.EasyDict's used surface."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        if isinstance(value, dict) and not isinstance(value, _EasyDict):
            value = _EasyDict(value)
        elif isinstance(value, (list, tuple)):
            value = type(value)(
                _EasyDict(x) if isinstance(x, dict) else x for x in value)
        super().__setitem__(name, value)

    __setitem__ = __setattr__

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


_installed = False


def install():
    """Install import shims, patch .cuda(), and put /root/reference on sys.path."""
    global _installed
    if _installed:
        return
    import torch

    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")
        m.EasyDict = _EasyDict
        sys.modules["easydict"] = m

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        vt = types.ModuleType("timm.models.vision_transformer")

        class PatchEmbed:  # shadowed by mae_vit.py:80's local class; never used
            pass

        vt.PatchEmbed = PatchEmbed
        models.vision_transformer = vt
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.vision_transformer"] = vt

    if "tikzplotlib" not in sys.modules:
        # plot_results.py imports it at module level for tikz export only
        m = types.ModuleType("tikzplotlib")

        def _save(*a, **k):
            raise RuntimeError("tikzplotlib shim: not available")

        m.save = _save
        sys.modules["tikzplotlib"] = m

    if "lmdb" not in sys.modules:
        # lib/test/evaluation/environment.py pulls the lmdb-backed datasets
        # in at import time; the wheel is absent here and the analysis code
        # under test never opens an environment.
        m = types.ModuleType("lmdb")

        def _no_lmdb(*a, **k):
            raise RuntimeError("lmdb shim: not available in this sandbox")

        m.open = _no_lmdb
        sys.modules["lmdb"] = m

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        boxes = types.ModuleType("torchvision.ops.boxes")

        def box_area(b):
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

        boxes.box_area = box_area
        ops.boxes = boxes
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.boxes"] = boxes

    if "pytorch_pretrained_bert" not in sys.modules:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if repo_root not in sys.path:
            sys.path.insert(0, repo_root)
        from uvltrack_tpu.core.tokenizer import BertTokenizer as _JaxTok

        class BertTokenizer(_JaxTok):
            @classmethod
            def from_pretrained(cls, vocab_path, do_lower_case=True):
                return cls(vocab_path, do_lower_case=do_lower_case)

        ppb = types.ModuleType("pytorch_pretrained_bert")
        fu = types.ModuleType("pytorch_pretrained_bert.file_utils")
        fu.cached_path = lambda p, cache_dir=None: p
        fu.WEIGHTS_NAME = "pytorch_model.bin"
        fu.CONFIG_NAME = "config.json"
        ppb.file_utils = fu
        ppb.BertTokenizer = BertTokenizer
        sys.modules["pytorch_pretrained_bert"] = ppb
        sys.modules["pytorch_pretrained_bert.file_utils"] = fu

    # CPU-only torch: .cuda() becomes identity (the reference calls it on
    # tensors and modules throughout, e.g. lib/train/actors/uvltrack.py:23).
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # NumPy>=1.24 removed the deprecated scalar aliases the 2021-era
    # reference uses (np.float at mae_vit.py:40).
    import numpy as np

    for alias, typ in (("float", float), ("int", int), ("bool", bool)):
        if alias not in np.__dict__:
            setattr(np, alias, typ)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _installed = True


BERT_BASE_CONFIG = {
    "vocab_size": 30522, "hidden_size": 768, "num_hidden_layers": 12,
    "num_attention_heads": 12, "intermediate_size": 3072, "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1, "attention_probs_dropout_prob": 0.1,
    "max_position_embeddings": 512, "type_vocab_size": 2,
    "initializer_range": 0.02,
}

BERT_LARGE_CONFIG = {
    **BERT_BASE_CONFIG, "hidden_size": 1024, "num_hidden_layers": 24,
    "num_attention_heads": 16, "intermediate_size": 4096,
}


def build_reference_cfg(tmpdir: str, yaml_name: str = "baseline_base.yaml"):
    """Reference cfg from the reference's own experiment YAML, with the
    pretrained-weight paths pointed at empty stand-ins (strict=False loads
    leave the random init in place — same mechanism as the real flow).

    The ViT variant is selected the reference's way — by substring of
    PRETRAINED_PATH (modality_unified_feature_extractor.py:20,30) — so the
    stand-in file must carry the yaml's variant name, and the stand-in BERT
    config must match (bert-large for baseline_large)."""
    install()
    import torch

    import importlib

    cfg_mod = importlib.import_module("lib.config.uvltrack.config")
    importlib.reload(cfg_mod)  # fresh defaults per call (module-global cfg)
    cfg_mod.update_config_from_file(
        os.path.join(REFERENCE_ROOT, "experiments/uvltrack", yaml_name))
    cfg = cfg_mod.cfg
    variant = ("large" if "large" in cfg.MODEL.BACKBONE.PRETRAINED_PATH
               else "base")

    mae_path = os.path.join(tmpdir, f"mae_pretrain_vit_{variant}.pth")
    if not os.path.exists(mae_path):
        torch.save({"model": {}}, mae_path)
    bert_dir = os.path.join(tmpdir, f"bert-{variant}-uncased")
    os.makedirs(bert_dir, exist_ok=True)
    cfg_file = os.path.join(bert_dir, "config.json")
    if not os.path.exists(cfg_file):
        with open(cfg_file, "w") as f:
            json.dump(BERT_LARGE_CONFIG if variant == "large"
                      else BERT_BASE_CONFIG, f)
        torch.save({}, os.path.join(bert_dir, "pytorch_model.bin"))

    cfg.MODEL.BACKBONE.PRETRAINED_PATH = mae_path
    cfg.MODEL.BACKBONE.LANGUAGE.TYPE = bert_dir
    return cfg


def build_reference_model(cfg, seed: int = 0):
    """The genuine reference UVLTrack (random init), eval mode."""
    install()
    import torch

    from lib import registry  # noqa: F401
    import lib.models  # noqa: F401  (populates the registry)

    torch.manual_seed(seed)
    model = registry.MODELS["uvltrack"](cfg)
    model.eval()
    return model
