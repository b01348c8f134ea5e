#!/usr/bin/env python
"""Scaffold a new tracker family (parity: scripts/new_tracker.sh).

Creates experiments/<name>/baseline.yaml from the uvltrack baseline plus a
model/actor/tracker module skeleton under uvltrack_tpu/models/<name>.py that
registers itself in the MODELS registry.
"""

from __future__ import annotations

import argparse
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL_TEMPLATE = '''"""{name}: new tracker family scaffold.

Wire a backbone + head and register the builder; the training actor, tracker
runtime, and CLIs pick the model up from the registry by cfg name.
"""

import flax.linen as nn

from .. import registry
from .head import MABH
from .mufe import MUFE
from .uvltrack import UVLTrack, parse_dtype
from .bert import bert_config_from_type
from .vit import VIT_VARIANTS, vit_variant_from_path


@registry.MODELS.register("{name}")
def build_model(cfg, dtype=None):
    variant = VIT_VARIANTS[vit_variant_from_path(cfg.MODEL.BACKBONE.PRETRAINED_PATH)]
    dtype = dtype if dtype is not None else parse_dtype(cfg.TPU.COMPUTE_DTYPE)
    backbone = MUFE(
        embed_dim=variant["embed_dim"], depth=variant["depth"],
        num_heads=variant["num_heads"], template_size=cfg.DATA.TEMPLATE.SIZE,
        search_size=cfg.DATA.SEARCH.SIZE,
        fusion_layers=tuple(cfg.MODEL.BACKBONE.FUSION_LAYER),
        cont_loss_layers=tuple(cfg.MODEL.BACKBONE.CONT_LOSS_LAYER),
        txt_token_mode=cfg.MODEL.BACKBONE.TXT_TOKEN_MODE,
        bert=bert_config_from_type(cfg.MODEL.BACKBONE.LANGUAGE.TYPE),
        dtype=dtype)
    head = MABH(inplanes=cfg.MODEL.HIDDEN_DIM, channel=cfg.MODEL.HEAD.HEAD_DIM,
                feat_sz=cfg.DATA.SEARCH.SIZE // 16, dtype=dtype,
                cls_tokenize=cfg.MODEL.HEAD.CLS_TOKENIZE,
                offset_sigmoid=cfg.MODEL.HEAD.OFFSET_SIGMOID,
                joint_cls=cfg.MODEL.HEAD.JOINT_CLS,
                softmax_one=cfg.MODEL.HEAD.SOFTMAX_ONE)
    return UVLTrack(backbone=backbone, head=head)
'''


def main():
    p = argparse.ArgumentParser()
    p.add_argument("name")
    args = p.parse_args()
    name = args.name

    exp_dir = os.path.join(REPO, "experiments", name)
    os.makedirs(exp_dir, exist_ok=True)
    shutil.copy(os.path.join(REPO, "experiments", "uvltrack", "baseline_base.yaml"),
                os.path.join(exp_dir, "baseline.yaml"))

    model_path = os.path.join(REPO, "uvltrack_tpu", "models", f"{name}.py")
    if os.path.exists(model_path):
        raise SystemExit(f"{model_path} already exists")
    with open(model_path, "w") as f:
        f.write(MODEL_TEMPLATE.format(name=name))
    print(f"scaffolded: {exp_dir}/baseline.yaml, {model_path}")
    print(f"run: python -m uvltrack_tpu.cli.train --script {name} --config baseline")


if __name__ == "__main__":
    main()
