"""Checkpoint-parity dump tool.

Loads a reference PyTorch checkpoint through the converter, runs the jitted
forward on a deterministic input, and writes every stage's outputs to an .npz
— so when the released UVLTrack .pth.tar files are available, box-level parity
against the reference can be verified stage by stage (backbone features,
prompts, cont scores, cls map, bbox map) without re-running the reference.

Usage:
  python -m uvltrack_tpu.cli.parity --checkpoint UVLTrack_ep0300.pth.tar \
      --config baseline_base --out parity_dump.npz [--image frame.jpg \
      --bbox X Y W H] [--language "..."]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tracker_name", default="uvltrack")
    p.add_argument("--config", default="baseline_base")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", default="parity_dump.npz")
    p.add_argument("--image", default=None, help="optional real frame")
    p.add_argument("--bbox", type=float, nargs=4, default=None)
    p.add_argument("--language", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quant", default=None, choices=("int8",),
                   help="dump the weight-only-int8 path instead of fp "
                        "(cfg.TPU.WEIGHT_QUANT): diff two dumps to measure "
                        "quantization drift stage by stage at real weights")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..config import load_cfg
    from ..eval.environment import env_settings, experiment_cfg_path
    from ..models.uvltrack import UVLTrack, build_model, init_model
    from .test import build_tracker

    settings = env_settings()
    cfg = load_cfg(experiment_cfg_path(settings, args.tracker_name,
                                       args.config))
    cfg.TPU.COMPUTE_DTYPE = "float32"  # parity dumps in full precision
    if args.quant:
        cfg.TPU.WEIGHT_QUANT = args.quant
    tracker = build_tracker(cfg, args.checkpoint)
    model, variables = tracker.jt.model, tracker.jt.variables

    tz, sx = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
    nt = cfg.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN
    rng = np.random.default_rng(args.seed)

    if args.image:
        import cv2

        from ..track.pipeline import sample_target_device

        frame = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
        box = jnp.asarray(np.asarray(args.bbox, np.float32))
        template, _ = sample_target_device(jnp.asarray(frame, jnp.float32),
                                           box, cfg.TEST.TEMPLATE_FACTOR, tz)
        search, _ = sample_target_device(jnp.asarray(frame, jnp.float32),
                                         box, cfg.TEST.SEARCH_FACTOR, sx)
    else:
        template = jnp.asarray(rng.normal(size=(1, tz, tz, 3)), jnp.float32)
        search = jnp.asarray(rng.normal(size=(1, sx, sx, 3)), jnp.float32)

    if args.language and tracker.tokenizer:
        ids, mask = tracker.tokenizer.encode_query(args.language, nt)
        text_ids = jnp.asarray(np.asarray(ids, np.int32)[None])
        text_mask = jnp.asarray(np.asarray(mask, np.int32)[None])
        flag = jnp.full((1,), 2, jnp.int32)
    else:
        text_ids = jnp.zeros((1, nt), jnp.int32)
        text_mask = jnp.zeros((1, nt), jnp.int32)
        flag = jnp.zeros((1,), jnp.int32)

    tmask = jnp.zeros((1, (tz // 16) ** 2), bool).at[:, 5].set(True)
    cmask = jnp.zeros((1, (sx // 16) ** 2), bool).at[:, 120].set(True)

    prompt = jax.jit(lambda v, *a: model.apply(
        v, *a, method=UVLTrack.forward_prompt_init))(
        variables, template, search, text_ids, text_mask, tmask, cmask, flag)
    out = jax.jit(lambda v, *a: model.apply(
        v, *a, method=UVLTrack.forward_test))(
        variables, template, search, text_ids, text_mask, prompt, flag)

    dump = {
        "template": template, "search": search, "text_ids": text_ids,
        "text_mask": text_mask, "flag": flag, "prompt": prompt,
    }
    for k in ("search", "template", "vis_token", "txt_token", "logits",
              "cls_score_test", "cont_score", "bbox_map", "pred_boxes"):
        if k in out:
            dump[f"out_{k}"] = out[k]
    np.savez(args.out, **{k: np.asarray(v) for k, v in dump.items()})
    print(f"wrote {args.out}: " + ", ".join(sorted(dump)))


if __name__ == "__main__":
    main()
