"""Export a trained uvltrack_tpu checkpoint to the reference's .pth.tar
format ({'net': state_dict, 'epoch': N}; lib/test/tracker/uvltrack.py:24).

Usage:
  python scripts/export_torch.py --config baseline_base \
      [--checkpoint checkpoints/train/uvltrack/baseline_base] out.pth.tar
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--script", default="uvltrack")
    p.add_argument("--config", default="baseline_base")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir or file (default: the train dir for "
                        "this config); random init is exported if absent")
    args = p.parse_args(argv)

    import jax

    from uvltrack_tpu.config import load_cfg
    from uvltrack_tpu.eval.environment import env_settings
    from uvltrack_tpu.models.convert import save_torch_checkpoint
    from uvltrack_tpu.models.uvltrack import build_model, init_model
    from uvltrack_tpu.train.checkpoint import CheckpointManager

    settings = env_settings()
    from uvltrack_tpu.eval.environment import (experiment_cfg_path,
                                               train_checkpoint_dir)

    cfg = load_cfg(experiment_cfg_path(settings, args.script, args.config))
    ckpt = args.checkpoint or train_checkpoint_dir(
        settings, args.script, args.config)
    state_dict = None
    if os.path.isfile(ckpt):  # a specific .msgpack file
        state_dict, _, epoch = CheckpointManager(
            os.path.dirname(ckpt)).restore_raw(path=ckpt)
    elif os.path.isdir(ckpt):
        mgr = CheckpointManager(ckpt)
        if mgr.has_checkpoint():
            state_dict, _, epoch = mgr.restore_raw()
    elif args.checkpoint:
        raise SystemExit(f"checkpoint not found: {ckpt}")

    if state_dict is not None:
        # restore_raw returns the TrainState as plain nested dicts keyed by
        # field name — no model init or optimizer template needed
        params, bstats = state_dict["params"], state_dict["batch_stats"]
        epoch = int(epoch)
        print(f"exporting epoch {epoch} from {ckpt}")
    else:
        model = build_model(cfg)
        variables = init_model(model, cfg, jax.random.PRNGKey(0))
        params, bstats = variables["params"], variables.get("batch_stats", {})
        epoch = 0
        print("no checkpoint found; exporting the random init")

    save_torch_checkpoint(args.out, params, bstats, epoch=epoch)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
