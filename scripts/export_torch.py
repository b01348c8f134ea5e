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
    cfg = load_cfg(os.path.join(settings.repo_dir, "experiments", args.script,
                                f"{args.config}.yaml"))
    model = build_model(cfg)
    variables = init_model(model, cfg, jax.random.PRNGKey(0))
    params, bstats = variables["params"], variables.get("batch_stats", {})
    epoch = 0

    ckpt_dir = args.checkpoint or os.path.join(
        settings.repo_dir, "checkpoints", "train", args.script, args.config)
    mgr = CheckpointManager(ckpt_dir)
    if mgr.has_checkpoint():
        from uvltrack_tpu.train.optim import build_optimizer
        from uvltrack_tpu.train.step import create_train_state

        tx = build_optimizer(cfg, params, steps_per_epoch=1)
        state, _, epoch = mgr.restore(create_train_state(variables, tx))
        params, bstats = state.params, state.batch_stats
        print(f"exporting epoch {epoch} from {ckpt_dir}")
    else:
        print("no checkpoint found; exporting the random init")

    save_torch_checkpoint(args.out, params, bstats, epoch=epoch)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
