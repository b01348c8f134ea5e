"""End-to-end cli/train --synthetic smoke on the CPU-sized config.

Drives the ACTUAL CLI entry (argument parsing, config overrides, the shared
train/step.py::setup_sharded_training recipe, Trainer loop, checkpointing)
rather than the primitives test_train_stack.py covers — the seam the
reference exercises via tracking/train.py + lib/train/run_training.py.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ViT-B-width compile on the 1-core sandbox


def test_cli_train_synthetic_end_to_end(tmp_path):
    from uvltrack_tpu.cli.train import main
    from uvltrack_tpu.train.checkpoint import CheckpointManager

    save_dir = str(tmp_path / "ws")
    main(["--config", "_smoke_cpu", "--synthetic", "2", "--epochs", "1",
          "--batch_size", "2", "--save_dir", save_dir,
          "--set", "TPU.GRAD_ACCUM=2"])

    ckpt_dir = os.path.join(save_dir, "checkpoints", "train", "uvltrack",
                            "_smoke_cpu")
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.epochs(), f"no checkpoint written under {ckpt_dir}"
    state, _extra, epoch = mgr.restore_raw()
    assert epoch == 1
    leaves = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(
        state["params"])]
    assert leaves and all(np.isfinite(x).all() for x in leaves)
    # the log landed under the workspace root too
    log = os.path.join(save_dir, "logs", "uvltrack-_smoke_cpu.log")
    assert os.path.exists(log)
