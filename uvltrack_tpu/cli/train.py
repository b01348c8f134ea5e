"""Training CLI.

Parity with tracking/train.py + lib/train/run_training.py, minus the process
orchestration: there is no torchrun — SPMD over the jax device mesh replaces
multi-process DDP (one process drives all local chips; multi-host comes from
jax.distributed.initialize when launched per-host).

`python -m uvltrack_tpu.cli.train --script uvltrack --config baseline_base
 [--synthetic N]` — with --synthetic, trains on generated batches (pipeline
smoke / benchmarking); otherwise uses the real data pipeline (uvltrack_tpu.data).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--script", default="uvltrack")
    p.add_argument("--config", default="baseline_base")
    p.add_argument("--save_dir", default=None,
                   help="workspace root for logs AND checkpoints/train/"
                        "<script>/<config>, matching the reference's "
                        "--save_dir; when omitted, logs go under ./output "
                        "and checkpoints stay at <repo>/checkpoints where "
                        "cli/test auto-resolves them (an explicit "
                        "--save_dir output is honored literally)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic batches/epoch instead of real data")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (launch once per host). "
                        "On TPU pods all parameters auto-detect; elsewhere "
                        "set JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES and "
                        "JAX_PROCESS_ID (jax has no env-var cluster plugin, "
                        "so bare initialize() cannot bootstrap off-pod)")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="config override, e.g. --set TPU.GRAD_ACCUM=2 "
                        "(repeatable; applied after the experiment YAML)")
    args = p.parse_args(argv)

    import jax

    if args.multihost:
        kw = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            missing = [k for k in ("JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
                       if not os.environ.get(k)]
            if missing:
                raise SystemExit(
                    "--multihost with JAX_COORDINATOR_ADDRESS also needs "
                    + " and ".join(missing)
                    + " (all three, or none on a TPU pod where "
                    "jax.distributed auto-detects)")
            kw = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]))
        jax.distributed.initialize(**kw)
    import jax.numpy as jnp

    from ..config import load_cfg
    from ..data.synthetic import synthetic_batch_from_cfg
    from ..eval.environment import env_settings
    from ..parallel.mesh import make_mesh, shard_batch
    from ..train.step import make_eval_step, setup_sharded_training
    from ..train.trainer import Trainer

    settings = env_settings()
    from ..eval.environment import experiment_cfg_path, train_checkpoint_dir
    cfg = load_cfg(experiment_cfg_path(settings, args.script, args.config))
    if args.overrides:
        cfg.merge_from_list(args.overrides)
    if args.epochs:
        cfg.TRAIN.EPOCH = args.epochs
    if args.batch_size:
        cfg.TRAIN.BATCH_SIZE = args.batch_size

    mesh = make_mesh(data=int(cfg.TPU.MESH_DATA), model=int(cfg.TPU.MESH_MODEL))
    n_data = mesh.shape["data"]
    global_batch = int(cfg.TRAIN.BATCH_SIZE) * n_data

    if args.synthetic:
        steps_per_epoch = args.synthetic

        def loader():
            rng = np.random.default_rng(args.seed)
            for _ in range(steps_per_epoch):
                b = synthetic_batch_from_cfg(rng, cfg, global_batch)
                yield jax.tree_util.tree_map(jnp.asarray, b)

        train_loader = _Reiterable(loader)
        val_loaders = {}
    else:
        from ..data.loader import build_train_loader, build_val_loaders

        # forward --seed so data sampling varies across seeds too (val keeps
        # a fixed offset stream so runs stay comparable epoch-to-epoch)
        train_loader = build_train_loader(cfg, global_batch, seed=args.seed)
        val_loaders = build_val_loaders(cfg, global_batch,
                                        seed=args.seed + 1_000_003)
        steps_per_epoch = len(train_loader)

    from ..models.convert import load_pretrained

    # the shared recipe (also behind bench.py's train_step extra and the
    # multichip dryrun's full-config leg); zero1 pre-places the moments
    # sharded BEFORE step 1 — a replicated donated input can't alias a
    # sharded output (donation warning + transient double memory otherwise)
    model, state, train_step = setup_sharded_training(
        cfg, mesh, steps_per_epoch, rng_key=jax.random.PRNGKey(args.seed),
        prepare_variables=lambda v: load_pretrained(cfg, v, settings),
        zero1=bool(cfg.TPU.ZERO1) and n_data > 1)
    eval_step = jax.jit(make_eval_step(model, cfg))

    if args.save_dir is not None:
        # reference semantics (lib/train/run_training.py: save_dir roots the
        # workspace): an explicit --save_dir owns the checkpoint tree too —
        # None is the sentinel so `--save_dir output` (or ./output) is
        # honored literally instead of string-matching the default
        ckpt_dir = os.path.join(args.save_dir, "checkpoints", "train",
                                args.script, args.config)
    else:
        ckpt_dir = train_checkpoint_dir(settings, args.script, args.config)
    log_root = args.save_dir if args.save_dir is not None else "output"
    log_path = os.path.join(log_root, "logs", f"{args.script}-{args.config}.log")
    trainer = Trainer(cfg, train_step, state, train_loader, val_loaders,
                      eval_step=eval_step, checkpoint_dir=ckpt_dir,
                      log_path=log_path, shard_fn=lambda b: shard_batch(mesh, b))
    trainer.train(int(cfg.TRAIN.EPOCH), load_latest=True, fail_safe=True)


class _Reiterable:
    def __init__(self, gen_fn):
        self.gen_fn = gen_fn

    def __iter__(self):
        return self.gen_fn()


if __name__ == "__main__":
    main()
