"""Sharded training step: loss -> grad -> clip -> AdamW update, SPMD over a
device mesh.

Replaces the reference's DDP step (lib/train/trainers/ltr_trainer.py:75-100 +
implicit NCCL all-reduce): here the batch is sharded on the mesh "data" axis,
parameters are replicated, and XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .actor import forward_and_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    batch_stats: Any
    step: jnp.ndarray  # () int32


def create_train_state(variables: dict, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
        step=jnp.asarray(0, jnp.int32),
    )


def _split_microbatches(batch: dict, k: int) -> dict:
    """Reshape every batch leaf's B axis into k leading microbatches — the
    scan axis of the gradient-accumulation loop.

    Axis rule, from the actor's documented leaf inventory (actor.py:67):
    ndim >= 3 leaves are frame-major (n, B, ...) -> split axis 1 into
    (k, n, B/k, ...); ndim <= 2 leaves are batch-leading — text/text_mask
    (B, Nt), flag (B,) or (B, 1) -> split axis 0 into (k, B/k, ...). No
    2-D frame-major leaf exists, so the rule is unambiguous."""
    b = batch["flag"].shape[0]

    def split(x):
        if x.ndim >= 3:
            assert x.shape[1] == b, (x.shape, b)
            return x.reshape(x.shape[0], k, b // k, *x.shape[2:]).swapaxes(0, 1)
        assert x.shape[0] == b, (x.shape, b)
        return x.reshape(k, b // k, *x.shape[1:])

    return jax.tree_util.tree_map(split, batch)


def make_train_step(model, tx, cfg):
    """Returns train_step(state, batch) -> (state, metrics).

    cfg.TPU.GRAD_ACCUM > 1 accumulates gradients over that many
    microbatches with a lax.scan INSIDE the jitted step (activation memory
    scales with B/accum while the optimizer sees the full effective batch;
    one compiled program, no host round-trips — beyond the reference,
    which has no accumulation). Microbatch grads are averaged under
    TRAIN.REDUCTION='mean' (summed under 'sum'). The update matches the
    unaccumulated full-batch step exactly for the sample-decomposable
    losses (focal, ce_mean, giou/l1); the weighted-ignore contrastive CE
    (a ratio of sums over each microbatch's weights) and live-BN batch
    statistics instead follow the reference's per-GPU DDP semantics —
    each microbatch normalizes by its own sums, and batch_stats advance
    from the last microbatch (see test_grad_accum_matches_full_batch_step)."""
    accum = int(getattr(cfg.TPU, "GRAD_ACCUM", 1) or 1)

    def train_step(state: TrainState, batch: dict):
        def loss_fn(params, b):
            variables = {"params": params, "batch_stats": state.batch_stats}
            loss, (metrics, new_model_state) = forward_and_loss(
                model, variables, b, cfg, train=True)
            return loss, (metrics, new_model_state)

        if accum > 1:
            bsz = batch["flag"].shape[0]
            assert bsz % accum == 0, (
                f"batch size {bsz} not divisible by TPU.GRAD_ACCUM={accum}")
            micro = _split_microbatches(batch, accum)

            def body(g_acc, mb):
                grads, (metrics, new_ms) = jax.grad(
                    loss_fn, has_aux=True)(state.params, mb)
                return (jax.tree_util.tree_map(jnp.add, g_acc, grads),
                        (metrics, new_ms))

            g_zero = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, p.dtype), state.params)
            g_sum, (metrics_stack, ms_stack) = jax.lax.scan(
                body, g_zero, micro)
            scale = (1.0 / accum
                     if str(cfg.TRAIN.REDUCTION).lower() == "mean" else 1.0)
            grads = jax.tree_util.tree_map(lambda g: g * scale, g_sum)
            metrics = jax.tree_util.tree_map(
                lambda m: m.mean(0), metrics_stack)
            new_model_state = jax.tree_util.tree_map(
                lambda x: x[-1], ms_stack)
        else:
            grads, (metrics, new_model_state) = jax.grad(
                loss_fn, has_aux=True)(state.params, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            step=state.step + 1,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg):
    def eval_step(state: TrainState, batch: dict):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        _, (metrics, _) = forward_and_loss(model, variables, batch, cfg, train=False)
        return metrics

    return eval_step


def jit_sharded_train_step(train_step, mesh: Mesh, replicate_out: bool = True,
                           donate: bool = True, zero1: bool = False,
                           state: "TrainState" = None):
    """jit the step; the caller device_puts the batch with its "data"-axis
    sharding (parallel/mesh.shard_batch) and the state replicated (or
    TP-sharded via parallel/tp.py), and XLA derives the gradient all-reduce
    from that layout. replicate_out pins outputs replicated (pure DP); with
    tensor parallelism leave it False so params keep their shardings.

    zero1=True (needs `state` for its structure) shards the optimizer
    moments over the "data" axis (parallel/mesh.zero1_state_shardings):
    Adam's mu/nu live 1/dp per device and the optimizer update partitions
    accordingly — cfg.TPU.ZERO1 in the train CLI.

    donate=True reuses the incoming TrainState's buffers for the outputs
    (params + Adam moments are ~2.8GB for ViT-B; not donating doubles live
    memory and can fall off a cliff). The caller must not touch the old
    state — including the `variables` dict create_train_state was built from
    — after the first step; pass donate=False to keep them alive.
    """
    donate_argnums = (0,) if donate else ()
    if zero1:
        from ..parallel.mesh import zero1_state_shardings

        assert state is not None, "zero1 sharding needs the state structure"
        rules = zero1_state_shardings(mesh, state)
        return jax.jit(train_step,
                       out_shardings=(rules, NamedSharding(mesh, P())),
                       donate_argnums=donate_argnums)
    if not replicate_out:
        return jax.jit(train_step, donate_argnums=donate_argnums)
    repl = NamedSharding(mesh, P())
    return jax.jit(train_step, out_shardings=(repl, repl),
                   donate_argnums=donate_argnums)


def setup_sharded_training(cfg, mesh: Mesh, steps_per_epoch: int,
                           rng_key=None, prepare_variables=None,
                           zero1: bool = False, donate: bool = True):
    """cfg -> (model, state, jitted sharded step): the ONE data-parallel
    training-setup recipe (build_model -> init -> optimizer -> TrainState ->
    ZeRO-1 placement -> jit), shared by cli/train, bench.py's train_step
    extra, and __graft_entry__'s full-config dryrun leg so the benched /
    dryrun step can't drift from the step training actually runs.

    zero1=True pre-places the moments with their sharded layout BEFORE
    step 1 (a replicated donated input can't alias a sharded output);
    prepare_variables(variables) -> variables runs after init, where
    cli/train loads pretrained weights (models/convert.py)."""
    from ..models.uvltrack import build_model, init_model
    from ..train.optim import build_optimizer

    model = build_model(cfg)
    variables = init_model(model, cfg,
                           rng_key if rng_key is not None
                           else jax.random.PRNGKey(0))
    if prepare_variables is not None:
        variables = prepare_variables(variables)
    tx = build_optimizer(cfg, variables["params"], steps_per_epoch)
    state = create_train_state(variables, tx)
    if zero1:
        from ..parallel.mesh import zero1_state_shardings

        state = jax.device_put(state, zero1_state_shardings(mesh, state))
    step = jit_sharded_train_step(make_train_step(model, tx, cfg), mesh,
                                  donate=donate, zero1=zero1, state=state)
    return model, state, step
