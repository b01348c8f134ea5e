"""Device mesh + sharding helpers for SPMD training.

Replaces the reference's torchrun/NCCL DDP stack (tracking/train.py:45,
lib/train/run_training.py:90, train_script_mutrack.py:46) with a
jax.sharding.Mesh: batches are sharded on the "data" axis, parameters are
replicated (or sharded on "model" for ViT-L tensor parallelism); gradient
all-reduce is inserted by XLA and rides ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if data == -1:
        data = len(devs) // model
    assert data * model <= len(devs), (data, model, len(devs))
    grid = np.asarray(devs[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh, frame_major: bool = True) -> NamedSharding:
    """Shard the batch axis over "data". Frame-major batches are (n, B, ...)
    so the sharded axis is axis 1; flat batches shard axis 0."""
    spec = P(None, "data") if frame_major else P("data")
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device_put each (n, B, ...) array with the batch axis sharded."""

    def put(x):
        spec = P(None, "data") if x.ndim >= 2 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def param_sharding_rules(mesh: Mesh, params) -> object:
    """Replicate all parameters (data-parallel). Tensor-parallel rules for
    ViT-L ("model" axis on qkv/mlp kernels) are layered on in parallel/tp.py."""
    return jax.tree_util.tree_map(lambda _: replicated(mesh), params)


def zero1_moment_sharding(mesh: Mesh, x) -> NamedSharding:
    """ZeRO-1-style sharding for one optimizer-moment tensor: partition the
    largest axis divisible by the "data" mesh size; replicate anything that
    doesn't divide (scalars, small vectors). Memory for Adam's mu/nu then
    scales as 1/dp — the usual first lever when params+moments stop fitting.
    """
    n = int(mesh.shape["data"])
    if n <= 1 or not hasattr(x, "ndim") or x.ndim == 0:
        return replicated(mesh)
    order = sorted(range(x.ndim), key=lambda a: -x.shape[a])
    for axis in order:
        if x.shape[axis] % n == 0 and x.shape[axis] >= n:
            spec = [None] * x.ndim
            spec[axis] = "data"
            return NamedSharding(mesh, P(*spec))
    return replicated(mesh)


def zero1_state_shardings(mesh: Mesh, state, params_sharding=None):
    """Sharding pytree for a TrainState under ZeRO-1: params/batch_stats/step
    replicated (or params_sharding when tensor-parallel), optimizer moments
    sharded over "data" via zero1_moment_sharding.

    With these as jit out_shardings, XLA keeps only 1/dp of each Adam moment
    per device and partitions the elementwise optimizer update accordingly —
    the all-gather back to replicated params is derived automatically
    (scaling-book recipe: annotate shardings, let XLA insert collectives)."""
    repl = replicated(mesh)
    params_rules = (params_sharding if params_sharding is not None
                    else jax.tree_util.tree_map(lambda _: repl, state.params))
    opt_rules = jax.tree_util.tree_map(
        lambda x: zero1_moment_sharding(mesh, x), state.opt_state)
    return type(state)(
        params=params_rules,
        opt_state=opt_rules,
        batch_stats=jax.tree_util.tree_map(lambda _: repl, state.batch_stats),
        step=repl,
    )
