"""Tensor-parallel parameter sharding rules (Megatron-style) for the ViT/BERT
blocks over the mesh "model" axis.

The reference has no TP (SURVEY.md §2.10) — this is the TPU-native scale-up
path for UVLTrack-L/H: qkv and MLP-up kernels shard on their output column,
proj and MLP-down kernels on their input row, so each block needs exactly one
all-reduce per sublayer (inserted by XLA from the shardings). Embeddings,
norms, and the head stay replicated.
"""

from __future__ import annotations

import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def tp_spec_for(path: str, leaf) -> P:
    """PartitionSpec for one parameter leaf given its tree path."""
    ndim = getattr(leaf, "ndim", 0)
    # column-parallel: split the output features
    if any(s in path for s in ("qkv/kernel", "mlp/fc1/kernel", "query/kernel",
                               "key/kernel", "value/kernel",
                               "intermediate/kernel")):
        return P(None, "model") if ndim == 2 else P()
    if any(s in path for s in ("qkv/bias", "mlp/fc1/bias", "query/bias",
                               "key/bias", "value/bias", "intermediate/bias")):
        return P("model") if ndim == 1 else P()
    # row-parallel: split the input features; output is all-reduced
    if any(s in path for s in ("proj/kernel", "mlp/fc2/kernel",
                               "attn_out/kernel", "output/kernel")):
        return P("model", None) if ndim == 2 else P()
    return P()


def tp_param_shardings(mesh: Mesh, params):
    """NamedSharding tree for the params under tensor parallelism."""

    def f(path, leaf):
        return NamedSharding(mesh, tp_spec_for(_path_str(path), leaf))

    return jtu.tree_map_with_path(f, params)


def shard_params_tp(mesh: Mesh, params):
    """device_put the param tree with TP shardings."""
    import jax

    shardings = tp_param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
