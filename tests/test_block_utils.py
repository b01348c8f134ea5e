"""LayerScale + FrozenBatchNorm2d options (backbones/utils.py:24-31,
uvltrack/utils.py:5-50) — dead options in the reference's shipped configs,
kept for capability parity."""

import jax
import jax.numpy as jnp
import numpy as np

from uvltrack_tpu.models.head import ConvBnRelu
from uvltrack_tpu.models.vit import VitBlock


def test_layerscale_params_and_effect():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 32)),
                    jnp.float32)
    blk = VitBlock(32, 4, init_values=1e-5)
    variables = jax.jit(lambda r: blk.init(r, x))(jax.random.PRNGKey(0))
    p = variables["params"]
    assert np.allclose(p["ls1_gamma"], 1e-5) and p["ls1_gamma"].shape == (32,)
    assert "ls2_gamma" in p
    y = jax.jit(lambda v, a: blk.apply(v, a))(variables, x)
    # with gamma ~ 1e-5 the residual branches are nearly suppressed
    assert np.abs(np.asarray(y - x)).max() < 1e-3

    blk_off = VitBlock(32, 4)  # init_values=None -> Identity, no params
    v_off = jax.jit(lambda r: blk_off.init(r, x))(jax.random.PRNGKey(0))
    assert "ls1_gamma" not in v_off["params"]


def test_frozen_batchnorm_matches_reference_math():
    """y = (x - mean) * scale/sqrt(var+eps) + bias with every term fixed
    (uvltrack/utils.py:44-50); nothing lands in trainable params."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    mod = ConvBnRelu(8, freeze_bn=True)
    variables = jax.jit(lambda r: mod.init(r, x, True))(jax.random.PRNGKey(0))
    assert set(variables["params"]) == {"conv"}
    bs = dict(variables["batch_stats"])
    bs["frozen_mean"] = jnp.asarray(rng.normal(size=8), jnp.float32)
    bs["frozen_var"] = jnp.asarray(rng.uniform(0.5, 2.0, 8), jnp.float32)
    bs["frozen_scale"] = jnp.asarray(rng.uniform(0.5, 2.0, 8), jnp.float32)
    bs["frozen_bias"] = jnp.asarray(rng.normal(size=8), jnp.float32)
    variables = {"params": variables["params"], "batch_stats": bs}

    apply = jax.jit(lambda v, a: mod.apply(v, a, True))
    y = np.asarray(apply(variables, x))

    # reference math on the conv output
    conv_only = jax.jit(lambda v, a: nn_conv(v, a))(variables, x)

    def ref(xc):
        inv = np.asarray(bs["frozen_scale"]) / np.sqrt(
            np.asarray(bs["frozen_var"]) + 1e-5)
        return np.maximum(
            np.asarray(xc) * inv
            + (np.asarray(bs["frozen_bias"]) - np.asarray(bs["frozen_mean"]) * inv),
            0.0)

    assert np.allclose(y, ref(conv_only), atol=1e-5)
    # train=True takes the same path: stats never update
    y2 = np.asarray(apply(variables, x))
    assert np.allclose(y, y2)


def nn_conv(variables, x):
    import flax.linen as nn

    conv = nn.Conv(8, (3, 3), padding=1, param_dtype=jnp.float32, name="conv")
    return conv.apply({"params": variables["params"]["conv"]}, x)
