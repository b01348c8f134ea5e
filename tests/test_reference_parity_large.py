"""Numerical parity against the ACTUAL reference at full UVLTrack-L size:
MAE ViT-L (24 blocks, 1024 dim, 16 heads — mae_vit.py:225), BERT-large
truncated to the 12 pre-fusion layers
(modality_unified_feature_extractor.py:30-38), FUSION_LAYER [12..23], head
at HIDDEN_DIM 1024 (experiments/uvltrack/baseline_large.yaml).

test_reference_parity.py locks every runtime path at ViT-B; what it cannot
see is the variant wiring this module pins down: VIT_VARIANTS['large'] /
BertConfig.large() selection by path substring (the reference's own
mechanism), the converter over 24 ViT blocks + 12 kept bert-large layers +
1024-wide head towers, and the export round-trip at those shapes. One flag
(NLBBOX, the shipped default — all three flags are variant-independent
branch logic already locked at B) keeps the fp32 CPU cost bounded.

Skips cleanly when /root/reference or torch is unavailable.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _reference  # noqa: E402
from test_reference_parity import (B, NT, NX, NZ, _inputs,  # noqa: E402
                                   _is_dead_key, _ref_forward)

if not _reference.reference_available():  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uvltrack_tpu.config import load_cfg  # noqa: E402
from uvltrack_tpu.models.convert import convert_uvltrack  # noqa: E402
from uvltrack_tpu.models.uvltrack import UVLTrack, build_model  # noqa: E402

pytestmark = pytest.mark.slow  # full-size ViT-L fp32 on CPU

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def lctx(tmp_path_factory):
    td = str(tmp_path_factory.mktemp("refparity_l"))
    ref_cfg = _reference.build_reference_cfg(td, "baseline_large.yaml")
    ref_model = _reference.build_reference_model(ref_cfg, seed=2)
    assert ref_model.backbone.vit.blocks[0].attn.num_heads == 16
    assert len(ref_model.backbone.bert.encoder.layer) == 12  # min(FUSION)

    ckpt_path = os.path.join(td, "UVLTrack-L_ep0300.pth.tar")
    torch.save({"net": ref_model.state_dict()}, ckpt_path)

    cfg = load_cfg(os.path.join(REPO,
                                "experiments/uvltrack/baseline_large.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    assert model.backbone.embed_dim == 1024 and model.backbone.depth == 24

    tz, sx = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, tz, tz, 3)), jnp.zeros((1, sx, sx, 3)),
                           jnp.zeros((1, NT), jnp.int32),
                           jnp.ones((1, NT), jnp.int32),
                           jnp.zeros((1, NZ), bool), jnp.zeros((1, NX), bool),
                           jnp.zeros((1,), jnp.int32), train=False))
    zero_vars = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)

    from uvltrack_tpu.models.convert import load_torch_file

    params, batch_stats, unused = convert_uvltrack(
        load_torch_file(ckpt_path), zero_vars["params"],
        zero_vars["batch_stats"])
    leftovers = [k for k in unused if not _is_dead_key(k)]
    assert leftovers == [], f"converter missed live L params: {leftovers}"

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                       batch_stats)}
    return dict(ref_model=ref_model, cfg=cfg, model=model,
                variables=variables, ckpt_path=ckpt_path)


def test_forward_test_parity_large(lctx):
    """forward_prompt_init + forward_test at NLBBOX (flag 2) vs the genuine
    reference ViT-L modules — same comparison surface and tolerances as the
    B-size test_forward_test_parity."""
    template, search, ids, mask, tmask, cmask, flag = _inputs(
        seed=42, flag_val=2)
    prompt_t, out_t = _ref_forward(lctx["ref_model"], template, search, ids,
                                   mask, tmask, cmask, flag)

    model, variables = lctx["model"], lctx["variables"]
    args = (jnp.asarray(template), jnp.asarray(search),
            jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
            jnp.asarray(tmask), jnp.asarray(cmask),
            jnp.asarray(flag, jnp.int32))
    prompt_j = jax.jit(lambda v, *a: model.apply(
        v, *a, method=UVLTrack.forward_prompt_init))(variables, *args)
    out_j = jax.jit(lambda v, t, s, ti, tm, p, f: model.apply(
        v, t, s, ti, tm, p, f, method=UVLTrack.forward_test))(
        variables, args[0], args[1], args[2], args[3], prompt_j, args[6])

    np.testing.assert_allclose(np.asarray(prompt_j), prompt_t.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out_j["cls_score_test"]).reshape(B, -1),
        out_t["cls_score_test"].reshape(B, -1).numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_j["cont_score"]),
                               out_t["cont_score"].numpy(),
                               atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out_j["bbox_map"]),
                               out_t["bbox_map"].numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["search"]),
                               out_t["search"].numpy(), atol=2e-3, rtol=1e-3)


def test_export_loads_into_reference_model_large(lctx):
    """export_uvltrack at L shapes loads into the genuine reference ViT-L
    with no unexpected/missing live keys and bit-identical weights."""
    from uvltrack_tpu.models.convert import export_uvltrack

    variables = lctx["variables"]
    exported = {k: torch.from_numpy(np.asarray(v).copy())
                for k, v in export_uvltrack(variables["params"],
                                            variables["batch_stats"]).items()}
    import copy

    ref_model = copy.deepcopy(lctx["ref_model"])
    missing, unexpected = ref_model.load_state_dict(exported, strict=False)
    assert not [k for k in unexpected if not _is_dead_key(k)], unexpected
    assert not [k for k in missing if not _is_dead_key(k)], missing
    orig = torch.load(lctx["ckpt_path"], map_location="cpu",
                      weights_only=False)["net"]
    for k, v in exported.items():
        if k in orig:
            np.testing.assert_allclose(v.numpy(), orig[k].numpy(),
                                       rtol=1e-6, atol=1e-7, err_msg=k)
