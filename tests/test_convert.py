"""Checkpoint-converter tests with synthetic reference-style state dicts."""

import jax
import numpy as np
import pytest

from uvltrack_tpu.models.convert import convert_bert, convert_mae_vit, convert_uvltrack
from test_model import tiny_model, tiny_inputs


@pytest.fixture(scope="module")
def variables():
    model = tiny_model()
    inp = tiny_inputs()
    # jitted: unjitted flax init is ~100x slower on this 1-core sandbox
    return jax.jit(lambda r: model.init(r, *inp, train=False))(jax.random.PRNGKey(0))


def _reference_style_state(params, batch_stats):
    """Build a torch-named state dict shaped to match the tiny model."""
    rng = np.random.default_rng(0)
    st = {}

    def arr(shape):
        return rng.normal(size=shape).astype(np.float32)

    bk = params["backbone"]
    c = bk["cls_token"].shape[-1]
    st["backbone.logit_scale"] = np.asarray(0.5, np.float32)
    st["backbone.vit.cls_token"] = arr(bk["cls_token"].shape)
    st["backbone.vit.pos_embed_z"] = arr(bk["pos_embed_z"].shape)
    st["backbone.vit.pos_embed_x"] = arr(bk["pos_embed_x"].shape)
    st["backbone.vit.modal_embed"] = arr(bk["modal_embed"].shape)
    k = bk["patch_embed"]["proj"]["kernel"]  # (16,16,3,C)
    st["backbone.vit.patch_embed.proj.weight"] = arr((k.shape[3], k.shape[2], k.shape[0], k.shape[1]))
    st["backbone.vit.patch_embed.proj.bias"] = arr((c,))
    for i in range(4):
        p = f"backbone.vit.blocks.{i}."
        st[p + "norm1.weight"] = arr((c,))
        st[p + "norm1.bias"] = arr((c,))
        st[p + "attn.qkv.weight"] = arr((3 * c, c))
        st[p + "attn.qkv.bias"] = arr((3 * c,))
        st[p + "attn.proj.weight"] = arr((c, c))
        st[p + "attn.proj.bias"] = arr((c,))
        st[p + "norm2.weight"] = arr((c,))
        st[p + "norm2.bias"] = arr((c,))
        st[p + "mlp.fc1.weight"] = arr((4 * c, c))
        st[p + "mlp.fc1.bias"] = arr((4 * c,))
        st[p + "mlp.fc2.weight"] = arr((c, 4 * c))
        st[p + "mlp.fc2.bias"] = arr((c,))
    # bert (old-style gamma/beta names to exercise renaming)
    be = bk["bert_embeddings"]
    st["backbone.bert.embeddings.word_embeddings.weight"] = arr(be["word_embeddings"]["embedding"].shape)
    st["backbone.bert.embeddings.position_embeddings.weight"] = arr(be["position_embeddings"]["embedding"].shape)
    st["backbone.bert.embeddings.token_type_embeddings.weight"] = arr(be["token_type_embeddings"]["embedding"].shape)
    st["backbone.bert.embeddings.LayerNorm.gamma"] = arr((c,))
    st["backbone.bert.embeddings.LayerNorm.beta"] = arr((c,))
    for i in range(2):
        p = f"backbone.bert.encoder.layer.{i}."
        for qkv in ("query", "key", "value"):
            st[p + f"attention.self.{qkv}.weight"] = arr((c, c))
            st[p + f"attention.self.{qkv}.bias"] = arr((c,))
        st[p + "attention.output.dense.weight"] = arr((c, c))
        st[p + "attention.output.dense.bias"] = arr((c,))
        st[p + "attention.output.LayerNorm.gamma"] = arr((c,))
        st[p + "attention.output.LayerNorm.beta"] = arr((c,))
        st[p + "intermediate.dense.weight"] = arr((2 * c, c))
        st[p + "intermediate.dense.bias"] = arr((2 * c,))
        st[p + "output.dense.weight"] = arr((c, 2 * c))
        st[p + "output.dense.bias"] = arr((c,))
        st[p + "output.LayerNorm.gamma"] = arr((c,))
        st[p + "output.LayerNorm.beta"] = arr((c,))
    # head towers
    ch = {0: (32, 32), 1: (16, 32), 2: (8, 16), 3: (4, 8)}
    for tower in ("conv_cls", "conv_offset", "conv_bbox", "conv_bbox_grounding"):
        for i, (o, ic) in ch.items():
            p = f"box_head.{tower}.{i}."
            st[p + "0.weight"] = arr((o, ic, 3, 3))
            st[p + "0.bias"] = arr((o,))
            st[p + "1.weight"] = arr((o,))
            st[p + "1.bias"] = arr((o,))
            st[p + "1.running_mean"] = arr((o,))
            st[p + "1.running_var"] = np.abs(arr((o,)))
        out_ch = 1 if tower == "conv_cls" else 2
        st[f"box_head.{tower}.4.weight"] = arr((out_ch, 4, 1, 1))
        st[f"box_head.{tower}.4.bias"] = arr((out_ch,))
    st["box_head.logit_scale"] = np.asarray(0.3, np.float32)
    st["box_head.prompter.logit_scale"] = np.asarray(0.2, np.float32)
    st["box_head.prompter.query_embed.weight"] = arr((3, c))
    st["box_head.prompter.mlp.fc1.weight"] = arr((4 * c, c))
    st["box_head.prompter.mlp.fc1.bias"] = arr((4 * c,))
    st["box_head.prompter.mlp.fc2.weight"] = arr((c, 4 * c))
    st["box_head.prompter.mlp.fc2.bias"] = arr((c,))
    # a key the converter should report as unused
    st["box_head.prompter.q.weight"] = arr((c, c))
    return st


def test_convert_uvltrack_full(variables):
    params = variables["params"]
    bstats = variables["batch_stats"]
    st = _reference_style_state(params, bstats)
    new_params, new_bstats, unused = convert_uvltrack(st, params, bstats)

    # transposed linear: qkv kernel == state dict weight .T
    got = new_params["backbone"]["block_0"]["qkv"]["kernel"]
    assert np.allclose(got, st["backbone.vit.blocks.0.attn.qkv.weight"].T)
    # conv kernel layout (O,I,kh,kw) -> (kh,kw,I,O)
    got = new_params["head"]["conv_cls"]["stage_0"]["conv"]["kernel"]
    assert np.allclose(got, st["box_head.conv_cls.0.0.weight"].transpose(2, 3, 1, 0))
    # embeddings copied untransposed; gamma/beta renamed
    got = new_params["backbone"]["bert_embeddings"]["LayerNorm"]["scale"]
    assert np.allclose(got, st["backbone.bert.embeddings.LayerNorm.gamma"])
    # BN running stats land in batch_stats
    got = new_bstats["head"]["conv_bbox"]["stage_2"]["bn"]["mean"]
    assert np.allclose(got, st["box_head.conv_bbox.2.1.running_mean"])
    # prompter query embed + scalars
    assert np.allclose(new_params["head"]["prompter"]["query_embed"],
                       st["box_head.prompter.query_embed.weight"])
    assert np.allclose(new_params["backbone"]["logit_scale"], 0.5)
    # unused keys reported (the prompter's dead q/kv linears)
    assert "box_head.prompter.q.weight" in unused


def test_convert_uvltrack_strict_raises_on_missing_keys(variables):
    """A truncated/wrong-config checkpoint must fail loudly (reference
    strict load_state_dict), not track with randomly initialized leaves."""
    import pytest

    params = variables["params"]
    bstats = variables["batch_stats"]
    st = _reference_style_state(params, bstats)
    del st["backbone.vit.blocks.0.attn.qkv.weight"]
    del st["box_head.conv_bbox.2.1.running_mean"]
    with pytest.raises(ValueError, match="missing 2 expected keys"):
        convert_uvltrack(st, params, bstats)
    # strict=False loads the matching subset (partial-load escape hatch)
    p, b, _ = convert_uvltrack(st, params, bstats, strict=False)
    assert np.allclose(p["backbone"]["block_0"]["qkv"]["kernel"],
                       params["backbone"]["block_0"]["qkv"]["kernel"])


def test_convert_refuses_text_proj_models(variables):
    """text_proj only exists when BERT hidden_size != embed_dim — a pairing
    the reference cannot run (ViT-L goes with bert-large), so no reference
    checkpoint carries its weights. Loading/exporting must fail loudly, not
    leave the projection at random init."""
    from uvltrack_tpu.models.convert import export_uvltrack

    params = dict(variables["params"])
    params["backbone"] = dict(params["backbone"])
    params["backbone"]["text_proj"] = {
        "kernel": np.zeros((8, 16), np.float32),
        "bias": np.zeros((16,), np.float32)}
    bstats = variables["batch_stats"]
    st = _reference_style_state(variables["params"], bstats)
    with pytest.raises(ValueError, match="text_proj"):
        convert_uvltrack(st, params, bstats)
    with pytest.raises(ValueError, match="text_proj"):
        export_uvltrack(params, bstats)


def test_convert_mae_and_bert_subsets(variables):
    params = variables["params"]
    rng = np.random.default_rng(1)
    c = params["backbone"]["cls_token"].shape[-1]
    mae = {
        "cls_token": rng.normal(size=params["backbone"]["cls_token"].shape).astype(np.float32),
        "blocks.1.attn.qkv.weight": rng.normal(size=(3 * c, c)).astype(np.float32),
        "blocks.1.attn.qkv.bias": rng.normal(size=(3 * c,)).astype(np.float32),
        "pos_embed": rng.normal(size=(1, 197, c)).astype(np.float32),  # ignored
    }
    new_params, unused = convert_mae_vit(mae, params)
    assert np.allclose(new_params["backbone"]["block_1"]["qkv"]["kernel"],
                       mae["blocks.1.attn.qkv.weight"].T)
    assert "pos_embed" in unused

    bert = {
        "bert.embeddings.word_embeddings.weight":
            rng.normal(size=params["backbone"]["bert_embeddings"]["word_embeddings"]["embedding"].shape).astype(np.float32),
        "bert.encoder.layer.0.attention.self.query.weight":
            rng.normal(size=(c, c)).astype(np.float32),
        "bert.encoder.layer.0.attention.self.query.bias":
            rng.normal(size=(c,)).astype(np.float32),
        "bert.pooler.dense.weight": rng.normal(size=(c, c)).astype(np.float32),  # unused
    }
    new_params, unused = convert_bert(bert, params)
    assert np.allclose(new_params["backbone"]["bert_layer_0"]["query"]["kernel"],
                       bert["bert.encoder.layer.0.attention.self.query.weight"].T)
    assert "bert.pooler.dense.weight" in unused


def test_load_bert_archive_targz(variables, tmp_path):
    """tar.gz ingestion matching the released-BERT archive layout
    (bert_backbone.py:584-600: extract, read pytorch_model.bin)."""
    import os
    import tarfile

    import torch

    from uvltrack_tpu.models.convert import load_bert_archive

    c = variables["params"]["backbone"]["cls_token"].shape[-1]
    rng = np.random.default_rng(2)
    state = {
        "bert.embeddings.LayerNorm.gamma":
            torch.from_numpy(rng.normal(size=(c,)).astype(np.float32)),
        "bert.encoder.layer.0.attention.self.query.weight":
            torch.from_numpy(rng.normal(size=(c, c)).astype(np.float32)),
    }
    inner = tmp_path / "bert-base-uncased"
    inner.mkdir()
    torch.save(state, inner / "pytorch_model.bin")
    (inner / "bert_config.json").write_text("{}")
    archive = tmp_path / "bert-base-uncased.tar.gz"
    with tarfile.open(archive, "w:gz") as tf:
        tf.add(inner, arcname="bert-base-uncased")

    # from the tar.gz
    got = load_bert_archive(str(archive))
    assert set(got) == set(state)
    assert np.allclose(got["bert.embeddings.LayerNorm.gamma"],
                       state["bert.embeddings.LayerNorm.gamma"].numpy())
    # from the extracted directory
    got2 = load_bert_archive(str(inner))
    assert set(got2) == set(state)
    # from the bare .bin
    got3 = load_bert_archive(str(inner / "pytorch_model.bin"))
    assert set(got3) == set(state)
    # gamma/beta rename happens downstream in convert_bert
    new_params, _ = convert_bert(got, variables["params"])
    assert np.allclose(
        new_params["backbone"]["bert_embeddings"]["LayerNorm"]["scale"],
        state["bert.embeddings.LayerNorm.gamma"].numpy())
    assert os.path.exists(archive)  # archive untouched


def test_export_round_trips(variables, tmp_path):
    """export_uvltrack is the exact inverse of convert_uvltrack, and
    save_torch_checkpoint writes a reference-loadable {'net': ...} file."""
    import torch

    from uvltrack_tpu.models.convert import (convert_uvltrack,
                                             export_uvltrack,
                                             load_torch_file,
                                             save_torch_checkpoint)

    params = variables["params"]
    bstats = variables["batch_stats"]
    import re

    ref_state = _reference_style_state(params, bstats)
    ref_state.pop("box_head.prompter.q.weight")  # dead key, not exported
    p2, b2, unused = convert_uvltrack(ref_state, params, bstats)
    assert unused == []
    exported = export_uvltrack(p2, b2)
    # the exporter emits modern LayerNorm names; normalize the old-style
    # gamma/beta keys of the synthetic fixture the same way convert does
    ref_state = {re.sub(r"\.gamma$", ".weight", re.sub(r"\.beta$", ".bias", k)): v
                 for k, v in ref_state.items()}
    for k, v in ref_state.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_allclose(exported[k], v, rtol=1e-6, atol=1e-7,
                                   err_msg=k)
    # nothing extra beyond the BN bookkeeping scalars
    extra = set(exported) - set(ref_state)
    assert all(k.endswith("num_batches_tracked") for k in extra)

    # .pth.tar round trip through torch
    path = str(tmp_path / "export.pth.tar")
    save_torch_checkpoint(path, p2, b2, epoch=7)
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 7
    back = load_torch_file(path)
    p3, b3, _ = convert_uvltrack(back, params, bstats)
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_export_passthrough_and_bf16(variables, tmp_path):
    """num_batches_tracked passthrough preserves imported counters; bf16
    trees upcast instead of crashing torch.from_numpy."""
    import jax.numpy as jnp

    from uvltrack_tpu.models.convert import export_uvltrack

    params = variables["params"]
    bstats = variables["batch_stats"]
    nb_key = "box_head.conv_cls.0.1.num_batches_tracked"
    exported = export_uvltrack(params, bstats,
                               passthrough={nb_key: np.asarray(120000)})
    assert int(exported[nb_key]) == 120000
    # others default to 0
    assert int(exported["box_head.conv_bbox.0.1.num_batches_tracked"]) == 0

    from uvltrack_tpu.models.uvltrack import cast_inference_variables

    cast = cast_inference_variables({"params": params, "batch_stats": bstats},
                                    jnp.bfloat16)
    exported16 = export_uvltrack(cast["params"], cast["batch_stats"])
    import torch

    t = torch.from_numpy(exported16["backbone.vit.blocks.0.attn.qkv.weight"].copy())
    assert t.dtype == torch.float32


def test_runbook_random_pth_roundtrip(tmp_path, monkeypatch):
    """RUNBOOK.md step 2 smoke: a reference-format .pth.tar of random
    weights (models/convert.py::save_torch_checkpoint) drives the
    cli/parity dump end-to-end — the exact command a user runs the day
    the released checkpoints arrive, minus the real weights."""
    from uvltrack_tpu.cli import parity as cli_parity
    from uvltrack_tpu.config import load_cfg
    from uvltrack_tpu.eval.environment import reset_env_cache
    from uvltrack_tpu.models import bert as bert_mod
    from uvltrack_tpu.models import uvltrack as uv
    from uvltrack_tpu.models.convert import save_torch_checkpoint
    from uvltrack_tpu.models.vit import VIT_VARIANTS

    monkeypatch.setitem(VIT_VARIANTS, "base",
                        dict(embed_dim=32, depth=2, num_heads=4))
    tiny_bert = bert_mod.BertConfig(vocab_size=64, hidden_size=32,
                                    num_layers=1, num_heads=4,
                                    intermediate_size=64, max_position=64)
    monkeypatch.setattr(uv, "bert_config_from_type", lambda t: tiny_bert)

    (tmp_path / "experiments" / "uvltrack").mkdir(parents=True)
    yaml_path = tmp_path / "experiments" / "uvltrack" / "tiny_smoke.yaml"
    yaml_path.write_text(
        "DATA: {TEMPLATE: {SIZE: 32}, SEARCH: {SIZE: 64}}\n"
        "MODEL:\n"
        "  HIDDEN_DIM: 32\n"
        "  HEAD: {HEAD_DIM: 32}\n"
        "  BACKBONE: {FUSION_LAYER: [1], CONT_LOSS_LAYER: [1]}\n"
        "TEST: {TEMPLATE_SIZE: 32, SEARCH_SIZE: 64, TEMPLATE_FACTOR: 2.0,\n"
        "       SEARCH_FACTOR: 4.0, MODE: BBOX, EPOCH: 1}\n")
    monkeypatch.setenv("UVLTRACK_REPO", str(tmp_path))
    reset_env_cache()
    try:
        # random weights, exported in the reference's {'net': ...} format
        cfg = load_cfg(str(yaml_path))
        model = uv.build_model(cfg)
        variables = uv.init_model(model, cfg, jax.random.PRNGKey(3))
        ckpt = str(tmp_path / "UVLTrack_ep0300.pth.tar")
        save_torch_checkpoint(ckpt, variables["params"],
                              variables.get("batch_stats", {}), epoch=300)

        out = str(tmp_path / "parity_dump.npz")
        cli_parity.main(["--checkpoint", ckpt, "--config", "tiny_smoke",
                         "--out", out])
    finally:
        reset_env_cache()

    dump = np.load(out)
    for k in ("template", "search", "prompt", "out_cls_score_test",
              "out_cont_score", "out_bbox_map", "out_pred_boxes"):
        assert k in dump.files, f"missing stage {k}: {sorted(dump.files)}"
        assert np.isfinite(dump[k]).all(), k
