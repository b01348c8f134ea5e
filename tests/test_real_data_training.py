"""End-to-end real-data training path: synthetic disk layouts ->
names2datasets -> build_train_loader/build_val_loaders -> actual sharded
train/eval steps — the exact seam cli/train.py uses outside --synthetic
(build_dataloaders parity, base_functions.py:73-191)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_train_stack import micro_cfg, micro_model

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`


def _write_lasot(root, n_seq=2, n_frames=24):
    rng = np.random.default_rng(0)
    names = []
    for k in range(n_seq):
        name = f"airplane-{k + 1}"
        d = root / "airplane" / name
        (d / "img").mkdir(parents=True)
        gt = np.tile([8.0 + k, 9.0, 18.0, 16.0], (n_frames, 1))
        np.savetxt(d / "groundtruth.txt", gt, delimiter=",", fmt="%d")
        (d / "full_occlusion.txt").write_text(",".join(["0"] * n_frames))
        (d / "out_of_view.txt").write_text(",".join(["0"] * n_frames))
        (d / "nlp.txt").write_text("a toy plane on the left\n")
        for i in range(1, n_frames + 1):
            cv2.imwrite(str(d / "img" / f"{i:08d}.jpg"),
                        rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8))
        names.append(name)
    (root / "training_set.txt").write_text("\n".join(names) + "\n")


def test_train_and_val_loaders_feed_real_train_steps(tmp_path, monkeypatch):
    _write_lasot(tmp_path / "lasot")
    monkeypatch.setenv("UVLTRACK_LASOT_PATH", str(tmp_path / "lasot"))
    from uvltrack_tpu.eval.environment import reset_env_cache

    reset_env_cache()
    try:
        from uvltrack_tpu.data.loader import (build_train_loader,
                                              build_val_loaders)
        from uvltrack_tpu.parallel.mesh import make_mesh, shard_batch
        from uvltrack_tpu.train.optim import build_optimizer
        from uvltrack_tpu.train.step import (create_train_state,
                                             jit_sharded_train_step,
                                             make_eval_step, make_train_step)

        cfg = micro_cfg()
        cfg.TRAIN.MODE = "joint"
        cfg.TRAIN.GROUNDING_RATIO = 0.3
        cfg.TRAIN.VL_RATIO = 0.3
        cfg.TRAIN.NUM_WORKER = 2
        cfg.DATA.TRAIN.DATASETS_NAME = ["LASOT"]
        cfg.DATA.TRAIN.DATASETS_RATIO = [1]
        cfg.DATA.TRAIN.SAMPLE_PER_EPOCH = 8
        cfg.DATA.SEARCH.NUMBER = 2
        cfg.DATA.VAL.DATASETS_NAME = ["LASOT"]
        cfg.DATA.VAL.SAMPLE_PER_EPOCH = 4
        cfg.DATA.VALTRACK.DATASETS_NAME = ["LASOT"]
        cfg.DATA.VALTRACK.SAMPLE_PER_EPOCH = 4
        cfg.DATA.VALVL.DATASETS_NAME = ["LASOT"]
        cfg.DATA.VALVL.SAMPLE_PER_EPOCH = 4
        cfg.MODEL.BACKBONE.LANGUAGE.VOCAB_PATH = ""  # no vocab file: ids zero

        global_batch = 4
        train_loader = build_train_loader(cfg, global_batch)
        assert len(train_loader) == 2  # 8 samples / batch 4
        val_loaders = build_val_loaders(cfg, global_batch)
        assert set(val_loaders) == {"valtrack", "valground", "valvl"}

        model = micro_model()
        batches = list(train_loader)
        assert len(batches) == 2
        b0 = batches[0]
        assert b0["search_images"].shape == (2, 4, 64, 64, 3)
        assert b0["template_images"].shape == (1, 4, 32, 32, 3)
        assert b0["flag"].shape == (4,)

        variables = jax.jit(lambda r: model.init(
            r, jnp.asarray(b0["template_images"][0, :2]),
            jnp.asarray(b0["search_images"][0, :2]),
            jnp.asarray(b0["text"][0, :2]), jnp.asarray(b0["text_mask"][0, :2]),
            jnp.zeros((2, 4), bool), jnp.zeros((2, 16), bool),
            jnp.asarray(b0["flag"][:2]), train=False))(jax.random.PRNGKey(0))
        tx = build_optimizer(cfg, variables["params"], steps_per_epoch=2)
        state = create_train_state(variables, tx)
        mesh = make_mesh(data=1, model=1)
        step = jit_sharded_train_step(make_train_step(model, tx, cfg), mesh,
                                      donate=False)
        losses = []
        for b in batches:
            state, metrics = step(state, shard_batch(mesh, b))
            losses.append(float(metrics["Loss/total"]))
        assert all(np.isfinite(losses)), losses

        # one val batch through the eval step (IoU / Acc@0.5 reported)
        eval_step = jax.jit(make_eval_step(model, cfg))
        vb = next(iter(val_loaders["valground"]))
        m = eval_step(state, jax.tree_util.tree_map(jnp.asarray, vb))
        assert np.isfinite(float(m["Loss/total"]))
        assert "IoU" in m and "Acc@0.5" in m
        # the other two val families (tracking_test / vl_test sampler modes)
        # produce batches with the pinned flags
        vt = next(iter(val_loaders["valtrack"]))
        assert set(np.asarray(vt["flag"]).tolist()) <= {0}
        vv = next(iter(val_loaders["valvl"]))
        assert set(np.asarray(vv["flag"]).tolist()) <= {2}
        assert vt["search_images"].shape == vv["search_images"].shape == \
            (2, 4, 64, 64, 3)
    finally:
        reset_env_cache()
