"""Trainer-loop, optimizer, and checkpoint tests on the micro model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvltrack_tpu.config import default_cfg
from uvltrack_tpu.data.synthetic import synthetic_batch
from uvltrack_tpu.models.bert import BertConfig
from uvltrack_tpu.models.head import MABH
from uvltrack_tpu.models.mufe import MUFE
from uvltrack_tpu.models.uvltrack import UVLTrack
from uvltrack_tpu.parallel.mesh import make_mesh, shard_batch
from uvltrack_tpu.train.checkpoint import CheckpointManager
from uvltrack_tpu.train.optim import build_optimizer, lr_schedule, param_labels
from uvltrack_tpu.train.step import (create_train_state, jit_sharded_train_step,
                                     make_train_step)
from uvltrack_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`


def micro_cfg():
    c = default_cfg()
    c.DATA.TEMPLATE.SIZE = 32
    c.DATA.SEARCH.SIZE = 64
    c.TRAIN.AUX_WEIGHT = 0.1
    c.TRAIN.REDUCTION = "mean"
    c.TRAIN.BATCH_SIZE = 4
    c.TRAIN.EPOCH = 2
    c.TRAIN.PRINT_INTERVAL = 1
    c.TRAIN.VAL_EPOCH_INTERVAL = 0
    c.TRAIN.SCHEDULER.TYPE = "CosineAnnealingLR"
    c.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN = 8
    return c


def micro_model():
    return UVLTrack(
        backbone=MUFE(embed_dim=32, depth=2, num_heads=4, template_size=32,
                      search_size=64, fusion_layers=(1,), cont_loss_layers=(0, 1),
                      txt_token_mode="cls",
                      bert=BertConfig(vocab_size=100, hidden_size=32, num_layers=1,
                                      num_heads=4, intermediate_size=64,
                                      max_position=16)),
        head=MABH(inplanes=32, channel=32, feat_sz=4, cls_tokenize=False,
                  softmax_one=True),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = micro_cfg()
    model = micro_model()
    rng = np.random.default_rng(0)
    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_batch(
        rng, 4, n_search=2, template_size=32, search_size=64, n_text=8, vocab=100))
    variables = jax.jit(lambda r: model.init(
        r, batch["template_images"][0, :2], batch["search_images"][0, :2],
        batch["text"][0, :2], batch["text_mask"][0, :2],
        jnp.zeros((2, 4), bool), jnp.zeros((2, 16), bool),
        batch["flag"][:2], train=False))(jax.random.PRNGKey(0))
    return cfg, model, variables, batch


def test_param_labels_and_frozen_pos(setup):
    _, _, variables, _ = setup
    labels = param_labels(variables["params"])
    assert labels["backbone"]["pos_embed_z"] == "frozen"
    assert labels["backbone"]["pos_embed_x"] == "frozen"
    assert labels["backbone"]["block_0"]["qkv"]["kernel"] == "backbone"
    assert labels["head"]["conv_cls"]["stage_0"]["conv"]["kernel"] == "head"
    # MODEL.LEARNABLE_POSITION=True trains the pos embeds (reference
    # requires_grad=learnable_pos, mae_vit.py:120-121)
    learnable = param_labels(variables["params"], learnable_pos=True)
    assert learnable["backbone"]["pos_embed_z"] == "backbone"
    assert learnable["backbone"]["pos_embed_x"] == "backbone"


def test_lr_schedules():
    cfg = micro_cfg()
    cfg.TRAIN.EPOCH = 100
    for kind, checks in {
        "CosineAnnealingLR": [(0, cfg.TRAIN.LR), (50 * 10, cfg.TRAIN.LR / 2)],
        "step": [(0, cfg.TRAIN.LR)],
        "Mstep": [(0, cfg.TRAIN.LR)],
        "WarmMstep": [(0, cfg.TRAIN.LR / 30)],
    }.items():
        cfg.TRAIN.SCHEDULER.TYPE = kind
        fn = lr_schedule(cfg, steps_per_epoch=10)
        for step, want in checks:
            got = float(fn(jnp.asarray(step)))
            assert np.isclose(got, want, rtol=1e-4), (kind, step, got, want)


def test_train_steps_reduce_loss_and_freeze_pos(setup):
    cfg, model, variables, batch = setup
    tx = build_optimizer(cfg, variables["params"], steps_per_epoch=10)
    state = create_train_state(variables, tx)
    mesh = make_mesh(data=1, model=1)
    step = jit_sharded_train_step(make_train_step(model, tx, cfg), mesh, donate=False)
    pos0 = np.asarray(state.params["backbone"]["pos_embed_z"]).copy()
    qkv0 = np.asarray(state.params["backbone"]["block_0"]["qkv"]["kernel"]).copy()
    # the step donates the incoming state: snapshot shared buffers up front
    bn0 = np.asarray(variables["batch_stats"]["head"]["conv_cls"]["stage_0"]["bn"]["mean"]).copy()
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["Loss/total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch: loss must drop
    # pos embeds frozen, other params updated
    assert np.allclose(np.asarray(state.params["backbone"]["pos_embed_z"]), pos0)
    assert not np.allclose(np.asarray(state.params["backbone"]["block_0"]["qkv"]["kernel"]), qkv0)
    # batch_stats actually update (BN running averages)
    bn1 = np.asarray(state.batch_stats["head"]["conv_cls"]["stage_0"]["bn"]["mean"])
    assert not np.allclose(bn0, bn1)


def test_trainer_loop_checkpoint_resume(setup, tmp_path):
    cfg, model, variables, batch = setup
    tx = build_optimizer(cfg, variables["params"], steps_per_epoch=2)
    state = create_train_state(variables, tx)
    mesh = make_mesh(data=1, model=1)
    step = jit_sharded_train_step(make_train_step(model, tx, cfg), mesh, donate=False)

    class Loader:
        def __iter__(self):
            for _ in range(2):
                yield batch

        def __len__(self):
            return 2

    ckpt_dir = str(tmp_path / "ckpt")
    trainer = Trainer(cfg, step, state, Loader(), checkpoint_dir=ckpt_dir,
                      log_path=str(tmp_path / "log.txt"))
    trainer.train(max_epochs=2, load_latest=False)
    assert int(trainer.state.step) == 4
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.epochs() == [1, 2]

    # resume continues from epoch 2
    trainer2 = Trainer(cfg, step, state, Loader(), checkpoint_dir=ckpt_dir,
                       log_path=str(tmp_path / "log.txt"))
    trainer2.train(max_epochs=3, load_latest=True)
    assert trainer2.epoch == 3
    assert int(trainer2.state.step) == 6


def test_checkpoint_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "c"), keep_last=3, keep_every=5)
    payload = {"x": jnp.ones((2,))}
    for e in range(1, 12):
        mgr.save(e, payload)
    eps = mgr.epochs()
    assert 5 in eps and 10 in eps  # every-5 kept
    assert eps[-3:] == [9, 10, 11]  # last 3 kept
    assert 1 not in eps and 2 not in eps
    state, extra, epoch = mgr.restore({"x": jnp.zeros((2,))})
    assert epoch == 11 and np.allclose(state["x"], 1.0)


def test_grad_accum_matches_full_batch_step():
    """TPU.GRAD_ACCUM=2 (lax.scan microbatches inside the jitted step) must
    produce the same update as the unaccumulated full-batch step under
    REDUCTION='mean' — the losses are sample-decomposable (the contrastive
    logits are per-sample, no cross-batch negatives). freeze_bn head so no
    train-mode batch statistics couple the samples (with live BN each
    microbatch normalizes by its own stats, like the reference's per-GPU
    DDP BatchNorm)."""
    from uvltrack_tpu.models.bert import BertConfig
    from uvltrack_tpu.models.mufe import MUFE
    from uvltrack_tpu.models.head import MABH
    from uvltrack_tpu.models.uvltrack import UVLTrack

    cfg = micro_cfg()
    model = UVLTrack(
        backbone=MUFE(embed_dim=32, depth=2, num_heads=4, template_size=32,
                      search_size=64, fusion_layers=(1,),
                      cont_loss_layers=(0, 1), txt_token_mode="cls",
                      bert=BertConfig(vocab_size=100, hidden_size=32,
                                      num_layers=1, num_heads=4,
                                      intermediate_size=64, max_position=16)),
        head=MABH(inplanes=32, channel=32, feat_sz=4, cls_tokenize=False,
                  softmax_one=True, freeze_bn=True),
    )
    rng = np.random.default_rng(3)
    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_batch(
        rng, 4, n_search=2, template_size=32, search_size=64, n_text=8,
        vocab=100))
    variables = jax.jit(lambda r: model.init(
        r, batch["template_images"][0, :2], batch["search_images"][0, :2],
        batch["text"][0, :2], batch["text_mask"][0, :2],
        jnp.zeros((2, 4), bool), jnp.zeros((2, 16), bool),
        batch["flag"][:2], train=False))(jax.random.PRNGKey(0))
    tx = build_optimizer(cfg, variables["params"], steps_per_epoch=10)
    mesh = make_mesh(data=1, model=1)

    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2.TPU.GRAD_ACCUM = 2
    outs = {}
    for name, c in (("full", cfg), ("accum", cfg2)):
        state = create_train_state(variables, tx)
        step = jit_sharded_train_step(make_train_step(model, tx, c), mesh,
                                      donate=False)
        new_state, metrics = step(state, batch)
        outs[name] = (new_state, metrics)
    # Exactness caveat: the weighted-ignore contrastive CE normalizes by
    # the batch's weight SUM (a ratio of sums, train/losses.py:52), so
    # microbatch means differ from the full-batch value in the 4th decimal
    # — the same approximation the reference's per-GPU DDP loss makes.
    # Everything else (focal, ce_mean, giou/l1) decomposes exactly.
    lf = float(outs["full"][1]["Loss/total"])
    la = float(outs["accum"][1]["Loss/total"])
    assert np.isclose(lf, la, rtol=3e-4), (lf, la)
    gf = float(outs["full"][1]["grad_norm"])
    ga = float(outs["accum"][1]["grad_norm"])
    assert np.isclose(gf, ga, rtol=3e-3), (gf, ga)
    flat_f = jax.tree_util.tree_leaves(outs["full"][0].params)
    flat_a = jax.tree_util.tree_leaves(outs["accum"][0].params)
    for pf, pa in zip(flat_f, flat_a):
        np.testing.assert_allclose(np.asarray(pf), np.asarray(pa),
                                   atol=5e-5, rtol=1e-3)


def test_grad_accum_rejects_indivisible_batch():
    cfg = micro_cfg()
    cfg.TPU.GRAD_ACCUM = 3  # batch of 4 does not divide
    model = micro_model()
    rng = np.random.default_rng(4)
    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_batch(
        rng, 4, n_search=2, template_size=32, search_size=64, n_text=8,
        vocab=100))
    variables = jax.jit(lambda r: model.init(
        r, batch["template_images"][0, :2], batch["search_images"][0, :2],
        batch["text"][0, :2], batch["text_mask"][0, :2],
        jnp.zeros((2, 4), bool), jnp.zeros((2, 16), bool),
        batch["flag"][:2], train=False))(jax.random.PRNGKey(0))
    tx = build_optimizer(cfg, variables["params"], steps_per_epoch=10)
    mesh = make_mesh(data=1, model=1)
    step = jit_sharded_train_step(make_train_step(model, tx, cfg), mesh,
                                  donate=False)
    with pytest.raises(AssertionError, match="GRAD_ACCUM"):
        step(create_train_state(variables, tx), batch)


def test_split_microbatches_axis_rule():
    """_split_microbatches must split the BATCH axis for every documented
    leaf form (actor.py's leaf inventory): ndim>=3 leaves are frame-major
    (n, B, ...) -> axis 1; ndim<=2 leaves are batch-leading — text/text_mask
    (B, Nt), flag (B,) or (B, 1) -> axis 0. Regression: the old ndim>=2
    rule sliced a (B, Nt) text's TOKEN axis and crashed on (B, 1) flags."""
    from uvltrack_tpu.train.step import _split_microbatches

    b, k, nt = 4, 2, 6
    batch = {
        "search_images": jnp.arange(2 * b * 8 * 8 * 3, dtype=jnp.float32)
        .reshape(2, b, 8, 8, 3),
        "search_anno": jnp.arange(2 * b * 4, dtype=jnp.float32)
        .reshape(2, b, 4),
        "text_2d": jnp.arange(b * nt, dtype=jnp.int32).reshape(b, nt),
        "flag": jnp.arange(b, dtype=jnp.int32),
        "flag_2d": jnp.arange(b, dtype=jnp.int32).reshape(b, 1),
    }
    micro = _split_microbatches(batch, k)
    assert micro["search_images"].shape == (k, 2, b // k, 8, 8, 3)
    assert micro["search_anno"].shape == (k, 2, b // k, 4)
    assert micro["text_2d"].shape == (k, b // k, nt)
    assert micro["flag"].shape == (k, b // k)
    assert micro["flag_2d"].shape == (k, b // k, 1)
    # microbatch i must hold rows [i*B/k, (i+1)*B/k) of every leaf — whole
    # samples, with token rows intact
    np.testing.assert_array_equal(np.asarray(micro["text_2d"][1]),
                                  np.asarray(batch["text_2d"][b // k:]))
    np.testing.assert_array_equal(
        np.asarray(micro["search_images"][1]),
        np.asarray(batch["search_images"][:, b // k:]))
    np.testing.assert_array_equal(np.asarray(micro["flag_2d"][0, :, 0]),
                                  np.asarray(batch["flag"][:b // k]))


def test_checkpoint_async_save_roundtrip_and_join(tmp_path):
    """save_async: the write happens off-thread; epochs()/restore join the
    in-flight save so the checkpoint is always visible through the manager
    API; retention GC still applies; mutating the live state after
    save_async must not corrupt the snapshot (device_get happened at call
    time)."""
    mgr = CheckpointManager(str(tmp_path / "c"), keep_last=2, keep_every=100)
    live = {"x": np.ones((4,), np.float32)}
    mgr.save_async(1, live, {"note": "ep1"})
    live["x"][:] = -7.0  # post-call mutation: snapshot must hold 1.0
    # implicit join: epochs() waits for the background write
    assert mgr.epochs() == [1]
    state, extra, epoch = mgr.restore({"x": np.zeros((4,), np.float32)})
    assert epoch == 1 and extra["note"] == "ep1"
    assert np.allclose(state["x"], 1.0)
    # back-to-back async saves serialize (one in flight) and GC keeps last 2
    for e in range(2, 6):
        mgr.save_async(e, {"x": np.full((4,), float(e), np.float32)})
    assert mgr.epochs() == [4, 5]
    state, _, epoch = mgr.restore({"x": np.zeros((4,), np.float32)})
    assert epoch == 5 and np.allclose(state["x"], 5.0)


def test_checkpoint_async_save_error_surfaces_at_wait(tmp_path):
    """A failed background write (deleted directory) must raise at the next
    wait()/epochs(), not vanish — a silently-lost checkpoint would defeat
    the fail-safe restart contract."""
    import shutil

    d = tmp_path / "gone"
    mgr = CheckpointManager(str(d))
    mgr.wait()  # no-op when nothing is in flight
    # block the atomic rename by removing the directory out from under it
    big = {"x": np.zeros((1 << 20,), np.float32)}  # big enough to lose the race
    shutil.rmtree(str(d))
    mgr.save_async(1, big)
    with pytest.raises((OSError, FileNotFoundError)):
        mgr.wait()
    mgr.wait()  # the error is consumed, manager stays usable


def test_zero1_shards_optimizer_moments_and_matches_replicated(setup):
    """ZeRO-1 (cfg.TPU.ZERO1): Adam moments shard over the 8-device "data"
    axis while params stay replicated; one step must produce the same
    numbers as the fully-replicated step."""
    from uvltrack_tpu.parallel.mesh import shard_batch, zero1_state_shardings

    cfg, model, variables, _ = setup
    rng = np.random.default_rng(7)
    batch = jax.tree_util.tree_map(jnp.asarray, synthetic_batch(
        rng, 8, n_search=2, template_size=32, search_size=64, n_text=8,
        vocab=100))
    tx = build_optimizer(cfg, variables["params"], steps_per_epoch=10)
    mesh = make_mesh(data=8, model=1)

    state_r = create_train_state(variables, tx)
    step_r = jit_sharded_train_step(make_train_step(model, tx, cfg), mesh,
                                    donate=False)
    state_z = create_train_state(variables, tx)
    step_z = jit_sharded_train_step(make_train_step(model, tx, cfg), mesh,
                                    donate=False, zero1=True, state=state_z)

    sbatch = shard_batch(mesh, batch)
    out_r, m_r = step_r(state_r, sbatch)
    out_z, m_z = step_z(state_z, sbatch)

    # moments actually sharded: a (96, 32) qkv-kernel moment splits over data
    mu = out_z.opt_state[0].mu if hasattr(out_z.opt_state[0], "mu") else None
    if mu is None:  # optax chain: find the ScaleByAdam state
        for s in jax.tree_util.tree_leaves(
                out_z.opt_state, is_leaf=lambda x: hasattr(x, "mu")):
            if hasattr(s, "mu"):
                mu = s.mu
                break
    assert mu is not None
    leaf = mu["backbone"]["block_0"]["qkv"]["kernel"]
    spec = leaf.sharding.spec
    assert "data" in str(spec), spec
    # params replicated
    pleaf = out_z.params["backbone"]["block_0"]["qkv"]["kernel"]
    assert pleaf.sharding.is_fully_replicated

    # numerics identical to the replicated step
    np.testing.assert_allclose(float(m_z["Loss/total"]),
                               float(m_r["Loss/total"]), rtol=1e-6)
    # collective reordering (all-reduce vs reduce-scatter+gather) perturbs
    # gradients at float32 roundoff; the first Adam step amplifies that to
    # ~1e-4 relative on the updated params (nu starts at zero)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-3, atol=1e-4),
        out_r.params, out_z.params)
    # second step works off the sharded state (resharding contract holds)
    out_z2, m_z2 = step_z(out_z, sbatch)
    assert np.isfinite(float(m_z2["Loss/total"]))


def test_trainer_fail_safe_restarts_from_checkpoint(setup, tmp_path):
    """base_trainer.py:99-108 parity: a crashing epoch reloads the last
    checkpoint and continues; retries cap out and re-raise."""
    from uvltrack_tpu.train.trainer import Trainer

    cfg, model, variables, batch = setup
    tx = build_optimizer(cfg, variables["params"], steps_per_epoch=2)
    state = create_train_state(variables, tx)
    mesh = make_mesh(data=1, model=1)
    real_step = jit_sharded_train_step(make_train_step(model, tx, cfg), mesh,
                                       donate=False)
    crashes = {"left": 2}

    def flaky_step(s, b):
        # crash mid-run: once in epoch 2 (after epoch 1 checkpointed) and
        # once immediately on the restart attempt
        if int(s.step) == 3 and crashes["left"] > 0:
            crashes["left"] -= 1
            raise RuntimeError("injected device failure")
        return real_step(s, b)

    class Loader:
        def __iter__(self):
            for _ in range(2):
                yield batch

        def __len__(self):
            return 2

    log = tmp_path / "t.log"
    trainer = Trainer(cfg, flaky_step, state, Loader(),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      log_path=str(log))
    out = trainer.train(3, load_latest=False, fail_safe=True)
    assert trainer.epoch == 3
    assert int(out.step) == 6  # 3 epochs x 2 steps despite 2 crashes
    assert crashes["left"] == 0
    text = log.read_text()
    assert "crashed (retry 1)" in text and "restarted from epoch 1" in text

    # without fail_safe the injected failure propagates
    crashes["left"] = 1
    state2 = create_train_state(variables, tx)
    trainer2 = Trainer(cfg, flaky_step, state2, Loader(),
                       checkpoint_dir=str(tmp_path / "ckpt2"))
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        trainer2.train(3, load_latest=False, fail_safe=False)


def test_trainer_donated_state_no_checkpoint_reraises(setup, tmp_path):
    """A crash INSIDE a donating step before any checkpoint exists leaves
    self.state's buffers deleted; the fail-safe must re-raise the original
    error instead of burning max_retries on 'Array has been deleted'."""
    import jax

    from uvltrack_tpu.train.trainer import Trainer

    cfg, model, variables, batch = setup
    tx = build_optimizer(cfg, variables["params"], steps_per_epoch=2)
    state = create_train_state(variables, tx)
    mesh = make_mesh(data=1, model=1)
    real_step = jit_sharded_train_step(make_train_step(model, tx, cfg), mesh,
                                       donate=True)

    def step_then_crash(s, b):
        out, m = real_step(s, b)  # really donates s's buffers...
        jax.block_until_ready(out)
        raise RuntimeError("device failure after donation")  # ...then dies

    class Loader:
        def __iter__(self):
            yield batch

        def __len__(self):
            return 1

    log = tmp_path / "t.log"
    trainer = Trainer(cfg, step_then_crash, state, Loader(),
                      checkpoint_dir=str(tmp_path / "ckpt"),
                      log_path=str(log))
    with pytest.raises(RuntimeError, match="device failure after donation"):
        trainer.train(2, load_latest=False, fail_safe=True, max_retries=10)
    text = log.read_text()
    assert "no checkpoint exists; re-raising" in text
    # exactly one attempt was made - not 10 masked retries
    assert "crashed (retry 2)" not in text
