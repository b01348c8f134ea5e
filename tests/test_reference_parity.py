"""Numerical parity against the ACTUAL reference implementation at
/root/reference, at full UVLTrack-B size (ViT-B/768, template 128, search 256,
BERT-base truncated to 6 layers).

This is the strongest equivalence guarantee available without the released
checkpoints: the genuine PyTorch modules (lib/models/...) are built with
random weights, their state dict is saved as a real .pth.tar-style checkpoint
({'net': ...}), converted with convert_uvltrack, and every runtime path is
compared end to end:

- backbone out-dict + forward_prompt_init + forward_test (flags 0/1/2)
- the full train forward + five-loss assembly (lib/train/actors/uvltrack.py)
- the sequence-level tracker state machine (lib/test/tracker/uvltrack.py)
  driven frame-by-frame on a synthetic clip, per-frame boxes compared

Skips cleanly when /root/reference or torch is unavailable.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _reference  # noqa: E402

if not _reference.reference_available():  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uvltrack_tpu.config import load_cfg  # noqa: E402
from uvltrack_tpu.models.convert import convert_uvltrack  # noqa: E402
from uvltrack_tpu.models.uvltrack import UVLTrack, build_model  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy: excluded from `pytest -m 'not slow'`

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

B = 2
NT = 40
NZ, NX, FEAT = 64, 256, 16

# Reference parameters with no consumer on the reference main path (verified
# against the forwards): the prompter's q/kv/proj/norm + dropout-only modules
# (heads/utils.py:31-40), the frozen BERT pooler
# (modality_unified_feature_extractor.py:40), and vit.norm, which
# MUFE.forward never applies (modality_unified_feature_extractor.py:52-77).
DEAD_KEY_PREFIXES = (
    "backbone.bert.pooler.",
    "box_head.prompter.q.",
    "box_head.prompter.kv.",
    "box_head.prompter.proj.",
    "box_head.prompter.norm.",
    "backbone.vit.norm.",
    # deterministic/bookkeeping buffers, not weights: the coodinate meshgrid
    # (modality_adaptive_box_head.py:54-60, recomputed in models/head.py) and
    # BatchNorm step counters
    "box_head.coodinate",
)


def _is_dead_key(k: str) -> bool:
    return k.startswith(DEAD_KEY_PREFIXES) or k.endswith("num_batches_tracked")


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    td = str(tmp_path_factory.mktemp("refparity"))
    ref_cfg = _reference.build_reference_cfg(td)
    ref_model = _reference.build_reference_model(ref_cfg, seed=0)

    ckpt_path = os.path.join(td, "UVLTrack_ep0300.pth.tar")
    torch.save({"net": ref_model.state_dict()}, ckpt_path)

    cfg = load_cfg(os.path.join(REPO, "experiments/uvltrack/baseline_base.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)

    # Param/stat tree skeleton without compiling an init: every leaf must be
    # overwritten by the converter, so zeros are a correctness tripwire.
    tz, sx = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, tz, tz, 3)), jnp.zeros((1, sx, sx, 3)),
                           jnp.zeros((1, NT), jnp.int32), jnp.ones((1, NT), jnp.int32),
                           jnp.zeros((1, NZ), bool), jnp.zeros((1, NX), bool),
                           jnp.zeros((1,), jnp.int32), train=False))
    zero_vars = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)

    from uvltrack_tpu.models.convert import load_torch_file

    state = load_torch_file(ckpt_path)
    params, batch_stats, unused = convert_uvltrack(
        state, zero_vars["params"], zero_vars["batch_stats"])
    leftovers = [k for k in unused if not _is_dead_key(k)]
    assert leftovers == [], f"converter missed live reference params: {leftovers}"

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)}
    # jit once for all parametrized cases (3 flags share one compile)
    prompt_init = jax.jit(lambda v, *a: model.apply(
        v, *a, method=UVLTrack.forward_prompt_init))
    fwd_test = jax.jit(lambda v, t, s, ti, tm, p, f: model.apply(
        v, t, s, ti, tm, p, f, method=UVLTrack.forward_test))
    return dict(ref_cfg=ref_cfg, ref_model=ref_model, cfg=cfg, model=model,
                variables=variables, ckpt_path=ckpt_path, tmpdir=td,
                prompt_init=prompt_init, fwd_test=fwd_test)


def _inputs(seed=1, flag_val=2):
    rng = np.random.default_rng(seed)
    template = rng.normal(size=(B, 128, 128, 3)).astype(np.float32)
    search = rng.normal(size=(B, 256, 256, 3)).astype(np.float32)
    ids = rng.integers(100, 30000, size=(B, NT)).astype(np.int64)
    mask = np.ones((B, NT), np.float32)
    mask[:, 30:] = 0.0
    tmask = rng.random((B, NZ)) > 0.7
    tmask[:, 27] = True  # guarantee non-empty target region
    cmask = rng.random((B, NX)) > 0.7
    cmask[:, 119] = True
    flag = np.full((B,), flag_val, np.int64)
    return template, search, ids, mask, tmask, cmask, flag


def _ref_forward(ref_model, template, search, ids, mask, tmask, cmask, flag):
    from lib.utils.misc import NestedTensor

    t = torch.tensor(template).permute(0, 3, 1, 2)
    s = torch.tensor(search).permute(0, 3, 1, 2)
    text = NestedTensor(torch.tensor(ids), torch.tensor(mask))
    tm = torch.tensor(tmask)
    cm = torch.tensor(cmask)
    fl = torch.tensor(flag).reshape(-1, 1)
    with torch.no_grad():
        prompt = ref_model.forward_prompt_init(t, s, text, tm, cm, fl)
        out = ref_model.forward_test(t, s, text, prompt, fl)
    return prompt, out


@pytest.mark.parametrize("flag_val", [0, 1, 2])
def test_forward_test_parity(ctx, flag_val):
    """forward_prompt_init + forward_test vs the genuine reference modules."""
    template, search, ids, mask, tmask, cmask, flag = _inputs(
        seed=10 + flag_val, flag_val=flag_val)
    if flag_val == 1:  # grounding: zero template, empty masks (tracker :45-62)
        template = np.zeros_like(template)
        tmask = np.zeros_like(tmask)
        cmask = np.zeros_like(cmask)

    prompt_t, out_t = _ref_forward(ctx["ref_model"], template, search, ids,
                                   mask, tmask, cmask, flag)

    model, variables = ctx["model"], ctx["variables"]
    args = (jnp.asarray(template), jnp.asarray(search),
            jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
            jnp.asarray(tmask), jnp.asarray(cmask), jnp.asarray(flag, jnp.int32))
    prompt_j = ctx["prompt_init"](variables, *args)
    out_j = ctx["fwd_test"](
        variables, args[0], args[1], args[2], args[3], prompt_j, args[6])

    np.testing.assert_allclose(np.asarray(prompt_j), prompt_t.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["cls_score_test"]).reshape(B, -1),
                               out_t["cls_score_test"].reshape(B, -1).numpy(),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_j["cont_score"]),
                               out_t["cont_score"].numpy(), atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out_j["bbox_map"]),
                               out_t["bbox_map"].numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["logits"]),
                               out_t["logits"].numpy(), atol=3e-2, rtol=1e-2)
    # backbone features
    np.testing.assert_allclose(np.asarray(out_j["search"]),
                               out_t["search"].numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_j["template"]),
                               out_t["template"].numpy(), atol=2e-3, rtol=1e-3)


def test_train_forward_and_loss_parity(ctx):
    """The full training objective vs lib/train/actors/uvltrack.py:135-177 on
    an identical batch covering all three flags (n=2 search frames, b=3:
    BBOX / grounding / NL+BBOX). The flag=1 row follows the grounding
    processing contract (lib/train/data/processing.py:297-298): zero template
    image, zero template anno."""
    from lib import registry as ref_registry
    import lib.train.actors  # noqa: F401

    ref_cfg = ctx["ref_cfg"]
    actor = ref_registry.ACTORS["uvltrack"](ctx["ref_model"], ref_cfg)

    n, b = 2, 3
    rng = np.random.default_rng(7)
    template = rng.normal(size=(1, b, 128, 128, 3)).astype(np.float32)
    search = rng.normal(size=(n, b, 256, 256, 3)).astype(np.float32)
    t_anno = np.stack([np.stack([
        np.array([0.3, 0.3, 0.4, 0.4], np.float32),
        np.array([0.28, 0.32, 0.35, 0.35], np.float32),
        np.array([0.25, 0.35, 0.3, 0.3], np.float32)])])
    # grounding sample: zeroed template image + anno
    template[:, 1] = 0.0
    t_anno[:, 1] = 0.0
    s_anno = rng.uniform(0.15, 0.35, size=(n, b, 4)).astype(np.float32)
    s_anno[..., 2:] = rng.uniform(0.2, 0.4, size=(n, b, 2))
    # Gaussian cls maps (any fixed map works for parity; both sides get it)
    yy, xx = np.mgrid[0:16, 0:16].astype(np.float32)
    ctrs = (s_anno[..., :2] + s_anno[..., 2:] / 2) * 16
    s_cls = np.exp(-(((xx - ctrs[..., 0, None, None]) ** 2)
                     + ((yy - ctrs[..., 1, None, None]) ** 2)) / 6.0
                   ).astype(np.float32)
    ids = rng.integers(100, 30000, size=(n, b, NT)).astype(np.int64)
    mask = np.ones((n, b, NT), np.float32)
    mask[..., 25:] = 0.0
    flag = np.array([[0], [1], [2]], np.int64)  # BBOX / grounding / NL+BBOX

    data = {
        "template_images": torch.tensor(template).permute(0, 1, 4, 2, 3),
        "search_images": torch.tensor(search).permute(0, 1, 4, 2, 3),
        "template_anno": torch.tensor(t_anno),
        "search_anno": torch.tensor(s_anno),
        "search_cls": torch.tensor(s_cls),
        "text": torch.tensor(ids),
        "text_mask": torch.tensor(mask),
        "flag": torch.tensor(flag),
    }
    with torch.no_grad():
        loss_t, status_t = actor(data)

    from uvltrack_tpu.train.actor import forward_and_loss

    batch = {
        "template_images": jnp.asarray(template),
        "search_images": jnp.asarray(search),
        "template_anno": jnp.asarray(t_anno),
        "search_anno": jnp.asarray(s_anno),
        "search_cls": jnp.asarray(s_cls),
        "text": jnp.asarray(ids, jnp.int32),
        "text_mask": jnp.asarray(mask, jnp.int32),
        "flag": jnp.asarray(flag[:, 0], jnp.int32),
    }
    cfg, model, variables = ctx["cfg"], ctx["model"], ctx["variables"]
    loss_j, (metrics_j, _) = jax.jit(
        lambda v, bt: forward_and_loss(model, v, bt, cfg, train=False))(
        variables, batch)

    for name, key in [("Loss/giou", "Loss/giou"), ("Loss/l1", "Loss/l1"),
                      ("Loss/cls", "Loss/cls"), ("Loss/aux", "Loss/aux"),
                      ("Loss/cont", "Loss/cont"), ("IoU", "IoU"),
                      ("Loss/total", "Loss/total")]:
        ref_v = float(status_t[name])
        jax_v = float(metrics_j[key])
        np.testing.assert_allclose(jax_v, ref_v, atol=5e-3, rtol=5e-3,
                                   err_msg=f"{name}: jax={jax_v} ref={ref_v}")


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "red", "box", "moving",
         "quickly", "a", "bright", "square", "on", "dark", "background"]


def _clip(n_frames=20, h=240, w=320, seed=3):
    """Synthetic clip: textured background + a bright square drifting right."""
    rng = np.random.default_rng(seed)
    base = (rng.uniform(40, 90, size=(h // 8, w // 8, 3))
            .repeat(8, 0).repeat(8, 1)).astype(np.uint8)
    frames = []
    boxes = []
    for i in range(n_frames):
        f = base.copy()
        x = 60 + 4 * i
        y = 90 + int(2 * np.sin(i / 3.0) * 4)
        f[y:y + 56, x:x + 56] = np.array([220, 60, 60], np.uint8)
        frames.append(f)
        boxes.append([x, y, 56, 56])
    return frames, boxes


def _write_vocab(td):
    path = os.path.join(td, "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    return path


def _make_ref_tracker(ctx, vocab_path, mode):
    from types import SimpleNamespace

    ref_cfg = ctx["ref_cfg"]
    ref_cfg.TEST.MODE = mode
    ref_cfg.TEST.UPDATE_INTERVAL = 10
    ref_cfg.TEST.THRESHOLD = 0.05
    ref_cfg.MODEL.BACKBONE.LANGUAGE.VOCAB_PATH = vocab_path
    params = SimpleNamespace(
        cfg=ref_cfg, checkpoint=ctx["ckpt_path"], debug=0,
        search_size=ref_cfg.TEST.SEARCH_SIZE,
        template_size=ref_cfg.TEST.TEMPLATE_SIZE,
        search_factor=ref_cfg.TEST.SEARCH_FACTOR,
        template_factor=ref_cfg.TEST.TEMPLATE_FACTOR,
        grounding_size=ref_cfg.TEST.SEARCH_SIZE,
    )
    from lib.test.tracker.uvltrack import UVLTrack as RefTracker

    return RefTracker(params, "synthetic")


def _make_jax_tracker(ctx, vocab_path, mode):
    from uvltrack_tpu.core.tokenizer import BertTokenizer
    from uvltrack_tpu.track.tracker import Tracker

    cfg = ctx["cfg"].clone() if hasattr(ctx["cfg"], "clone") else ctx["cfg"]
    cfg.TEST.MODE = mode
    cfg.TEST.UPDATE_INTERVAL = 10
    cfg.TEST.THRESHOLD = 0.05
    return Tracker(cfg, ctx["model"], ctx["variables"],
                   tokenizer=BertTokenizer(vocab_path))


@pytest.mark.parametrize("mode", ["BBOX", "NL", "NLBBOX"])
def test_tracker_sequence_parity(ctx, mode):
    """Per-frame boxes of the genuine reference tracker state machine vs the
    jitted device tracker over a 40-frame synthetic clip, long enough for >=3
    interval prompt re-minings (UPDATE_INTERVAL=10, THRESHOLD=0.05). NLBBOX —
    the shipped default mode (experiments/uvltrack/baseline_base.yaml:118) —
    runs live text + real template + txt-token prompt updates together."""
    vocab_path = _write_vocab(ctx["tmpdir"])
    frames, boxes = _clip(n_frames=40)
    info = {"init_bbox": boxes[0],
            "language": "the red box moving quickly"}

    ref_tracker = _make_ref_tracker(ctx, vocab_path, mode)
    jax_tracker = _make_jax_tracker(ctx, vocab_path, mode)

    ref_tracker.initialize(frames[0], dict(info))
    jax_init = jax_tracker.initialize(frames[0], dict(info))
    if mode == "NL":
        # grounding produced the init box on both sides: compare those too
        np.testing.assert_allclose(np.asarray(jax_init["target_bbox"]),
                                   np.asarray(ref_tracker.state),
                                   atol=1.5)

    ref_boxes, jax_boxes = [], []
    for f in frames[1:]:
        ref_boxes.append(ref_tracker.track(f)["target_bbox"])
        jax_boxes.append(jax_tracker.track(f)["target_bbox"])
    ref_boxes = np.asarray(ref_boxes, np.float64)
    jax_boxes = np.asarray(jax_boxes, np.float64)
    err = np.abs(ref_boxes - jax_boxes)
    assert err.max() < 2.0, (
        f"per-frame box divergence (max {err.max():.3f}px)\n"
        f"ref:\n{ref_boxes}\njax:\n{jax_boxes}")


def test_export_loads_into_reference_model(ctx):
    """export_uvltrack's state dict must load into the ACTUAL reference
    model: after round-tripping the reference weights through the flax trees
    and back, load_state_dict reports no unexpected keys and only known-dead
    missing keys, and the reloaded reference model equals the original
    weight-for-weight."""
    import copy

    from uvltrack_tpu.models.convert import export_uvltrack

    # deepcopy: load_state_dict would mutate the module-scoped fixture's
    # model, contaminating tolerance-based parity tests under reordering
    ref_model = copy.deepcopy(ctx["ref_model"])
    variables = ctx["variables"]
    exported = {k: torch.from_numpy(np.asarray(v).copy())
                for k, v in export_uvltrack(variables["params"],
                                            variables["batch_stats"]).items()}
    missing, unexpected = ref_model.load_state_dict(exported, strict=False)
    assert not [k for k in unexpected if not _is_dead_key(k)], unexpected
    assert not [k for k in missing if not _is_dead_key(k)], missing
    # weights identical to the originals the ctx started from
    orig = torch.load(ctx["ckpt_path"], map_location="cpu",
                      weights_only=False)["net"]
    for k, v in exported.items():
        if k in orig:
            np.testing.assert_allclose(v.numpy(), orig[k].numpy(),
                                       rtol=1e-6, atol=1e-7, err_msg=k)


@pytest.fixture(scope="module")
def ground_ctx(tmp_path_factory):
    """Second full-size build at the grounding-pretrain geometry: 384 search
    -> 576 search tokens, N=681 joint sequence
    (experiments/uvltrack/baseline_base_grounding.yaml:12)."""
    td = str(tmp_path_factory.mktemp("refparity_ground"))
    ref_cfg = _reference.build_reference_cfg(
        td, "baseline_base_grounding.yaml")
    ref_model = _reference.build_reference_model(ref_cfg, seed=1)
    ckpt_path = os.path.join(td, "UVLTrack_ep0060.pth.tar")
    torch.save({"net": ref_model.state_dict()}, ckpt_path)

    cfg = load_cfg(os.path.join(
        REPO, "experiments/uvltrack/baseline_base_grounding.yaml"))
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    tz, sx = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
    nz, nx = (tz // 16) ** 2, (sx // 16) ** 2
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, tz, tz, 3)), jnp.zeros((1, sx, sx, 3)),
                           jnp.zeros((1, NT), jnp.int32),
                           jnp.ones((1, NT), jnp.int32),
                           jnp.zeros((1, nz), bool), jnp.zeros((1, nx), bool),
                           jnp.zeros((1,), jnp.int32), train=False))
    zero_vars = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes)
    from uvltrack_tpu.models.convert import load_torch_file

    params, batch_stats, unused = convert_uvltrack(
        load_torch_file(ckpt_path), zero_vars["params"],
        zero_vars["batch_stats"])
    assert [k for k in unused if not _is_dead_key(k)] == []
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)}
    return dict(ref_model=ref_model, cfg=cfg, model=model,
                variables=variables, nz=nz, nx=nx)


def test_grounding_geometry_forward_parity(ground_ctx):
    """flag=1 grounding forward at the pretrain geometry (the tracker's NL
    init path, lib/test/tracker/uvltrack.py:45-62: zero template, empty
    masks, letterbox-sized search) vs the genuine reference model at N=681."""
    gc = ground_ctx
    b, nz, nx = 1, gc["nz"], gc["nx"]
    sx = gc["cfg"].DATA.SEARCH.SIZE
    rng = np.random.default_rng(21)
    template = np.zeros((b, 128, 128, 3), np.float32)
    search = rng.normal(size=(b, sx, sx, 3)).astype(np.float32)
    ids = rng.integers(100, 30000, size=(b, NT)).astype(np.int64)
    mask = np.ones((b, NT), np.float32)
    mask[:, 22:] = 0.0
    tmask = np.zeros((b, nz), bool)
    cmask = np.zeros((b, nx), bool)
    flag = np.ones((b,), np.int64)

    from lib.utils.misc import NestedTensor

    with torch.no_grad():
        out_t = gc["ref_model"].forward(
            torch.tensor(template).permute(0, 3, 1, 2),
            torch.tensor(search).permute(0, 3, 1, 2),
            NestedTensor(torch.tensor(ids), torch.tensor(mask)),
            torch.tensor(tmask), torch.tensor(cmask),
            torch.tensor(flag).reshape(-1, 1))

    model, variables = gc["model"], gc["variables"]
    out_j = jax.jit(lambda v, *a: model.apply(v, *a, train=False))(
        variables, jnp.asarray(template), jnp.asarray(search),
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(tmask), jnp.asarray(cmask), jnp.asarray(flag, jnp.int32))

    # the grounding consumer (pred_boxes drives the init box) plus the full
    # score/box maps
    np.testing.assert_allclose(np.asarray(out_j["pred_boxes"]).reshape(-1, 4),
                               out_t["pred_boxes"].reshape(-1, 4).numpy(),
                               atol=2e-3, rtol=1e-3)
    for key in ("bbox_map", "cls_score"):
        if key in out_t:
            np.testing.assert_allclose(
                np.asarray(out_j[key]).reshape(b, -1),
                out_t[key].reshape(b, -1).numpy(), atol=3e-3, rtol=2e-3,
                err_msg=key)
