"""The cached-text inference path (TPU.CACHE_TEXT) computes the pre-fusion
BERT stream once per sequence (MUFE.encode_text) and must be numerically
identical to the per-frame forward_test (which re-runs the text encoder
every call, like the reference's lib/models/uvltrack/uvltrack.py forward).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvltrack_tpu.models.uvltrack import UVLTrack
from uvltrack_tpu.track.tracker import Tracker

from test_model import tiny_model, tiny_inputs
from test_tracker import tiny_cfg


@pytest.fixture(scope="module")
def ctx():
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(
        jax.random.PRNGKey(0))
    fwd_test = jax.jit(lambda v, t, s, ti, tm, p, f: model.apply(
        v, t, s, ti, tm, p, f, method=UVLTrack.forward_test))
    encode = jax.jit(lambda v, ti, tm: model.apply(
        v, ti, tm, method=UVLTrack.encode_text))
    fwd_cached = jax.jit(lambda v, t, s, tf, tm, p, f: model.apply(
        v, t, s, tf, tm, p, f, method=UVLTrack.forward_test_cached))
    return dict(model=model, variables=variables, fwd_test=fwd_test,
                encode=encode, fwd_cached=fwd_cached)


@pytest.mark.parametrize("flag_val", [0, 1, 2])
def test_forward_test_cached_matches(ctx, flag_val):
    template, search, text_ids, text_mask, *_ = tiny_inputs(flag_val=flag_val)
    # partial padding so the mask actually masks something
    text_mask = text_mask.at[:, -3:].set(0)
    b = template.shape[0]
    c = ctx["model"].backbone.embed_dim
    prompt = jnp.asarray(
        np.random.default_rng(7).normal(size=(b, 3, c)), jnp.float32)
    flag = jnp.full((b,), flag_val, jnp.int32)

    ref = ctx["fwd_test"](ctx["variables"], template, search, text_ids,
                          text_mask, prompt, flag)
    txt_feat = ctx["encode"](ctx["variables"], text_ids, text_mask)
    got = ctx["fwd_cached"](ctx["variables"], template, search, txt_feat,
                            text_mask, prompt, flag)

    # identical outputs except the per-layer contrastive `logits`, which only
    # the training aux loss consumes and the cached path deliberately omits
    assert set(ref.keys()) - set(got.keys()) == {"logits"}
    assert set(got.keys()) <= set(ref.keys())
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float32), np.asarray(ref[k], np.float32),
            rtol=2e-5, atol=2e-5, err_msg=k)


def _run_tracker(cache_text, mode):
    cfg = tiny_cfg()
    cfg.TPU.CACHE_TEXT = cache_text
    cfg.TEST.MODE = mode
    model = tiny_model()
    variables = jax.jit(lambda r: model.init(r, *tiny_inputs(), train=False))(
        jax.random.PRNGKey(0))
    trk = Tracker(cfg, model, variables, tokenizer=None)
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    info = {"init_bbox": [30.0, 20.0, 20.0, 24.0], "language": "a thing"}
    trk.initialize(frame, info)
    outs = []
    for _ in range(5):  # interval=2 in tiny_cfg -> re-mining fires twice
        f = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
        out = trk.track(f)
        outs.append(out["target_bbox"] + [out["score"]])
    return np.asarray(outs)


@pytest.mark.slow  # ~100s/mode: full tracker compile, covered at unit level above
@pytest.mark.parametrize("mode", ["BBOX", "NLBBOX"])
def test_tracker_boxes_match_uncached(mode):
    a = _run_tracker(True, mode)
    b = _run_tracker(False, mode)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
