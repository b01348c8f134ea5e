import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uvltrack_tpu.models.bert import BertConfig
from uvltrack_tpu.models.head import MABH, DistributionPrompter
from uvltrack_tpu.models.mufe import MUFE
from uvltrack_tpu.models.uvltrack import UVLTrack

# Tiny geometry: template 32 (2x2=4 tokens), search 64 (4x4=16 tokens), text 8
TINY = dict(
    embed_dim=32,
    depth=4,
    num_heads=4,
    template_size=32,
    search_size=64,
    fusion_layers=(2, 3),
    cont_loss_layers=(1, 2, 3),
    txt_token_mode="cls",
    bert=BertConfig(vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position=16),
)
NT = 8


def tiny_model():
    backbone = MUFE(**TINY)
    head = MABH(inplanes=32, channel=32, feat_sz=4, cls_tokenize=False,
                offset_sigmoid=True, joint_cls=False, softmax_one=True)
    return UVLTrack(backbone=backbone, head=head)


def tiny_inputs(b=2, seed=0, flag_val=2):
    rng = np.random.default_rng(seed)
    template = jnp.asarray(rng.normal(size=(b, 32, 32, 3)), jnp.float32)
    search = jnp.asarray(rng.normal(size=(b, 64, 64, 3)), jnp.float32)
    text_ids = jnp.asarray(rng.integers(0, 100, size=(b, NT)), jnp.int32)
    text_mask = jnp.ones((b, NT), jnp.int32)
    template_mask = jnp.asarray(rng.random((b, 4)) > 0.5)
    context_mask = jnp.asarray(rng.random((b, 16)) > 0.5)
    flag = jnp.full((b,), flag_val, jnp.int32)
    return template, search, text_ids, text_mask, template_mask, context_mask, flag


@pytest.fixture(scope="module")
def ctx():
    """Everything jitted once: the sandbox CPU is 1 core with ~100ms/op eager
    dispatch, so each apply path compiles exactly once here."""
    model = tiny_model()
    inp = tiny_inputs()
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(jax.random.PRNGKey(0))

    fwd = jax.jit(lambda v, *a: model.apply(v, *a, train=False))
    fwd_test = jax.jit(lambda v, t, s, ti, tm, p, f: model.apply(
        v, t, s, ti, tm, p, f, method=UVLTrack.forward_test))
    prompt_init = jax.jit(lambda v, *a: model.apply(
        v, *a, method=UVLTrack.forward_prompt_init))

    return dict(model=model, variables=variables, fwd=fwd, fwd_test=fwd_test,
                prompt_init=prompt_init, inp=inp)


def test_forward_shapes(ctx):
    out = ctx["fwd"](ctx["variables"], *ctx["inp"])
    b = 2
    assert out["search"].shape == (b, 16, 32)
    assert out["template"].shape == (b, 4, 32)
    assert out["text"].shape == (b, NT, 32)
    assert out["vis_token"].shape == (b, 1, 32)
    assert out["txt_token"].shape == (b, 1, 32)
    assert out["logits"].shape == (b, 3, 4, 4)  # 3 cont layers on a 4x4 map
    assert out["bbox_map"].shape == (b, 16, 4)
    assert out["pred_boxes"].shape == (b, 1, 4)
    assert out["cls_score"].shape == (b, 16)
    assert out["cont_score"].shape == (b, 16, 2)  # train path: 2 columns
    assert out["prompts"].shape == (b, 3, 32)


def test_forward_test_cont_columns(ctx):
    t, s, ti, tm, _, _, flag = ctx["inp"]
    prompt = jnp.zeros((2, 3, 32), jnp.float32)
    out = ctx["fwd_test"](ctx["variables"], t, s, ti, tm, prompt, flag)
    assert out["cont_score"].shape == (2, 16, 3)  # softmax_one test path: 3 cols
    assert np.allclose(np.asarray(out["cont_score"][..., 2]), 0.0)


def test_flag0_search_independent_of_text(ctx):
    """flag=0 (BBOX): text tokens are masked as keys, so search/vis features
    must not change when the text changes."""
    t, s, ti, tm, zm, cm, _ = ctx["inp"]
    flag = jnp.zeros((2,), jnp.int32)
    rng = np.random.default_rng(99)
    ti2 = jnp.asarray(rng.integers(0, 100, size=ti.shape), jnp.int32)
    o1 = ctx["fwd"](ctx["variables"], t, s, ti, tm, zm, cm, flag)
    o2 = ctx["fwd"](ctx["variables"], t, s, ti2, tm, zm, cm, flag)
    assert np.allclose(np.asarray(o1["search"]), np.asarray(o2["search"]), atol=1e-5)
    assert np.allclose(np.asarray(o1["vis_token"]), np.asarray(o2["vis_token"]), atol=1e-5)
    assert not np.allclose(np.asarray(o1["text"]), np.asarray(o2["text"]), atol=1e-3)


def test_flag1_search_independent_of_template(ctx):
    """flag=1 (NL/grounding): CLS+template masked as keys -> search features
    must not depend on template pixels."""
    t, s, ti, tm, zm, cm, _ = ctx["inp"]
    flag = jnp.ones((2,), jnp.int32)
    rng = np.random.default_rng(7)
    t2 = jnp.asarray(rng.normal(size=t.shape), jnp.float32)
    o1 = ctx["fwd"](ctx["variables"], t, s, ti, tm, zm, cm, flag)
    o2 = ctx["fwd"](ctx["variables"], t2, s, ti, tm, zm, cm, flag)
    assert np.allclose(np.asarray(o1["search"]), np.asarray(o2["search"]), atol=1e-5)
    assert np.allclose(np.asarray(o1["text"]), np.asarray(o2["text"]), atol=1e-5)


def test_flag2_uses_both(ctx):
    t, s, ti, tm, zm, cm, flag = ctx["inp"]
    rng = np.random.default_rng(7)
    t2 = jnp.asarray(rng.normal(size=t.shape), jnp.float32)
    ti2 = jnp.asarray(rng.integers(0, 100, size=ti.shape), jnp.int32)
    o1 = ctx["fwd"](ctx["variables"], t, s, ti, tm, zm, cm, flag)
    o2 = ctx["fwd"](ctx["variables"], t2, s, ti, tm, zm, cm, flag)
    o3 = ctx["fwd"](ctx["variables"], t, s, ti2, tm, zm, cm, flag)
    assert not np.allclose(np.asarray(o1["search"]), np.asarray(o2["search"]), atol=1e-4)
    assert not np.allclose(np.asarray(o1["search"]), np.asarray(o3["search"]), atol=1e-4)


def test_bbox_map_decode(ctx):
    out = ctx["fwd"](ctx["variables"], *ctx["inp"])
    bbox_map = np.asarray(out["bbox_map"])  # (b, s, 4) cxcywh
    assert (bbox_map[..., :2] >= 0).all() and (bbox_map[..., :2] <= 1.25).all()
    assert (bbox_map[..., 2:] >= 0).all() and (bbox_map[..., 2:] <= 1).all()
    # pred box equals bbox_map row at argmax(cls * softmax(cont)[...,0])
    cls = np.asarray(out["cls_score_test"])
    cont = np.asarray(out["cont_score"])
    cont0 = np.exp(cont - cont.max(-1, keepdims=True))
    cont0 = cont0 / cont0.sum(-1, keepdims=True)
    merged = cls * cont0[..., 0]
    for bidx in range(2):
        k = merged[bidx].argmax()
        assert np.allclose(np.asarray(out["pred_boxes"])[bidx, 0], bbox_map[bidx, k])


def test_prompt_init_and_grounding_switcher(ctx):
    t, s, ti, tm, zm, cm, flag = ctx["inp"]
    prompt = ctx["prompt_init"](ctx["variables"], t, s, ti, tm, zm, cm, flag)
    assert prompt.shape == (2, 3, 32)
    assert np.isfinite(np.asarray(prompt)).all()
    # grounding flag -> prompts are the bare query embeds (+cls on slot 0)
    flag1 = jnp.ones((2,), jnp.int32)
    p1 = ctx["prompt_init"](ctx["variables"], t, s, ti, tm, zm, cm, flag1)
    q = np.asarray(ctx["variables"]["params"]["head"]["prompter"]["query_embed"])
    assert np.allclose(np.asarray(p1)[:, 1], q[1], atol=1e-5)
    assert np.allclose(np.asarray(p1)[:, 2], q[2], atol=1e-5)


def test_divide_background_threshold():
    """Bottom-25% probability mass = pure background, rest = distractors."""
    prompter = DistributionPrompter(dim=8)
    scores = jnp.asarray(np.array([[[0.05, 0.05, 0.05, 0.05, 0.2, 0.6]]], np.float32))
    mask = jax.jit(prompter.divide_background)(scores)
    want = np.array([[[False, False, False, False, True, True]]])
    assert (np.asarray(mask) == want).all()


def test_gradients_flow():
    """Gradients are finite and non-zero through backbone+head (micro model:
    grad compile on this 1-core sandbox is ~100x slower than forward)."""
    micro = MUFE(embed_dim=16, depth=2, num_heads=2, template_size=32,
                 search_size=32, fusion_layers=(1,), cont_loss_layers=(1,),
                 txt_token_mode="cls",
                 bert=BertConfig(vocab_size=50, hidden_size=16, num_layers=1,
                                 num_heads=2, intermediate_size=32, max_position=16))
    head = MABH(inplanes=16, channel=16, feat_sz=2, cls_tokenize=False,
                softmax_one=True)
    model = UVLTrack(backbone=micro, head=head)
    rng = np.random.default_rng(0)
    inp = (
        jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
        jnp.asarray(rng.integers(0, 50, size=(2, 4)), jnp.int32),
        jnp.ones((2, 4), jnp.int32),
        jnp.asarray(rng.random((2, 4)) > 0.5),
        jnp.asarray(rng.random((2, 4)) > 0.5),
        jnp.full((2,), 2, jnp.int32),
    )
    variables = jax.jit(lambda r: model.init(r, *inp, train=False))(jax.random.PRNGKey(0))

    def loss_fn(params):
        out = model.apply({**variables, "params": params}, *inp, train=False)
        return (out["bbox_map"].astype(jnp.float32) ** 2).mean() + \
            (out["cont_score"].astype(jnp.float32) ** 2).mean()

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(np.abs(np.asarray(l)).sum()) for l in leaves)
    assert total > 0
