"""UVLTrack model: MUFE backbone + MABH head, with the four entry points the
runtime needs (train forward / prompt init / prompt re-mining / test forward).

Capability parity with lib/models/uvltrack/uvltrack.py:8-57. Pure flax module;
call the entry points via `model.apply(variables, ..., method=...)`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import registry
from .bert import bert_config_from_type
from .head import MABH
from .mufe import MUFE
from .vit import VIT_VARIANTS, vit_variant_from_path


class UVLTrack(nn.Module):
    backbone: MUFE
    head: MABH

    def __call__(self, template, search, text_ids, text_mask, template_mask,
                 context_mask, flag, train: bool = False):
        out = self.backbone(template, search, text_ids, text_mask, flag,
                            train=train)
        out["template_mask"] = template_mask
        out["context_mask"] = context_mask
        return self.head(out, prompt=None, train=train)

    def forward_prompt_init(self, template, search, text_ids, text_mask,
                            template_mask, context_mask, flag):
        out = self.backbone(template, search, text_ids, text_mask, flag)
        out["template_mask"] = template_mask
        out["context_mask"] = context_mask
        return self.head.forward_prompt(out)

    def forward_prompt(self, out_dict, template_mask, context_mask):
        out = dict(out_dict)
        out["template_mask"] = template_mask
        out["context_mask"] = context_mask
        return self.head.forward_prompt(out)

    def forward_test(self, template, search, text_ids, text_mask, prompt, flag):
        out = self.backbone(template, search, text_ids, text_mask, flag)
        return self.head(out, prompt=prompt, train=False)

    def encode_text(self, text_ids, text_mask):
        """Pre-fusion text features — constant per tracking sequence; the
        tracker computes this once at initialize (see MUFE.encode_text)."""
        return self.backbone.encode_text(text_ids, text_mask)

    def forward_test_cached(self, template, search, txt_feat, text_mask,
                            prompt, flag):
        """forward_test with the pre-fusion text stream precomputed: the
        per-frame step skips the BERT layers entirely (same math — locked
        by tests/test_cached_text.py)."""
        out = self.backbone.forward_cached_text(template, search, txt_feat,
                                                text_mask, flag)
        return self.head(out, prompt=prompt, train=False)


def parse_dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


def cast_inference_variables(variables: dict, dtype=jnp.bfloat16) -> dict:
    """Cast matrix/tensor parameters to the compute dtype for inference.

    At bs=1 the forward is HBM-bandwidth bound on weight reads; storing the
    kernels in bf16 halves the bytes. Scalars and 1-D vectors (logit scales,
    LayerNorm/bias terms) stay fp32 — they are byte-trivial and the
    numerically sensitive ones.
    """
    def cast(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and x.dtype == jnp.float32:
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, variables)


def prepare_inference_variables(cfg, variables: dict) -> dict:
    """THE inference variable prep, shared by every tracker entry point
    (JitTracker and BatchTracker): bf16 cast per cfg.TPU.COMPUTE_DTYPE,
    then weight-only int8 per cfg.TPU.WEIGHT_QUANT (ops/quant.py) — so
    single-stream, lockstep-pool and multichip serving all run the same
    weights."""
    if str(cfg.TPU.COMPUTE_DTYPE) == "bfloat16":
        variables = cast_inference_variables(variables)
    wq = str(getattr(cfg.TPU, "WEIGHT_QUANT", "") or "")
    if wq:
        if wq != "int8":
            raise ValueError(f"TPU.WEIGHT_QUANT={wq!r}: only 'int8'")
        from ..ops.quant import count_quantized, quantize_vit_params

        params_q = quantize_vit_params(variables["params"])
        if count_quantized(params_q):
            variables = dict(variables, params=params_q)
    return variables


def _cpu_cache_key() -> str:
    """Fingerprint of the host CPU (arch + feature flags). CPU AOT cache
    entries are microarchitecture-specific: XLA's cpu_aot_loader warns of
    SIGILL risk when loading entries compiled on a feature-mismatched host
    (seen in MULTICHIP_r04 when output/xla_cache travelled between
    machines). Partitioning the CPU cache by this key trades a cold start
    off-host for never loading a mismatched AOT result."""
    import hashlib
    import platform as _platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha1(
        (_platform.machine() + ":" + feats).encode()).hexdigest()[:10]
    return f"cpu-{h}"


def configure_compile_cache(cfg) -> None:
    """Enable jax's persistent compilation cache when cfg.TPU.COMPILE_CACHE
    names a directory — a production nicety: tracker/train start-up skips
    the 20-40s first compile on every process restart. On the CPU backend
    the directory is partitioned per host CPU (see _cpu_cache_key); TPU
    entries are host-independent and stay shared."""
    path = str(getattr(cfg.TPU, "COMPILE_CACHE", "") or "")
    if path:
        import os

        import jax

        if jax.default_backend() == "cpu":
            path = os.path.join(path, _cpu_cache_key())
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def configure_attention(cfg) -> None:
    """Select the attention backend from cfg.TPU.USE_PALLAS_ATTENTION.

    The qkv-layout-native Pallas kernel beats XLA end-to-end on TPU
    (TPU_DESIGN.md "Attention": ~842 vs ~767 median tracked FPS for
    UVLTrack-B); off-TPU (and for <128-token sequences) the backend falls
    back to XLA internally, so enabling it is safe everywhere."""
    from ..ops import attention

    want = bool(cfg.TPU.USE_PALLAS_ATTENTION)
    attention.set_backend("pallas" if want else "xla")


@registry.MODELS.register("uvltrack")
def build_model(cfg, dtype=None) -> UVLTrack:
    configure_attention(cfg)
    configure_compile_cache(cfg)
    variant = VIT_VARIANTS[vit_variant_from_path(cfg.MODEL.BACKBONE.PRETRAINED_PATH)]
    dtype = dtype if dtype is not None else parse_dtype(cfg.TPU.COMPUTE_DTYPE)
    backbone = MUFE(
        embed_dim=variant["embed_dim"],
        depth=variant["depth"],
        num_heads=variant["num_heads"],
        template_size=cfg.DATA.TEMPLATE.SIZE,
        search_size=cfg.DATA.SEARCH.SIZE,
        fusion_layers=tuple(cfg.MODEL.BACKBONE.FUSION_LAYER),
        cont_loss_layers=tuple(cfg.MODEL.BACKBONE.CONT_LOSS_LAYER),
        txt_token_mode=cfg.MODEL.BACKBONE.TXT_TOKEN_MODE,
        learnable_pos=cfg.MODEL.LEARNABLE_POSITION,
        bert=bert_config_from_type(cfg.MODEL.BACKBONE.LANGUAGE.TYPE),
        dtype=dtype,
        remat=cfg.TPU.REMAT,
        drop_path_rate=float(cfg.MODEL.BACKBONE.DROP_PATH_RATE),
    )
    head = MABH(
        inplanes=cfg.MODEL.HIDDEN_DIM,
        channel=cfg.MODEL.HEAD.HEAD_DIM,
        feat_sz=cfg.DATA.SEARCH.SIZE // 16,
        stride=16,
        cls_tokenize=cfg.MODEL.HEAD.CLS_TOKENIZE,
        offset_sigmoid=cfg.MODEL.HEAD.OFFSET_SIGMOID,
        joint_cls=cfg.MODEL.HEAD.JOINT_CLS,
        softmax_one=cfg.MODEL.HEAD.SOFTMAX_ONE,
        dtype=dtype,
    )
    return UVLTrack(backbone=backbone, head=head)


def init_model(model: UVLTrack, cfg, rng) -> dict:
    """Initialize variables with dummy inputs at the configured sizes."""
    tz, sx = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
    nt = cfg.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN
    b = 2
    template = jnp.zeros((b, tz, tz, 3), jnp.float32)
    search = jnp.zeros((b, sx, sx, 3), jnp.float32)
    text_ids = jnp.zeros((b, nt), jnp.int32)
    text_mask = jnp.ones((b, nt), jnp.int32)
    template_mask = jnp.zeros((b, (tz // 16) ** 2), bool)
    context_mask = jnp.zeros((b, (sx // 16) ** 2), bool)
    flag = jnp.zeros((b,), jnp.int32)
    init = jax.jit(lambda r: model.init(r, template, search, text_ids, text_mask,
                                        template_mask, context_mask, flag,
                                        train=False))
    return init(rng)


def forward_test_fn(model: UVLTrack):
    """The deployable per-frame inference program, shared by the driver
    compile check (__graft_entry__.entry) and the StableHLO export
    (cli/export.py) so both always trace the SAME function.

    The param tree is an explicit argument (never a closure: constant-
    folded weights make TPU compiles ~20x slower and would bake ~700MB
    into the HLO)."""
    def fn(variables, template, search, text_ids, text_mask, prompt, flag):
        out = model.apply(variables, template, search, text_ids, text_mask,
                          prompt, flag, method=UVLTrack.forward_test)
        return out["bbox_map"], out["cls_score_test"], out["cont_score"]
    return fn


def example_test_inputs(cfg, model: UVLTrack, batch: int = 1, seed: int = 0):
    """Concrete example arguments (minus `variables`) for forward_test_fn:
    random images at the configured template/search sizes, in-vocab text
    ids with a full mask, a (B, 3, C) prompt, flag=2 (NL+BBOX)."""
    import numpy as np

    tz, sx = int(cfg.DATA.TEMPLATE.SIZE), int(cfg.DATA.SEARCH.SIZE)
    nt = int(cfg.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN)
    c = model.backbone.embed_dim
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(batch, tz, tz, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(batch, sx, sx, 3)), jnp.float32),
        jnp.asarray(rng.integers(0, model.backbone.bert.vocab_size,
                                 size=(batch, nt)), jnp.int32),
        jnp.ones((batch, nt), jnp.int32),
        jnp.asarray(rng.normal(size=(batch, 3, c)), jnp.float32),
        jnp.full((batch,), 2, jnp.int32),
    )
