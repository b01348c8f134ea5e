"""Stateful UVLTrack tracker with a fully device-resident per-frame step.

Capability parity with the reference tracker (lib/test/tracker/uvltrack.py):
BBOX / NL / NLBBOX reference modes, NL-only grounding init, prompt mining and
interval-based prompt re-mining from the best-scoring frame, Hann-window box
decode with contrastive weighting, map-back + margin clipping.

TPU-native design: tracker state is a pytree carried through a jitted step;
the per-frame host<->device traffic is one uint8 frame in, five floats out.
Crop/resize/normalize run inside the same XLA program as the model forward
(BASELINE.json north star). One compile per frame resolution.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box_ops import box_cxcywh_to_xywh, clip_box_xywh
from ..core.geometry import anno2mask, crop_box_normalized, map_box_back
from ..core.hann import hanning2d_flat
from ..models.uvltrack import UVLTrack
from .pipeline import grounding_letterbox, sample_target_device


class TrackerState(NamedTuple):
    box: jnp.ndarray          # (4,) xywh, image coords
    prompt: jnp.ndarray       # (1, 3, C)
    max_score: jnp.ndarray    # ()
    frame_id: jnp.ndarray     # () int32
    best_box_net: jnp.ndarray  # (4,) cxcywh normalized, best frame's net box
    best_search: jnp.ndarray   # (1, s, C) cached backbone features
    best_template: jnp.ndarray  # (1, z, C)
    best_vis_token: jnp.ndarray  # (1, 1, C)
    best_txt_token: jnp.ndarray  # (1, 1, C)


class JitTracker:
    """Builds and caches the jitted device functions for one model+config."""

    def __init__(self, model: UVLTrack, variables: dict, cfg):
        self.model = model
        from ..models.uvltrack import prepare_inference_variables

        # bf16 cast + optional weight-only int8 (cfg.TPU.WEIGHT_QUANT —
        # bs=1 tracking is weight-read bound; inference-only, training
        # keeps fp masters). Shared with BatchTracker so lockstep serving
        # runs the same weights.
        self.variables = prepare_inference_variables(cfg, variables)
        self.cfg = cfg
        self.search_size = int(cfg.TEST.SEARCH_SIZE)
        self.template_size = int(cfg.TEST.TEMPLATE_SIZE)
        self.search_factor = float(cfg.TEST.SEARCH_FACTOR)
        self.template_factor = float(cfg.TEST.TEMPLATE_FACTOR)
        self.grounding_size = self.search_size
        self.map_size = self.search_size // 16
        self.update_interval = int(cfg.TEST.UPDATE_INTERVAL)
        self.threshold = float(cfg.TEST.THRESHOLD)
        self.has_cont = float(cfg.TRAIN.CONT_WEIGHT) > 0
        self.window = hanning2d_flat(self.map_size)
        # compute the pre-fusion BERT text stream once per sequence instead
        # of every frame (identical math; ~85 MB bf16 weight reads/frame
        # saved at bs=1 ViT-B — MUFE.encode_text)
        self.cache_text = bool(getattr(cfg.TPU, "CACHE_TEXT", True))
        self._text_fn = None
        self._step_cache = {}
        self._scan_cache = {}
        self._init_cache = {}
        self._ground_cache = {}
        self._debug_cache = {}

    def text_fn(self):
        if self._text_fn is None:
            self._text_fn = jax.jit(functools.partial(
                self.model.apply, method=UVLTrack.encode_text))
        return self._text_fn

    # NOTE: all jitted functions take `variables` as an explicit argument —
    # closing over the param tree bakes it into the HLO as constants and
    # makes TPU compiles ~20x slower (measured on this runtime).

    # ------------------------------------------------------------- grounding
    def grounding_fn(self, hw):
        if hw not in self._ground_cache:
            gs = self.grounding_size

            @jax.jit
            def fn(variables, frame, text_ids, text_mask):
                ground = grounding_letterbox(frame.astype(jnp.float32), gs)
                template = jnp.zeros((1, self.template_size, self.template_size, 3),
                                     jnp.float32)
                tmask = jnp.zeros((1, (self.template_size // 16) ** 2), bool)
                cmask = jnp.zeros((1, (self.search_size // 16) ** 2), bool)
                flag = jnp.ones((1,), jnp.int32)
                out = self.model.apply(variables, template, ground, text_ids,
                                       text_mask, tmask, cmask, flag, train=False)
                return out["pred_boxes"][0, 0]  # (4,) cxcywh normalized

            self._ground_cache[hw] = fn
        return self._ground_cache[hw]

    # ------------------------------------------------------------------ init
    def init_fn(self, hw):
        if hw not in self._init_cache:

            @jax.jit
            def fn(variables, frame, box, text_ids, text_mask, flag):
                template, _ = sample_target_device(
                    frame, box, self.template_factor, self.template_size)
                tbox = crop_box_normalized(box, self.template_factor)[None]
                template_mask = anno2mask(tbox, self.template_size // 16)
                context, _ = sample_target_device(
                    frame, box, self.search_factor, self.search_size)
                cbox = crop_box_normalized(box, self.search_factor)[None]
                context_mask = anno2mask(cbox, self.search_size // 16)
                prompt = self.model.apply(
                    variables, template, context, text_ids, text_mask,
                    template_mask, context_mask, flag,
                    method=UVLTrack.forward_prompt_init)
                return template, template_mask, prompt

            self._init_cache[hw] = fn
        return self._init_cache[hw]

    # ------------------------------------------------------------------ step
    def _step_core(self, hw, debug: bool = False):
        """Pure per-frame step: (variables, state, frame, consts...) ->
        (new_state, packed[x,y,w,h,score]). Shared by the single-frame jit
        and the lax.scan chunk path. With debug=True additionally returns the
        stacked (3, fsz*fsz) [cls, cont, merged] response maps — the maps the
        reference's debug hook dumps (lib/test/tracker/uvltrack.py:155-157)."""
        h, w = hw
        sz = self.search_size
        fsz = self.map_size
        window = self.window
        interval = self.update_interval
        do_update = self.has_cont and interval > 0

        # `txt` is the cached pre-fusion text features when cache_text (the
        # default), else the raw text_ids
        test_method = (UVLTrack.forward_test_cached if self.cache_text
                       else UVLTrack.forward_test)

        def fn(variables, state: TrackerState, frame, template, template_mask,
               txt, text_mask, flag):
                search, resize_factor = sample_target_device(
                    frame, state.box, self.search_factor, sz)
                out = self.model.apply(variables, template, search, txt,
                                       text_mask, state.prompt, flag,
                                       method=test_method)
                cls = out["cls_score_test"].reshape(-1).astype(jnp.float32)
                if self.has_cont:
                    cont = jax.nn.softmax(
                        out["cont_score"].astype(jnp.float32), axis=-1)[0, :, 0]
                else:
                    cont = jnp.ones_like(cls)
                merged = cls * window * cont
                k = jnp.argmax(merged)
                box_net = out["bbox_map"][0, k]  # cxcywh normalized
                score = (cls * cont)[k]

                pred_crop = box_net * sz / resize_factor
                new_box = map_box_back(pred_crop, state.box, resize_factor, sz)
                new_box = clip_box_xywh(new_box, h, w, margin=10)

                frame_id = state.frame_id + 1
                is_best = score > state.max_score
                pick = lambda a, b: jnp.where(is_best, a, b)
                f32 = lambda a: a.astype(jnp.float32)
                best_box_net = pick(f32(box_net), state.best_box_net)
                best_search = jnp.where(is_best, f32(out["search"]), state.best_search)
                best_template = jnp.where(is_best, f32(out["template"]), state.best_template)
                best_vis = jnp.where(is_best, f32(out["vis_token"]), state.best_vis_token)
                best_txt = jnp.where(is_best, f32(out["txt_token"]), state.best_txt_token)
                max_score = pick(score, state.max_score)

                if do_update:
                    refresh = (jnp.mod(frame_id, interval) == 0) & (max_score > self.threshold)

                    def remine(_):
                        ctx_box = box_cxcywh_to_xywh(best_box_net[None])
                        ctx_mask = anno2mask(ctx_box, fsz)
                        feats = {
                            "search": best_search,
                            "template": best_template,
                            "vis_token": best_vis,
                            "txt_token": best_txt,
                            "flag": flag,
                        }
                        new_prompt = self.model.apply(
                            variables, feats, template_mask, ctx_mask,
                            method=UVLTrack.forward_prompt)
                        return new_prompt, jnp.asarray(0.0, max_score.dtype)

                    prompt, max_score = jax.lax.cond(
                        refresh, remine,
                        lambda _: (state.prompt, max_score), operand=None)
                else:
                    prompt = state.prompt

                new_state = TrackerState(
                    box=new_box, prompt=prompt, max_score=max_score,
                    frame_id=frame_id, best_box_net=best_box_net,
                    best_search=best_search, best_template=best_template,
                    best_vis_token=best_vis, best_txt_token=best_txt)
                # box and score packed into one array: exactly one device->host
                # transfer per tracked frame
                packed = jnp.concatenate([new_box, score[None]])
                if debug:
                    return new_state, packed, jnp.stack([cls, cont, merged])
                return new_state, packed

        return fn

    def step_fn(self, hw):
        if hw not in self._step_cache:
            self._step_cache[hw] = jax.jit(self._step_core(hw))
        return self._step_cache[hw]

    def step_fn_debug(self, hw):
        if hw not in self._debug_cache:
            self._debug_cache[hw] = jax.jit(self._step_core(hw, debug=True))
        return self._debug_cache[hw]

    def scan_fn(self, hw, chunk: int):
        """One dispatch tracks `chunk` frames: lax.scan of the step over a
        (chunk, H, W, 3) frame stack, state threaded on device. Amortizes the
        per-dispatch host overhead — the TPU-native high-throughput path."""
        key = (hw, chunk)
        if key not in self._scan_cache:
            core = self._step_core(hw)

            @jax.jit
            def fn(variables, state, frames, template, template_mask,
                   txt, text_mask, flag):
                def body(st, frame):
                    new_st, packed = core(variables, st, frame, template,
                                          template_mask, txt, text_mask, flag)
                    return new_st, packed

                state, packs = jax.lax.scan(body, state, frames)
                return state, packs  # (chunk, 5)

            self._scan_cache[key] = fn
        return self._scan_cache[key]


class Tracker:
    """Reference-compatible API: initialize(image, info) / track(image)."""

    def __init__(self, cfg, model: UVLTrack, variables: dict,
                 tokenizer=None, jit_tracker: Optional[JitTracker] = None):
        self.cfg = cfg
        # many concurrent streams (e.g. cli/serve.py) share ONE JitTracker:
        # per-stream state lives on this Tracker, the compiled step + weights
        # live on the shared jt — a new stream costs state init, not a
        # retrace/recompile
        self.jt = (jit_tracker if jit_tracker is not None
                   else JitTracker(model, variables, cfg))
        self.tokenizer = tokenizer
        self.nt = int(cfg.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN)
        self.embed_dim = model.backbone.embed_dim
        self.state = None

    def _tokenize(self, language: Optional[str]):
        if language is None or self.tokenizer is None:
            ids = np.zeros((1, self.nt), np.int32)
            mask = np.zeros((1, self.nt), np.int32)
        else:
            i, m = self.tokenizer.encode_query(language, self.nt)
            ids = np.asarray(i, np.int32)[None]
            mask = np.asarray(m, np.int32)[None]
        return jnp.asarray(ids), jnp.asarray(mask)

    def _grounding(self, image: np.ndarray, language: str):
        hw = image.shape[:2]
        fn = self.jt.grounding_fn(hw)
        pred = np.asarray(fn(self.jt.variables, jnp.asarray(image),
                             self.text_ids, self.text_mask))
        scale = max(image.shape[:2])
        cx, cy, w, h = pred * scale
        x, y = cx - w / 2, cy - h / 2
        ih, iw = image.shape[:2]
        x += min(0.0, (iw - ih) / 2)
        y += min(0.0, (ih - iw) / 2)
        return [float(x), float(y), float(w), float(h)]

    def initialize(self, image: np.ndarray, info: dict):
        mode = self.cfg.TEST.MODE
        language = info.get("language")
        if mode == "NL":
            self.text_ids, self.text_mask = self._tokenize(language)
            init_bbox = self._grounding(image, language)
            flag_val = 2
        elif mode == "NLBBOX":
            self.text_ids, self.text_mask = self._tokenize(language)
            init_bbox = list(info["init_bbox"])
            flag_val = 2
        else:  # BBOX
            self.text_ids, self.text_mask = self._tokenize(None)
            init_bbox = list(info["init_bbox"])
            flag_val = 0
        self.flag = jnp.full((1,), flag_val, jnp.int32)

        hw = image.shape[:2]
        frame = jnp.asarray(image)
        box = jnp.asarray(np.asarray(init_bbox, np.float32))
        template, template_mask, prompt = self.jt.init_fn(hw)(
            self.jt.variables, frame, box, self.text_ids, self.text_mask, self.flag)
        self.template = template
        self.template_mask = template_mask
        # per-sequence constant consumed by the step: cached pre-fusion text
        # features (default) or the raw ids (TPU.CACHE_TEXT=False debug path)
        if self.jt.cache_text:
            self.txt = self.jt.text_fn()(
                self.jt.variables, self.text_ids, self.text_mask)
        else:
            self.txt = self.text_ids

        s = (self.jt.search_size // 16) ** 2
        z = (self.jt.template_size // 16) ** 2
        c = self.embed_dim
        self.state = TrackerState(
            box=box,
            prompt=prompt,
            max_score=jnp.asarray(0.0, jnp.float32),
            frame_id=jnp.asarray(0, jnp.int32),
            best_box_net=jnp.zeros((4,), jnp.float32),
            best_search=jnp.zeros((1, s, c), jnp.float32),
            best_template=jnp.zeros((1, z, c), jnp.float32),
            best_vis_token=jnp.zeros((1, 1, c), jnp.float32),
            best_txt_token=jnp.zeros((1, 1, c), jnp.float32),
        )
        return {"target_bbox": init_bbox}

    def track(self, image: np.ndarray, info: dict = None):
        packed = np.asarray(self.track_async(image), np.float64)
        return {"target_bbox": packed[:4].tolist(), "score": float(packed[4])}

    def track_debug(self, image: np.ndarray, info: dict = None):
        """track() plus the per-frame response maps the reference's debug
        hook dumps (vis_info['cls_map'], lib/test/tracker/uvltrack.py:
        155-157): raw cls, contrastive, and hann-windowed merged, each
        (fsz, fsz). Adds a ~7 KB D2H per frame — the debug surface, not the
        benchmark path; box/score math is shared with track() bit for bit."""
        hw = image.shape[:2]
        step = self.jt.step_fn_debug(hw)
        self.state, packed, maps = step(
            self.jt.variables, self.state, jnp.asarray(image), self.template,
            self.template_mask, self.txt, self.text_mask, self.flag)
        fsz = self.jt.map_size
        maps = np.asarray(maps, np.float32).reshape(3, fsz, fsz)
        packed = np.asarray(packed, np.float64)
        return {"target_bbox": packed[:4].tolist(), "score": float(packed[4]),
                "cls_map": maps[0], "cont_map": maps[1],
                "merged_map": maps[2]}

    def track_async(self, image):
        """Advance the tracker one frame; return the packed (box, score) device
        array WITHOUT blocking. The sequential tracking dependency lives in
        device-resident state, so a consumer may read results with any lag —
        enqueueing the next frame never waits on host readback.
        """
        hw = image.shape[:2]
        step = self.jt.step_fn(hw)
        self.state, packed = step(
            self.jt.variables, self.state, jnp.asarray(image), self.template,
            self.template_mask, self.txt, self.text_mask, self.flag)
        return packed

    def step_cost(self, image_shape) -> dict:
        """XLA cost analysis of the compiled per-frame step for frames of
        `image_shape` — {"flops", "bytes"} per frame. Call after
        initialize(); used by bench.py for the MFU line."""
        from ..utils.costs import compiled_cost

        hw = tuple(image_shape[:2])
        frame = jnp.zeros(tuple(image_shape), jnp.uint8)
        return compiled_cost(
            self.jt.step_fn(hw), self.jt.variables, self.state, frame,
            self.template, self.template_mask, self.txt, self.text_mask,
            self.flag)

    def track_many(self, images, chunk: int = 32) -> np.ndarray:
        """Track a sequence of frames at full device throughput: frames are
        processed in `chunk`-sized lax.scan dispatches (state threaded on
        device), results transferred once at the end. Returns (N, 5)
        [x, y, w, h, score] in frame order."""
        n = len(images)
        outs = []
        i = 0
        while i < n:
            k = min(chunk, n - i)
            hw = images[i].shape[:2]
            # longest same-resolution PREFIX — a filter would skip a
            # mid-chunk mismatch and re-track frames after it, misaligning
            # every later box against its frame
            group = []
            for im in images[i:i + k]:
                if im.shape[:2] != hw:
                    break
                group.append(im)
            k = len(group)
            if k == chunk:
                frames = jnp.stack([jnp.asarray(im) for im in group])
                fn = self.jt.scan_fn(hw, chunk)
                self.state, packs = fn(
                    self.jt.variables, self.state, frames, self.template,
                    self.template_mask, self.txt, self.text_mask, self.flag)
                outs.append(packs)
            else:  # remainder (or resolution change): single steps
                outs.append(jnp.stack([self.track_async(im) for im in group]))
            i += k
        return np.asarray(jnp.concatenate(outs, axis=0), np.float64)
