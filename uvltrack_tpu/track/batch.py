"""Batched multi-stream tracking: N sequences advance in lockstep on one chip.

Replaces the reference's eval-time process pool over GPUs
(lib/test/evaluation/running.py:93-102) with the TPU-native equivalent
(SURVEY.md §2.10): the per-frame step is vmapped over a stream axis, so one
jitted call advances every stream — the MXU sees batch-N matmuls instead of
N sequential batch-1 calls (BASELINE.json config 5).

All streams share frame resolution per call (pad/bucket upstream if mixed).
Streams can be individually active/inactive (finished sequences keep their
state frozen), so ragged sequence lengths batch cleanly.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.box_ops import box_cxcywh_to_xywh, clip_box_xywh
from ..core.geometry import anno2mask, crop_box_normalized, map_box_back
from ..core.hann import hanning2d_flat
from ..models.uvltrack import UVLTrack
from .pipeline import sample_target_device


class BatchState(NamedTuple):
    box: jnp.ndarray          # (S, 4)
    prompt: jnp.ndarray       # (S, 3, C)
    max_score: jnp.ndarray    # (S,)
    frame_id: jnp.ndarray     # (S,)
    active: jnp.ndarray       # (S,) bool
    best_box_net: jnp.ndarray  # (S, 4)
    best_search: jnp.ndarray   # (S, s, C)
    best_template: jnp.ndarray  # (S, z, C)
    best_vis_token: jnp.ndarray  # (S, 1, C)
    best_txt_token: jnp.ndarray  # (S, 1, C)


class BatchTracker:
    """Tracks S streams in lockstep. Streams are initialized together from
    their first frames, then advanced with step(frames (S,H,W,3))."""

    def __init__(self, cfg, model: UVLTrack, variables: dict, num_streams: int,
                 tokenizer=None, mesh=None):
        """mesh: optional jax.sharding.Mesh — streams shard over its "data"
        axis (any num_streams: non-divisible counts are padded up to the
        next multiple with replayed streams), replacing the reference's
        one-process-per-GPU eval pool with SPMD inference over all chips:
        weights replicated, every per-stream array (frames, state, prompts)
        split on the stream axis, collectives-free (pure data parallel)."""
        self.cfg = cfg
        self.model = model
        from ..models.uvltrack import prepare_inference_variables

        # bf16 cast + optional weight-only int8, identical to the
        # single-stream JitTracker (one prep, ops/quant.py applies to the
        # pool/multichip paths too)
        variables = prepare_inference_variables(cfg, variables)
        self.mesh = mesh
        self.S = num_streams       # caller-visible stream count
        self.S_pad = num_streams   # internal (device) count
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # arbitrary group sizes (run_dataset_batched buckets sequences
            # by resolution, so remainder groups are any size) are padded up
            # to the next multiple of the data axis; the pad streams replay
            # the last real stream and their outputs are sliced off
            n_data = int(mesh.shape["data"])
            self.S_pad = -(-num_streams // n_data) * n_data
            self._repl = NamedSharding(mesh, P())
            self._stream = lambda ndim: NamedSharding(
                mesh, P(*(["data"] + [None] * (ndim - 1))))
            variables = jax.device_put(variables, self._repl)
        self.variables = variables
        self.tokenizer = tokenizer
        self.nt = int(cfg.MODEL.BACKBONE.LANGUAGE.BERT.MAX_QUERY_LEN)
        self.embed_dim = model.backbone.embed_dim
        self.search_size = int(cfg.TEST.SEARCH_SIZE)
        self.template_size = int(cfg.TEST.TEMPLATE_SIZE)
        self.search_factor = float(cfg.TEST.SEARCH_FACTOR)
        self.template_factor = float(cfg.TEST.TEMPLATE_FACTOR)
        self.map_size = self.search_size // 16
        self.update_interval = int(cfg.TEST.UPDATE_INTERVAL)
        self.threshold = float(cfg.TEST.THRESHOLD)
        self.has_cont = float(cfg.TRAIN.CONT_WEIGHT) > 0
        self.window = hanning2d_flat(self.map_size)
        # pre-fusion text features computed once per sequence (Tracker's
        # TPU.CACHE_TEXT; see MUFE.encode_text)
        self.cache_text = bool(getattr(cfg.TPU, "CACHE_TEXT", True))
        self._text_fn = None
        self._step_cache = {}
        self._init_cache = {}
        self._ground_cache = {}
        self._raw_fn_cache = {}
        self._many_cache = {}

    def text_fn(self):
        if self._text_fn is None:
            import functools

            self._text_fn = jax.jit(functools.partial(
                self.model.apply, method=UVLTrack.encode_text))
        return self._text_fn

    # ------------------------------------------------------------- grounding
    def _grounding_fn(self, hw):
        """Vmapped NL-mode grounding init (Tracker.grounding_fn per stream):
        letterbox frame 0, zero template, flag=1 forward -> (S, 4) cxcywh
        normalized in letterbox coordinates."""
        if hw not in self._ground_cache:
            from .pipeline import grounding_letterbox

            gs = self.search_size
            tz = self.template_size

            def one(variables, frame, text_ids, text_mask):
                ground = grounding_letterbox(frame.astype(jnp.float32), gs)
                template = jnp.zeros((1, tz, tz, 3), jnp.float32)
                tmask = jnp.zeros((1, (tz // 16) ** 2), bool)
                cmask = jnp.zeros((1, (gs // 16) ** 2), bool)
                flag = jnp.ones((1,), jnp.int32)
                out = self.model.apply(variables, template, ground,
                                       text_ids[None], text_mask[None],
                                       tmask, cmask, flag, train=False)
                return out["pred_boxes"][0, 0]

            self._ground_cache[hw] = jax.jit(
                jax.vmap(one, in_axes=(None, 0, 0, 0)))
        return self._ground_cache[hw]

    # ------------------------------------------------------------------ init
    def _init_fn(self, hw):
        if hw not in self._init_cache:
            tf, sf = self.template_factor, self.search_factor
            tz, sx = self.template_size, self.search_size

            def one(variables, frame, box, text_ids, text_mask, flag):
                template, _ = sample_target_device(frame, box, tf, tz)
                tbox = crop_box_normalized(box, tf)[None]
                template_mask = anno2mask(tbox, tz // 16)
                context, _ = sample_target_device(frame, box, sf, sx)
                cbox = crop_box_normalized(box, sf)[None]
                context_mask = anno2mask(cbox, sx // 16)
                prompt = self.model.apply(
                    variables, template, context, text_ids[None], text_mask[None],
                    template_mask, context_mask, flag[None],
                    method=UVLTrack.forward_prompt_init)
                return template[0], template_mask[0], prompt[0]

            self._init_cache[hw] = jax.jit(
                jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0)))
        return self._init_cache[hw]

    def initialize(self, frames: List[np.ndarray], boxes: np.ndarray,
                   languages: Optional[List[Optional[str]]] = None,
                   modes: Optional[List[str]] = None):
        """frames: S first frames (same resolution); boxes: (S,4) xywh.

        NL-mode streams derive their initial box from the grounding forward
        (Tracker._grounding per stream, vmapped) — a supplied box is IGNORED
        for those streams, so passing ground_truth_rect[0] as a placeholder
        cannot leak GT into the grounding protocol."""
        assert len(frames) == self.S
        languages = list(languages) if languages else [None] * self.S
        # copy: NL streams overwrite rows below, and np.asarray would alias
        # a caller's float32 array (mutating the runner's boxes0)
        boxes = np.array(boxes, np.float32)
        if self.S_pad != self.S:  # mesh padding: replay the last real stream
            pad = self.S_pad - self.S
            frames = list(frames) + [frames[-1]] * pad
            boxes = np.concatenate([boxes, np.repeat(boxes[-1:], pad, 0)])
            languages += [languages[-1]] * pad
            if modes:
                modes = list(modes) + [modes[-1]] * pad
        S = self.S_pad
        stream_modes = [modes[i] if modes else self.cfg.TEST.MODE
                        for i in range(S)]
        ids = np.zeros((S, self.nt), np.int32)
        mask = np.zeros((S, self.nt), np.int32)
        flags = np.zeros((S,), np.int32)
        for i, lang in enumerate(languages):
            if (lang is not None and self.tokenizer is not None
                    and stream_modes[i] != "BBOX"):
                ii, mm = self.tokenizer.encode_query(lang, self.nt)
                ids[i], mask[i] = ii, mm
                flags[i] = 2
        self.text_ids = jnp.asarray(ids)
        self.text_mask = jnp.asarray(mask)
        self.flags = jnp.asarray(flags)

        hw = frames[0].shape[:2]
        stacked = jnp.stack([jnp.asarray(f) for f in frames])
        nl = [i for i in range(S) if stream_modes[i] == "NL"]
        if nl:
            # tokenizer=None matches Tracker's leniency (zero text ids —
            # cli/test.py warns when a text mode has no vocab)
            pred = np.asarray(self._grounding_fn(hw)(
                self.variables, stacked, self.text_ids, self.text_mask))
            ih, iw = hw
            scale = float(max(ih, iw))
            for i in nl:  # letterbox cxcywh -> image xywh (Tracker._grounding)
                cx, cy, w_, h_ = pred[i] * scale
                boxes[i] = [cx - w_ / 2 + min(0.0, (iw - ih) / 2),
                            cy - h_ / 2 + min(0.0, (ih - iw) / 2), w_, h_]
        boxes_j = jnp.asarray(np.asarray(boxes, np.float32))
        if self.mesh is not None:
            put = lambda x: jax.device_put(x, self._stream(x.ndim))
            stacked, boxes_j = put(stacked), put(boxes_j)
            self.text_ids = put(self.text_ids)
            self.text_mask = put(self.text_mask)
            self.flags = put(self.flags)
        template, template_mask, prompt = self._init_fn(hw)(
            self.variables, stacked, boxes_j, self.text_ids, self.text_mask,
            self.flags)
        self.template = template          # (S, tz, tz, 3)
        self.template_mask = template_mask  # (S, z)
        if self.cache_text:  # (S, Nt, C) per-stream, constant per sequence
            self.txt = self.text_fn()(
                self.variables, self.text_ids, self.text_mask)
        else:
            self.txt = self.text_ids

        s = (self.search_size // 16) ** 2
        z = (self.template_size // 16) ** 2
        c = self.embed_dim
        self.state = BatchState(
            box=boxes_j,
            prompt=prompt,
            max_score=jnp.zeros((S,), jnp.float32),
            frame_id=jnp.zeros((S,), jnp.int32),
            active=jnp.ones((S,), bool),
            best_box_net=jnp.zeros((S, 4), jnp.float32),
            best_search=jnp.zeros((S, s, c), jnp.float32),
            best_template=jnp.zeros((S, z, c), jnp.float32),
            best_vis_token=jnp.zeros((S, 1, c), jnp.float32),
            best_txt_token=jnp.zeros((S, 1, c), jnp.float32),
        )
        # the boxes each stream actually initialized from (grounded for NL
        # streams) — the runner reports these as frame 0, like
        # Tracker.initialize's {"target_bbox": init_bbox}
        return boxes[:self.S].copy()

    # ------------------------------------------------------------------ step
    def _step_fn(self, hw):
        if hw not in self._step_cache:
            h, w = hw
            sz = self.search_size
            fsz = self.map_size
            window = self.window
            interval = self.update_interval
            do_update = self.has_cont and interval > 0
            use_cond = os.environ.get(
                "UVLTRACK_BATCH_COND_REMINE", "1") == "1"
            model = self.model

            test_method = (UVLTrack.forward_test_cached if self.cache_text
                           else UVLTrack.forward_test)

            def fn(variables, state: BatchState, frames, template,
                   template_mask, txt, text_mask, flags):
                S = frames.shape[0]
                crops, rf = jax.vmap(
                    lambda f, b: sample_target_device(f, b, self.search_factor, sz)
                )(frames, state.box)
                search = crops[:, 0]  # (S, sx, sx, 3)
                out = model.apply(variables, template, search, txt,
                                  text_mask, state.prompt, flags,
                                  method=test_method)
                cls = out["cls_score_test"].reshape(S, -1).astype(jnp.float32)
                if self.has_cont:
                    cont = jax.nn.softmax(
                        out["cont_score"].astype(jnp.float32), axis=-1)[:, :, 0]
                else:
                    cont = jnp.ones_like(cls)
                merged = cls * window[None] * cont
                k = jnp.argmax(merged, axis=-1)  # (S,)
                bid = jnp.arange(S)
                box_net = out["bbox_map"][bid, k]  # (S,4)
                score = (cls * cont)[bid, k]

                pred_crop = box_net * sz / rf[:, None]
                new_box = map_box_back(pred_crop, state.box, rf, sz)
                new_box = clip_box_xywh(new_box, h, w, margin=10)
                # frozen streams keep their box
                new_box = jnp.where(state.active[:, None], new_box, state.box)

                frame_id = state.frame_id + state.active.astype(jnp.int32)
                is_best = (score > state.max_score) & state.active
                pick = lambda a, b: jnp.where(is_best.reshape(
                    (S,) + (1,) * (a.ndim - 1)), a, b)
                f32 = lambda a: a.astype(jnp.float32)
                best_box_net = pick(f32(box_net), state.best_box_net)
                best_search = pick(f32(out["search"]), state.best_search)
                best_template = pick(f32(out["template"]), state.best_template)
                best_vis = pick(f32(out["vis_token"]), state.best_vis_token)
                best_txt = pick(f32(out["txt_token"]), state.best_txt_token)
                max_score = jnp.where(is_best, score, state.max_score)

                prompt = state.prompt
                if do_update:
                    refresh = ((jnp.mod(frame_id, interval) == 0)
                               & (max_score > self.threshold) & state.active)

                    # Re-mine prompts only when SOME stream refreshes this
                    # frame: lockstep streams usually join together, so
                    # interval-1 of every interval frames skip the whole
                    # prompter pass. Mirrors the single-stream tracker's
                    # in-step lax.cond, which measured as a TRUE conditional
                    # on TPU (TPU_DESIGN "per-frame step"); the predicate is
                    # a scalar (fn is batched directly, not vmapped), so XLA
                    # cannot flatten it into a select.
                    # UVLTRACK_BATCH_COND_REMINE=0 reverts to the
                    # unconditional where-select (A/B lever).
                    def remine(prompt, max_score):
                        ctx_box = box_cxcywh_to_xywh(best_box_net)
                        ctx_mask = anno2mask(ctx_box, fsz)
                        feats = {
                            "search": best_search,
                            "template": best_template,
                            "vis_token": best_vis,
                            "txt_token": best_txt,
                            "flag": flags,
                        }
                        new_prompt = model.apply(
                            variables, feats, template_mask, ctx_mask,
                            method=UVLTrack.forward_prompt)
                        return (jnp.where(refresh[:, None, None],
                                          new_prompt.astype(prompt.dtype),
                                          prompt),
                                jnp.where(refresh, 0.0, max_score))

                    if use_cond:
                        prompt, max_score = jax.lax.cond(
                            jnp.any(refresh), remine, lambda p, m: (p, m),
                            prompt, max_score)
                    else:
                        prompt, max_score = remine(prompt, max_score)

                new_state = BatchState(
                    box=new_box, prompt=prompt, max_score=max_score,
                    frame_id=frame_id, active=state.active,
                    best_box_net=best_box_net, best_search=best_search,
                    best_template=best_template, best_vis_token=best_vis,
                    best_txt_token=best_txt)
                packed = jnp.concatenate([new_box, score[:, None]], axis=-1)
                return new_state, packed[:self.S]  # drop mesh pad streams

            self._raw_fn_cache[hw] = fn
            self._step_cache[hw] = jax.jit(fn)
        return self._step_cache[hw]

    def _many_fn(self, hw):
        """Scan-chunked variant: frames (T, S, H, W, 3) advance T lockstep
        steps in ONE dispatch (same trick as Tracker.track_many) — per-step
        dispatch overhead was ~45% of the batch-2 step through the tunnel
        and ~1 ms even locally."""
        if hw not in self._many_cache:
            self._step_fn(hw)  # populate the raw per-frame fn
            fn = self._raw_fn_cache[hw]

            def many(variables, state, frames_t, template, template_mask,
                     text_ids, text_mask, flags):
                def body(st, frames_s):
                    new_state, packed = fn(variables, st, frames_s, template,
                                           template_mask, text_ids,
                                           text_mask, flags)
                    return new_state, packed

                final, packs = jax.lax.scan(body, state, frames_t)
                return final, packs  # (T, S, 5)

            self._many_cache[hw] = jax.jit(many)
        return self._many_cache[hw]

    def _pad_frames(self, frames, axis: int = 0):
        """Pad the stream axis from S to S_pad by replaying the last frame
        (mesh-divisibility padding; outputs are sliced back inside the jitted
        step)."""
        pad = self.S_pad - self.S
        if not pad:
            return frames
        last = jnp.take(frames, jnp.array([frames.shape[axis] - 1]), axis=axis)
        return jnp.concatenate(
            [frames, jnp.repeat(last, pad, axis=axis)], axis=axis)

    def set_active(self, active: np.ndarray):
        active = np.asarray(active, bool)
        if self.S_pad != self.S:  # pad streams stay frozen
            active = np.concatenate(
                [active, np.zeros(self.S_pad - self.S, bool)])
        self.state = self.state._replace(active=jnp.asarray(active))

    def step(self, frames) -> np.ndarray:
        """frames: (S, H, W, 3) or list of S frames. Returns (S, 5) boxes+scores."""
        if isinstance(frames, (list, tuple)):
            frames = jnp.stack([jnp.asarray(f) for f in frames])
        frames = self._pad_frames(frames)
        if self.mesh is not None:
            frames = jax.device_put(frames, self._stream(frames.ndim))
        hw = (int(frames.shape[1]), int(frames.shape[2]))
        self.state, packed = self._step_fn(hw)(
            self.variables, self.state, frames, self.template,
            self.template_mask, self.txt, self.text_mask, self.flags)
        return np.asarray(packed, np.float64)

    def step_async(self, frames):
        if isinstance(frames, (list, tuple)):
            frames = jnp.stack([jnp.asarray(f) for f in frames])
        frames = self._pad_frames(frames)
        if self.mesh is not None:
            frames = jax.device_put(frames, self._stream(frames.ndim))
        hw = (int(frames.shape[1]), int(frames.shape[2]))
        self.state, packed = self._step_fn(hw)(
            self.variables, self.state, frames, self.template,
            self.template_mask, self.txt, self.text_mask, self.flags)
        return packed

    def step_many_async(self, frames_t):
        """frames_t: (T, S, H, W, 3) — T lockstep steps in one dispatch via
        lax.scan. Returns the (T, S, 5) device handle (unread)."""
        if isinstance(frames_t, (list, tuple)):
            frames_t = jnp.stack([
                f if isinstance(f, jnp.ndarray) else
                jnp.stack([jnp.asarray(x) for x in f]) for f in frames_t])
        frames_t = self._pad_frames(frames_t, axis=1)
        if self.mesh is not None:
            frames_t = jax.device_put(
                frames_t, jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec(
                        None, "data", None, None, None)))
        hw = (int(frames_t.shape[2]), int(frames_t.shape[3]))
        self.state, packs = self._many_fn(hw)(
            self.variables, self.state, frames_t, self.template,
            self.template_mask, self.txt, self.text_mask, self.flags)
        return packs

    def step_many(self, frames_t) -> np.ndarray:
        return np.asarray(self.step_many_async(frames_t), np.float64)

    def step_many_cost(self, frames_t) -> dict:
        """XLA cost analysis of the compiled (T, S)-lockstep chunk program
        for a frame block shaped like `frames_t` — {"flops", "bytes"}.
        XLA counts the lax.scan BODY once regardless of the T trip count,
        so divide by S_pad (not T*S; pad streams compute too) for
        per-frame figures — returned here as "streams" so callers don't
        reach for the caller-visible S. Frames get the same mesh sharding
        as step_many_async so this lowers the EXACT program that method
        runs (a mismatched input sharding would cost+compile a different
        one). Call after initialize(); used by bench.py's batched MFU."""
        from ..utils.costs import compiled_cost

        frames_t = self._pad_frames(jnp.asarray(frames_t), axis=1)
        if self.mesh is not None:
            frames_t = jax.device_put(
                frames_t, jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec(
                        None, "data", None, None, None)))
        hw = (int(frames_t.shape[2]), int(frames_t.shape[3]))
        out = compiled_cost(
            self._many_fn(hw), self.variables, self.state, frames_t,
            self.template, self.template_mask, self.txt, self.text_mask,
            self.flags)
        out["streams"] = self.S_pad
        return out
