"""Dynamic multi-stream serving pool: continuous batching for tracking.

BatchTracker (track/batch.py) advances S lockstep streams that initialize
TOGETHER — the eval-time shape, where a dataset bucket starts as a group.
Serving needs the LLM-continuous-batching shape instead: streams join and
leave independently while ONE device dispatch per round advances every
stream that has a pending frame. StreamPool provides that on top of
BatchTracker's step:

- fixed capacity S (the compiled batch shape never changes; the MXU always
  sees batch-S matmuls),
- open(stream, frame, info): claims a free slot and initializes it ALONE —
  template crop, prompt mining, text prefix, grounding for NL — writing the
  slot's rows into the batched device arrays with one jitted row-write
  (never a recompile, never touching other slots' state),
- submit({stream: frame}): one BatchTracker.step over the full batch with
  only the pending slots active; frozen/free slots carry their state
  unchanged (BatchState.active masking),
- close(stream): frees the slot for reuse; stale rows are dead weight the
  next open() overwrites.

No reference equivalent (the reference serves nothing; its closest shape is
the per-GPU eval process pool, lib/test/evaluation/running.py:93-102).

All frames in one submit() share a resolution (one compiled step per
(H, W)); streams themselves may span resolutions round to round, like the
single tracker.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .batch import BatchState, BatchTracker


@jax.jit
def _write_rows(arrs, rows, i):
    """Write each row pytree leaf into its batched array at slot i — ONE
    compiled dispatch for the whole slot-open update (traced once; `i` is a
    traced scalar so every slot reuses the compile)."""
    return jax.tree_util.tree_map(lambda a, r: a.at[i].set(r), arrs, rows)


class StreamPool:
    """Continuous-batching pool over one BatchTracker."""

    def __init__(self, cfg, model, variables, capacity: int, tokenizer=None,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh — slots shard over its "data"
        axis exactly like BatchTracker's eval mode (weights replicated,
        every per-slot array split on the slot axis), so one pool serves
        all local chips. Capacity is padded up to the axis size internally;
        pad slots stay permanently free/frozen."""
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.bt = BatchTracker(cfg, model, variables, capacity,
                               tokenizer=tokenizer, mesh=mesh)
        bt = self.bt
        self.capacity = capacity
        self.slot_of: Dict[str, int] = {}
        self._free = list(range(capacity - 1, -1, -1))  # pop() -> slot 0 first
        s = (bt.search_size // 16) ** 2
        z = (bt.template_size // 16) ** 2
        c = bt.embed_dim
        S = bt.S_pad  # device arrays sized for mesh divisibility
        # bootstrap the batched device arrays BatchTracker.initialize would
        # have built — zeros, every slot free; text features typed by running
        # the real encoder on zero ids so dtype/shape always match row writes
        bt.text_ids = jnp.zeros((S, bt.nt), jnp.int32)
        bt.text_mask = jnp.zeros((S, bt.nt), jnp.int32)
        bt.flags = jnp.zeros((S,), jnp.int32)
        bt.template = jnp.zeros((S, bt.template_size, bt.template_size, 3),
                                jnp.float32)
        bt.template_mask = jnp.zeros((S, z), bool)
        if bt.cache_text:
            bt.txt = bt.text_fn()(bt.variables, bt.text_ids, bt.text_mask)
        else:
            bt.txt = bt.text_ids
        bt.state = BatchState(
            box=jnp.zeros((S, 4), jnp.float32),
            prompt=jnp.zeros((S, 3, c), jnp.float32),
            max_score=jnp.zeros((S,), jnp.float32),
            frame_id=jnp.zeros((S,), jnp.int32),
            active=jnp.zeros((S,), bool),
            best_box_net=jnp.zeros((S, 4), jnp.float32),
            best_search=jnp.zeros((S, s, c), jnp.float32),
            best_template=jnp.zeros((S, z, c), jnp.float32),
            best_vis_token=jnp.zeros((S, 1, c), jnp.float32),
            best_txt_token=jnp.zeros((S, 1, c), jnp.float32),
        )
        self._reshard()

    def _reshard(self) -> None:
        """Pin the slot-axis sharding on every batched array (mesh mode).
        device_put on an already-correctly-sharded array is a no-op; after a
        row write it moves only what the update displaced (device-to-device
        over ICI, never through the host)."""
        bt = self.bt
        if bt.mesh is None:
            return
        put = lambda x: jax.device_put(x, bt._stream(x.ndim))
        bt.text_ids, bt.text_mask, bt.flags = map(
            put, (bt.text_ids, bt.text_mask, bt.flags))
        bt.template, bt.template_mask, bt.txt = map(
            put, (bt.template, bt.template_mask, bt.txt))
        bt.state = jax.tree_util.tree_map(put, bt.state)

    # ------------------------------------------------------------ lifecycle
    def open(self, stream: str, frame: np.ndarray, info: dict) -> list:
        """Claim a slot and initialize it alone; returns the frame-0 box
        (grounded for NL mode, echoed for BBOX/NLBBOX) like
        Tracker.initialize."""
        bt = self.bt
        if stream in self.slot_of:
            i = self.slot_of[stream]  # re-initialize in place
        elif self._free:
            i = self._free.pop()
        else:
            raise RuntimeError(
                f"pool full ({self.capacity} slots); close a stream first")
        mode = self.bt.cfg.TEST.MODE
        language = info.get("language")

        ids = np.zeros((1, bt.nt), np.int32)
        mask = np.zeros((1, bt.nt), np.int32)
        flag = 0
        if (language is not None and bt.tokenizer is not None
                and mode != "BBOX"):
            ii, mm = bt.tokenizer.encode_query(language, bt.nt)
            ids[0], mask[0] = ii, mm
            flag = 2
        ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

        hw = frame.shape[:2]
        frame_j = jnp.asarray(frame)[None]
        if mode == "NL":
            pred = np.asarray(bt._grounding_fn(hw)(
                bt.variables, frame_j, ids_j, mask_j))[0]
            ih, iw = hw
            scale = float(max(ih, iw))
            cx, cy, w_, h_ = pred * scale
            box = [float(cx - w_ / 2 + min(0.0, (iw - ih) / 2)),
                   float(cy - h_ / 2 + min(0.0, (ih - iw) / 2)),
                   float(w_), float(h_)]
        else:
            box = [float(v) for v in info["init_bbox"]]
        box_j = jnp.asarray(np.asarray([box], np.float32))
        flag_j = jnp.asarray(np.asarray([flag], np.int32))

        template, template_mask, prompt = bt._init_fn(hw)(
            bt.variables, frame_j, box_j, ids_j, mask_j, flag_j)
        txt_row = (bt.text_fn()(bt.variables, ids_j, mask_j)[0]
                   if bt.cache_text else ids_j[0])

        st = bt.state
        arrs = (bt.text_ids, bt.text_mask, bt.flags, bt.template,
                bt.template_mask, bt.txt, st.box, st.prompt, st.max_score,
                st.frame_id, st.best_box_net, st.best_search,
                st.best_template, st.best_vis_token, st.best_txt_token)
        rows = (ids_j[0], mask_j[0], flag_j[0], template[0],
                template_mask[0], txt_row, box_j[0], prompt[0],
                jnp.float32(0.0), jnp.int32(0),
                jnp.zeros_like(st.best_box_net[0]),
                jnp.zeros_like(st.best_search[0]),
                jnp.zeros_like(st.best_template[0]),
                jnp.zeros_like(st.best_vis_token[0]),
                jnp.zeros_like(st.best_txt_token[0]))
        (bt.text_ids, bt.text_mask, bt.flags, bt.template, bt.template_mask,
         bt.txt, box_a, prompt_a, max_a, fid_a, bbn_a, bs_a, btm_a, bv_a,
         btx_a) = _write_rows(arrs, rows, i)
        bt.state = st._replace(
            box=box_a, prompt=prompt_a, max_score=max_a, frame_id=fid_a,
            best_box_net=bbn_a, best_search=bs_a, best_template=btm_a,
            best_vis_token=bv_a, best_txt_token=btx_a)
        self._reshard()  # row writes must not silently drop the slot sharding
        self.slot_of[stream] = i
        return box

    def close(self, stream: str) -> None:
        i = self.slot_of.pop(stream, None)
        if i is None:
            raise LookupError(f"stream {stream!r} not open")
        self._free.append(i)

    # -------------------------------------------------------------- serving
    def submit(self, frames: Dict[str, np.ndarray]) -> Dict[str, dict]:
        """Advance every stream with a pending frame in ONE device dispatch.
        Streams not in `frames` stay frozen (state untouched). Returns
        {stream: {"bbox": [...], "score": s}} for the pending streams."""
        if not frames:
            return {}
        unknown = [s for s in frames if s not in self.slot_of]
        if unknown:
            raise LookupError(f"streams not open: {unknown}")
        hws = {f.shape[:2] for f in frames.values()}
        if len(hws) != 1:
            raise ValueError(
                f"one submit = one resolution (got {sorted(hws)}); "
                "bucket mixed-resolution rounds upstream")
        (h, w), = hws
        batch = np.zeros((self.capacity, h, w, 3), np.uint8)
        active = np.zeros((self.capacity,), bool)
        for stream, f in frames.items():
            i = self.slot_of[stream]
            batch[i] = f
            active[i] = True
        self.bt.set_active(active)
        packed = self.bt.step(batch)  # (S, 5)
        return {stream: {"bbox": packed[self.slot_of[stream], :4].tolist(),
                         "score": float(packed[self.slot_of[stream], 4])}
                for stream in frames}

    @property
    def open_streams(self) -> list:
        return sorted(self.slot_of)
