"""Per-sample crop/augment processing for training.

Parity with TrackProcessing (lib/train/data/processing.py:45-309):
- track_process: jitter the target box, jittered_center_crop to template /
  search, joint photometric+flip transforms, Gaussian cls label per search
  frame, validity checks with resampling handled by the sampler.
- grounding_process: aspect-preserving letterbox of the full image with
  phrase-aware augmentation — horizontal flips rewrite "left"<->"right" in
  the phrase and are banned when other direction words appear
  (processing.py:187-189,285-291); template is zeros (:297-298).

Outputs are frame-major numpy dicts; images NHWC float32 (ImageNet-normalized).
"""

from __future__ import annotations

import re
from typing import List, Optional

import cv2
import numpy as np

from .processing_utils import (generate_cls_label_np, grounding_resize_np,
                               jittered_center_crop)
from .transforms import IMAGENET_MEAN, IMAGENET_STD

DIRECTION_WORDS = ("left", "right", "top", "bottom", "middle")


def _normalize_img(im: np.ndarray) -> np.ndarray:
    return (im.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def has_directions(phrase: str) -> bool:
    words = set(re.findall(r"[a-z]+", phrase.lower()))
    return any(w in words for w in DIRECTION_WORDS)


def flip_phrase(phrase: str) -> str:
    """Swap 'left' and 'right' words in a phrase (grounding flip aug)."""

    def swap(m):
        return "right" if m.group(0) == "left" else "left"

    return re.sub(r"\b(left|right)\b", swap, phrase)


class TrackProcessing:
    def __init__(self, cfg, rng: Optional[np.random.Generator] = None,
                 seed: Optional[int] = None):
        self.cfg = cfg
        if rng is not None:
            self._rng, self._fixed_rng = None, rng
        else:
            # loader workers call this from multiple threads; numpy Generators
            # are not thread-safe, so default to per-thread streams
            from .sampler import _ThreadLocalRng

            self._rng, self._fixed_rng = _ThreadLocalRng(seed), None
        self.template_size = int(cfg.DATA.TEMPLATE.SIZE)
        self.search_size = int(cfg.DATA.SEARCH.SIZE)
        self.template_factor = float(cfg.DATA.TEMPLATE.FACTOR)
        self.search_factor = float(cfg.DATA.SEARCH.FACTOR)
        self.tpl_center_jitter = float(cfg.DATA.TEMPLATE.CENTER_JITTER)
        self.tpl_scale_jitter = float(cfg.DATA.TEMPLATE.SCALE_JITTER)
        self.srch_center_jitter = float(cfg.DATA.SEARCH.CENTER_JITTER)
        self.srch_scale_jitter = float(cfg.DATA.SEARCH.SCALE_JITTER)
        self.gaussian_iou = float(cfg.TRAIN.GAUSSIAN_IOU)
        self.dynamic_cls = bool(cfg.TRAIN.DYNAMIC_CLS)
        self.brightness_jitter = 0.2
        self.flip_prob = 0.5
        self.gray_prob = 0.05
        self.vltvg_aug = bool(cfg.TRAIN.VLTVG_AUG)

    @property
    def rng(self) -> np.random.Generator:
        return self._fixed_rng if self._fixed_rng is not None else self._rng.get()

    # ----------------------------------------------------------------- utils
    def _jitter_box(self, box: np.ndarray, center_jitter: float,
                    scale_jitter: float) -> np.ndarray:
        """Jitter an xywh box in scale and center (processing.py:81-111)."""
        box = np.asarray(box, np.float64)
        jittered_size = box[2:4] * np.exp(self.rng.normal(0, scale_jitter, 2))
        max_offset = np.sqrt(jittered_size.prod()) * center_jitter
        jittered_center = (box[:2] + 0.5 * box[2:4]
                           + max_offset * (self.rng.random(2) - 0.5))
        return np.concatenate([jittered_center - 0.5 * jittered_size, jittered_size])

    def _photometric(self, images: List[np.ndarray]) -> List[np.ndarray]:
        factor = self.rng.uniform(max(0.0, 1 - self.brightness_jitter),
                                  1 + self.brightness_jitter)
        out = [np.clip(im.astype(np.float32) * factor, 0, 255) for im in images]
        if self.rng.random() < self.gray_prob:
            out = [np.repeat(cv2.cvtColor(im.astype(np.uint8),
                                          cv2.COLOR_RGB2GRAY)[..., None], 3, -1).astype(np.float32)
                   for im in out]
        return out

    # ----------------------------------------------------------------- track
    def track_process(self, template_frames, template_boxes,
                      search_frames, search_boxes, language: Optional[str]):
        """Returns the sample dict or None if a crop came out degenerate."""
        for _ in range(10):
            tpl_jit = [self._jitter_box(b, self.tpl_center_jitter,
                                        self.tpl_scale_jitter)
                       for b in template_boxes]
            srch_jit = [self._jitter_box(b, self.srch_center_jitter,
                                         self.srch_scale_jitter)
                       for b in search_boxes]
            if all(b[2] > 0 and b[3] > 0 for b in tpl_jit + srch_jit):
                break
        else:
            return None
        try:
            tpl_crops, tpl_norm, _ = jittered_center_crop(
                template_frames, tpl_jit, template_boxes,
                self.template_factor, self.template_size)
            srch_crops, srch_norm, _ = jittered_center_crop(
                search_frames, srch_jit, search_boxes,
                self.search_factor, self.search_size)
        except ValueError:
            return None

        # validity: gt box must retain positive area inside the crop
        for b in tpl_norm + srch_norm:
            inter_w = min(b[0] + b[2], 1.0) - max(b[0], 0.0)
            inter_h = min(b[1] + b[3], 1.0) - max(b[1], 0.0)
            if inter_w <= 0 or inter_h <= 0:
                return None

        images = self._photometric(tpl_crops + srch_crops)
        boxes = [np.asarray(b, np.float64) for b in tpl_norm + srch_norm]
        if self.rng.random() < self.flip_prob:
            images = [im[:, ::-1].copy() for im in images]
            boxes = [np.array([1.0 - b[0] - b[2], b[1], b[2], b[3]]) for b in boxes]
        nt = len(tpl_crops)
        tpl_imgs = np.stack([_normalize_img(im) for im in images[:nt]], 0)
        srch_imgs = np.stack([_normalize_img(im) for im in images[nt:]], 0)
        srch_boxes = np.stack(boxes[nt:], 0)
        cls = np.stack([generate_cls_label_np(b, self.search_size // 16,
                                              self.gaussian_iou, self.dynamic_cls)
                        for b in srch_boxes], 0)
        return {
            "template_images": tpl_imgs.astype(np.float32),
            "template_anno": np.stack(boxes[:nt], 0).astype(np.float32),
            "search_images": srch_imgs.astype(np.float32),
            "search_anno": srch_boxes.astype(np.float32),
            "search_cls": cls.astype(np.float32),
            "language": language,
        }

    # -------------------------------------------------------------- grounding
    def grounding_process(self, frames, boxes, language: Optional[str],
                          n_search: int):
        """Letterbox each frame as a search image; zero template."""
        phrase = language or "object, thing or stuff"
        images = self._photometric(list(frames))
        boxes = [np.asarray(b, np.float64) for b in boxes]
        # flip only when it can be made phrase-consistent (no top/bottom/middle)
        words = set(re.findall(r"[a-z]+", phrase.lower()))
        flip_ok = not any(w in words for w in ("top", "bottom", "middle"))
        if flip_ok and self.rng.random() < self.flip_prob:
            images = [im[:, ::-1].copy() for im in images]
            boxes = [np.array([im.shape[1] - b[0] - b[2], b[1], b[2], b[3]])
                     for im, b in zip(images, boxes)]
            phrase = flip_phrase(phrase)

        srch, anno = [], []
        for im, b in zip(images, boxes):
            if self.vltvg_aug:
                from .grounding_aug import grounding_augment

                padded, nb = grounding_augment(im.astype(np.uint8), b,
                                               self.search_size, self.rng)
            else:
                padded, nb, _ = grounding_resize_np(im.astype(np.uint8),
                                                    self.search_size, b)
            if nb[2] <= 0 or nb[3] <= 0:
                return None
            srch.append(_normalize_img(padded))
            anno.append(nb)
        while len(srch) < n_search:
            srch.append(srch[-1].copy())
            anno.append(anno[-1].copy())
        srch_imgs = np.stack(srch[:n_search], 0)
        srch_boxes = np.stack(anno[:n_search], 0)
        cls = np.stack([generate_cls_label_np(b, self.search_size // 16,
                                              self.gaussian_iou, self.dynamic_cls)
                        for b in srch_boxes], 0)
        ts = self.template_size
        return {
            "template_images": np.zeros((1, ts, ts, 3), np.float32),
            "template_anno": np.zeros((1, 4), np.float32),
            "search_images": srch_imgs.astype(np.float32),
            "search_anno": srch_boxes.astype(np.float32),
            "search_cls": cls.astype(np.float32),
            "language": phrase,
        }
