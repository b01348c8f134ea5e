"""Grounding-specific train-time augmentation.

Capability parity with lib/train/data/processing_utils_grounding2.py: random
short-side resize from a size menu (:71,383-396), random crop constrained to
keep the target (IoU-checked, :112), color jitter, and random-translate
letterbox padding (:455+). Horizontal flips with phrase rewriting live in
processing.py. All numpy/cv2, used inside dataloader workers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np


def size_menu(output_sz: int) -> list:
    """Resize targets proportional to the output size (grounding2.py:383-396)."""
    base = output_sz
    return [int(base * r) for r in (0.7, 0.78, 0.86, 0.92, 1.0)]


def random_resize(im: np.ndarray, box: np.ndarray, rng: np.random.Generator,
                  output_sz: int) -> Tuple[np.ndarray, np.ndarray]:
    """Scale so the long side hits a random menu entry (aspect preserved)."""
    target = int(rng.choice(size_menu(output_sz)))
    h, w = im.shape[:2]
    scale = target / max(h, w)
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    out = cv2.resize(im, (nw, nh))
    return out, box * np.array([nw / w, nh / h, nw / w, nh / h])


def random_size_crop(im: np.ndarray, box: np.ndarray, rng: np.random.Generator,
                     min_keep_iou: float = 0.9, tries: int = 10
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Random crop that keeps (almost all of) the target box inside.

    The kept-fraction check mirrors the reference's IoU constraint between
    the original box and its intersection with the crop.
    """
    h, w = im.shape[:2]
    x1b, y1b, x2b, y2b = box[0], box[1], box[0] + box[2], box[1] + box[3]
    for _ in range(tries):
        cw = int(rng.uniform(0.7, 1.0) * w)
        ch = int(rng.uniform(0.7, 1.0) * h)
        cx = int(rng.uniform(0, max(w - cw, 1)))
        cy = int(rng.uniform(0, max(h - ch, 1)))
        ix1, iy1 = max(x1b, cx), max(y1b, cy)
        ix2, iy2 = min(x2b, cx + cw), min(y2b, cy + ch)
        inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
        area = max((x2b - x1b) * (y2b - y1b), 1e-6)
        if inter / area >= min_keep_iou:
            crop = im[cy: cy + ch, cx: cx + cw]
            new_box = np.array([ix1 - cx, iy1 - cy, ix2 - ix1, iy2 - iy1])
            return crop, new_box
    return im, box.copy()


def color_jitter(im: np.ndarray, rng: np.random.Generator,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4) -> np.ndarray:
    out = im.astype(np.float32)
    out = out * rng.uniform(1 - brightness, 1 + brightness)
    mean = out.mean()
    out = (out - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
    gray = out.mean(axis=2, keepdims=True)
    out = (out - gray) * rng.uniform(1 - saturation, 1 + saturation) + gray
    return np.clip(out, 0, 255).astype(im.dtype)


def random_translate_letterbox(im: np.ndarray, box: np.ndarray,
                               output_sz: int, rng: np.random.Generator
                               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Letterbox with a random placement of the image on the canvas
    (replaces the centered padding; grounding2.py:455+).

    Returns (canvas, normalized xywh box, att_mask with 1 on padding).
    """
    h, w = im.shape[:2]
    if w > h:
        ow = output_sz
        oh = max(1, int(output_sz * h / w))
    else:
        oh = output_sz
        ow = max(1, int(output_sz * w / h))
    img = cv2.resize(im, (ow, oh))
    x_off = int(rng.integers(0, output_sz - ow + 1))
    y_off = int(rng.integers(0, output_sz - oh + 1))
    canvas = np.zeros((output_sz, output_sz, 3), im.dtype)
    canvas[y_off: y_off + oh, x_off: x_off + ow] = img
    nb = np.array([
        (box[0] * ow / w + x_off) / output_sz,
        (box[1] * oh / h + y_off) / output_sz,
        box[2] * ow / w / output_sz,
        box[3] * oh / h / output_sz,
    ])
    att = np.ones((output_sz, output_sz))
    att[y_off: y_off + oh, x_off: x_off + ow] = 0
    return canvas, nb, att


def grounding_augment(im: np.ndarray, box: np.ndarray, output_sz: int,
                      rng: Optional[np.random.Generator] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Full augmentation chain: color jitter -> random resize -> random crop
    -> random-translate letterbox. Returns (canvas, normalized xywh)."""
    rng = rng or np.random.default_rng()
    im = color_jitter(im, rng)
    im, box = random_resize(im, box, rng, output_sz)
    im, box = random_size_crop(im, box, rng)
    canvas, nb, _ = random_translate_letterbox(im, box, output_sz, rng)
    return canvas, nb
