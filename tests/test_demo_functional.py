"""Functional demo-CLI test: synthesize a tiny video, track it in BBOX mode
(full UVLTrack-B with random weights on CPU — the one CLI that was only
--help-smoked), and check the annotated output video exists with the right
frame count."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow  # ~80s: mp4 synth + full demo pipeline
def test_demo_tracks_synthetic_video(tmp_path):
    from uvltrack_tpu.cli import demo

    rng = np.random.default_rng(0)
    src = str(tmp_path / "clip.avi")
    w, h, n = 320, 240, 6
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h))
    assert writer.isOpened(), "cv2 VideoWriter unavailable"
    for i in range(n):
        frame = rng.integers(0, 80, size=(h, w, 3)).astype(np.uint8)
        x = 60 + 6 * i
        frame[100:140, x:x + 40] = (30, 220, 30)  # moving green square
        writer.write(frame)
    writer.release()

    out = str(tmp_path / "out.mp4")
    demo.main(["--video", src, "--output", out,
               "--init_bbox", "60", "100", "40", "40"])
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    frames = 0
    while cap.read()[0]:
        frames += 1
    assert frames == n
