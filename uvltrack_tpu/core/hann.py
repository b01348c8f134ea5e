"""Cosine (Hann) windows used as tracking motion priors — pure jnp.

The live inference window in the reference tracker is numpy's hanning outer
product (lib/test/tracker/uvltrack.py:64-68); hann1d/hann2d variants
(lib/test/utils/hann.py:6-17) are provided for completeness.
"""

from __future__ import annotations

import jax.numpy as jnp


def hanning(sz: int) -> jnp.ndarray:
    """numpy.hanning equivalent: 0.5 - 0.5*cos(2*pi*n/(sz-1)); zero at ends."""
    if sz == 1:
        return jnp.ones((1,), jnp.float32)
    n = jnp.arange(sz, dtype=jnp.float32)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / (sz - 1))


def hanning2d_flat(sz: int) -> jnp.ndarray:
    """Outer product of hanning(sz) with itself, flattened to (sz*sz,)."""
    w = hanning(sz)
    return jnp.outer(w, w).reshape(-1)


def hann1d(sz: int, centered: bool = True) -> jnp.ndarray:
    """Cosine window that is strictly positive in the interior (no zero ends)."""
    if centered:
        n = jnp.arange(1, sz + 1, dtype=jnp.float32)
        return 0.5 * (1.0 - jnp.cos((2.0 * jnp.pi / (sz + 1)) * n))
    n = jnp.arange(0, sz // 2 + 1, dtype=jnp.float32)
    w = 0.5 * (1.0 + jnp.cos((2.0 * jnp.pi / (sz + 2)) * n))
    return jnp.concatenate([w, w[1 : sz - sz // 2][::-1]])


def hann2d(sz_y: int, sz_x: int, centered: bool = True) -> jnp.ndarray:
    return hann1d(sz_y, centered)[:, None] * hann1d(sz_x, centered)[None, :]
