"""Shared synthetic-image generator for the bench scripts."""

from __future__ import annotations

import numpy as np


def photo_like(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """Low-frequency scene + mild texture: compresses like a road photo."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (
        0.5
        + 0.25 * np.sin(xx / 97.0 + rng.rand() * 6)
        + 0.2 * np.cos(yy / 53.0 + rng.rand() * 6)
    )
    im = np.stack([base, base * 0.9, base * 0.8], -1)
    im += rng.randn(h, w, 3).astype(np.float32) * 0.02
    return np.clip(im, 0.0, 1.0)
