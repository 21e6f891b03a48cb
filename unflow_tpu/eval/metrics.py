"""Flow evaluation metrics: AEE and KITTI outlier fraction (Fl).

Reference: simonmeister/UnFlow ``src/e2eflow/core/flow_util.py`` /
``src/eval_gui.py`` — ``flow_error_avg`` (average endpoint error over
valid pixels) and the KITTI outlier percentage (error > 3 px AND > 5%
of the GT magnitude) (SURVEY.md §2.2 P15).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def endpoint_error(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Per-pixel endpoint error, (B, H, W, 1)."""
    return jnp.sqrt(jnp.sum(jnp.square(pred - gt), axis=-1, keepdims=True))


def flow_error_avg(
    pred: jax.Array, gt: jax.Array, mask: jax.Array | None = None
) -> jax.Array:
    """AEE over valid pixels (mask: (B,H,W,1) 1.0 = valid)."""
    err = endpoint_error(pred, gt)
    if mask is None:
        return jnp.mean(err)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def outlier_fraction(
    pred: jax.Array,
    gt: jax.Array,
    mask: jax.Array | None = None,
    abs_thresh: float = 3.0,
    rel_thresh: float = 0.05,
) -> jax.Array:
    """KITTI Fl: fraction of valid pixels with EPE > 3 px and > 5% |gt|."""
    err = endpoint_error(pred, gt)
    mag = jnp.sqrt(jnp.sum(jnp.square(gt), axis=-1, keepdims=True))
    outlier = ((err > abs_thresh) & (err > rel_thresh * mag)).astype(pred.dtype)
    if mask is None:
        return jnp.mean(outlier)
    return jnp.sum(outlier * mask) / jnp.maximum(jnp.sum(mask), 1.0)
