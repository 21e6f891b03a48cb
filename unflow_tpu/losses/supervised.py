"""Supervised multi-scale EPE loss for fine-tuning on ground truth.

Reference: simonmeister/UnFlow ``src/e2eflow/core/supervised.py::
supervised_loss`` — charbonnier penalty between predicted flows and the
ground truth average-downsampled to each pyramid level (via the
downsample op, src/e2eflow/ops/downsample_op.cc), honoring sparse-GT
validity masks (KITTI).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from unflow_tpu.models.flownet import FLOW_SCALE
from unflow_tpu.ops import downsample
from unflow_tpu.losses.terms import charbonnier_loss
from unflow_tpu.losses.unsupervised import LAYER_WEIGHTS


def supervised_loss(
    flows: Sequence[jax.Array],
    gt_flow: jax.Array,
    valid_mask: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Multi-scale charbonnier EPE against (possibly sparse) GT flow.

    Args:
      flows: 5-scale predictions, finest (1/4 res) first, raw net units.
      gt_flow: (B, H, W, 2) full-resolution ground truth in pixels.
      valid_mask: (B, H, W, 1) 1.0 where GT is valid (KITTI sparse GT);
        None means dense GT.

    Sparse GT is downsampled mask-aware: gt_s = avg(gt*m)/avg(m), and a
    level pixel is valid if any contributing full-res pixel was.
    """
    if valid_mask is None:
        valid_mask = jnp.ones(gt_flow.shape[:3] + (1,), gt_flow.dtype)

    total = jnp.zeros((), jnp.float32)
    logs: dict[str, jax.Array] = {}
    for i, pred in enumerate(flows):
        factor = 4 * (2**i)
        mask_s = downsample(valid_mask, factor)
        gt_s = downsample(gt_flow * valid_mask, factor) / jnp.maximum(mask_s, 1e-8)
        # GT in this level's pixel units.
        gt_s = gt_s / factor
        valid_s = (mask_s > 0).astype(gt_flow.dtype)
        pred_px = pred * (FLOW_SCALE / (2**i))
        diff = pred_px - gt_s
        loss_i = charbonnier_loss(diff, valid_s, beta=1.0, alpha=0.5, epsilon=1e-3)
        logs[f"epe_charbonnier/scale{i}"] = loss_i
        total = total + LAYER_WEIGHTS[i] * loss_i
    logs["total"] = total
    return total, logs
