"""Unsupervised bidirectional loss stack (census + smoothness + fb).

Reference: simonmeister/UnFlow
``src/e2eflow/core/losses.py::compute_losses`` (per-scale term
computation with occlusion masking) and
``src/e2eflow/core/unsupervised.py::unsupervised_loss`` (pyramid
orchestration, per-scale layer weights).

Per-scale weights and census patch distances follow SURVEY.md §2.2 P2
([MED] confidence): layer_weights [12.7, 4.35, 3.9, 3.4, 1.1], patch
distances [3, 2, 2, 1, 1]. Occlusion is estimated from
forward-backward consistency: occluded where
|f_fw + f_bw∘w|^2 > alpha1 * (|f_fw|^2 + |f_bw∘w|^2) + alpha2 with
alpha1=0.01, alpha2=0.5; a constant occlusion penalty keeps "mask
everything" from being free.

Flow-unit convention (see models/flownet.py): every pyramid level
predicts flow in quarter-resolution pixel units divided by FLOW_SCALE,
so the pixel-space flow at level i (resolution 1/(4*2^i)) is
``pred_i * FLOW_SCALE / 2^i``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from unflow_tpu.models.flownet import FLOW_SCALE
from unflow_tpu.ops import backward_warp, downsample, forward_warp
from unflow_tpu.losses.terms import (
    DISOCC_THRESH,
    charbonnier_loss,
    create_border_mask,
    create_outgoing_mask,
    gradient_loss,
    length_sq,
    photometric_loss,
    second_order_loss,
    smoothness_loss,
    ternary_loss,
)

LOSS_KEYS = (
    "occ", "sym", "fb", "grad", "ternary", "photo", "smooth_1st", "smooth_2nd",
)

# Per-scale weights and census patch distances (SURVEY.md §2.2 P2 [MED]).
LAYER_WEIGHTS = (12.7, 4.35, 3.9, 3.4, 1.1)
LAYER_PATCH_DISTANCES = (3, 2, 2, 1, 1)

# Default term weights: the paper's UnFlow objective (census data term +
# 2nd-order smoothness + fb-consistency + occlusion prior).
DEFAULT_WEIGHTS = {
    "occ": 12.4,
    "sym": 0.0,
    "fb": 0.2,
    "grad": 0.0,
    "ternary": 1.0,
    "photo": 0.0,
    "smooth_1st": 0.0,
    "smooth_2nd": 3.0,
}


def compute_losses(
    im1: jax.Array,
    im2: jax.Array,
    flow_fw: jax.Array,
    flow_bw: jax.Array,
    border_mask: jax.Array | None = None,
    mask_occlusion: str = "fb",
    data_max_distance: int = 1,
    weights: dict[str, float] | None = None,
) -> dict[str, jax.Array]:
    """Loss terms at one pyramid scale; flows in this scale's pixels.

    Reference: src/e2eflow/core/losses.py::compute_losses.
    ``mask_occlusion``: 'fb' (forward-backward consistency, the paper
    default), 'disocc' (forward-warp density), or '' (no masking).

    ``weights``: when given, terms with weight 0 are skipped entirely —
    they would otherwise still run in the hot path (the logged values
    block XLA dead-code elimination). None computes every term.
    """

    def active(key: str) -> bool:
        return weights is None or bool(weights.get(key, 0.0))
    # One gather per direction: the image and the opposite-direction flow
    # are warped by the same flow field, so concatenate channels (XLA TPU
    # gathers pay per launch; 2 launches instead of 4 per scale). A
    # data/src split (separate no-gradient image gather to shrink the
    # backward scatter) was tried and is a net LOSS: the TPU scatter is
    # per-index bound (~2.2 ms for 184k indices whether 8 or 20
    # channels), so the split only added two forward gather launches.
    warped_fw = backward_warp(jnp.concatenate([im2, flow_bw], -1), flow_fw)
    warped_bw = backward_warp(jnp.concatenate([im1, flow_fw], -1), flow_bw)
    c = im1.shape[-1]
    im2_warped, flow_bw_warped = warped_fw[..., :c], warped_fw[..., c:]
    im1_warped, flow_fw_warped = warped_bw[..., :c], warped_bw[..., c:]
    im_diff_fw = im1 - im2_warped
    im_diff_bw = im2 - im1_warped
    flow_diff_fw = flow_fw + flow_bw_warped
    flow_diff_bw = flow_bw + flow_fw_warped

    mag_sq_fw = length_sq(flow_fw) + length_sq(flow_bw_warped)
    mag_sq_bw = length_sq(flow_bw) + length_sq(flow_fw_warped)
    occ_thresh_fw = 0.01 * mag_sq_fw + 0.5
    occ_thresh_bw = 0.01 * mag_sq_bw + 0.5
    occ_fw = (length_sq(flow_diff_fw) > occ_thresh_fw).astype(im1.dtype)
    occ_bw = (length_sq(flow_diff_bw) > occ_thresh_bw).astype(im1.dtype)

    if border_mask is None:
        mask_fw = create_outgoing_mask(flow_fw)
        mask_bw = create_outgoing_mask(flow_bw)
    else:
        mask_fw = border_mask * create_outgoing_mask(flow_fw)
        mask_bw = border_mask * create_outgoing_mask(flow_bw)

    if mask_occlusion == "fb":
        mask_fw = mask_fw * (1.0 - occ_fw)
        mask_bw = mask_bw * (1.0 - occ_bw)
    elif mask_occlusion == "disocc":
        # Pixels in frame 1 nothing maps to under the backward flow are
        # disoccluded -> exclude from the forward data term
        # (src/e2eflow/core/losses.py, DISOCC_THRESH; [MED]).
        disocc_fw = (forward_warp(flow_bw) < DISOCC_THRESH).astype(im1.dtype)
        disocc_bw = (forward_warp(flow_fw) < DISOCC_THRESH).astype(im1.dtype)
        mask_fw = mask_fw * (1.0 - disocc_fw)
        mask_bw = mask_bw * (1.0 - disocc_bw)
    elif mask_occlusion not in ("", "none", None):
        raise ValueError(f"unknown mask_occlusion mode {mask_occlusion!r}")

    losses = {}
    if active("occ"):
        # Constant penalty on the occlusion estimate so masking is not free.
        losses["occ"] = charbonnier_loss(occ_fw) + charbonnier_loss(occ_bw)
    if active("sym"):
        # Symmetry between the two occlusion estimates ([LOW] recollection;
        # default weight 0 — kept for config parity with the reference).
        losses["sym"] = charbonnier_loss(occ_fw - occ_bw)
    if active("fb"):
        losses["fb"] = charbonnier_loss(flow_diff_fw, mask_fw) + charbonnier_loss(
            flow_diff_bw, mask_bw
        )
    if active("grad"):
        losses["grad"] = gradient_loss(im1, im2_warped, mask_fw) + gradient_loss(
            im2, im1_warped, mask_bw
        )
    if active("ternary"):
        losses["ternary"] = ternary_loss(
            im1, im2_warped, mask_fw, data_max_distance
        ) + ternary_loss(im2, im1_warped, mask_bw, data_max_distance)
    if active("photo"):
        losses["photo"] = photometric_loss(im_diff_fw, mask_fw) + photometric_loss(
            im_diff_bw, mask_bw
        )
    if active("smooth_1st"):
        losses["smooth_1st"] = smoothness_loss(flow_fw) + smoothness_loss(flow_bw)
    if active("smooth_2nd"):
        losses["smooth_2nd"] = second_order_loss(flow_fw) + second_order_loss(flow_bw)
    return losses


def unsupervised_loss(
    im1: jax.Array,
    im2: jax.Array,
    flows_fw: Sequence[jax.Array],
    flows_bw: Sequence[jax.Array],
    weights: dict[str, float] | None = None,
    mask_occlusion: str = "fb",
    border_ratio: float = 0.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Weighted multi-scale bidirectional loss for one cascade stage.

    Reference: src/e2eflow/core/unsupervised.py::unsupervised_loss.
    ``flows_fw``/``flows_bw``: 5-scale pyramids, finest (1/4 res) first,
    in raw network units. ``im1``/``im2``: full-resolution images (the
    geometrically- but not photometrically-augmented pair).

    Returns (total_loss, per-term/per-scale scalars for logging).
    """
    weights = {**DEFAULT_WEIGHTS, **(weights or {})}
    total = jnp.zeros((), jnp.float32)
    logs: dict[str, jax.Array] = {}

    # Image pyramid built successively (exact for equal block sizes:
    # mean of 2x2 means over 4x4 blocks == mean over 8x8) — measured
    # ~2.5x cheaper than downsampling full-res frames per level.
    im1_s = im2_s = None
    for i, (ffw, fbw) in enumerate(zip(flows_fw, flows_bw)):
        step_f = 4 if i == 0 else 2
        im1_s = downsample(im1 if i == 0 else im1_s, step_f)
        im2_s = downsample(im2 if i == 0 else im2_s, step_f)
        flow_fw_px = ffw * (FLOW_SCALE / (2**i))
        flow_bw_px = fbw * (FLOW_SCALE / (2**i))

        border = None
        if border_ratio > 0:
            dist = int(min(im1_s.shape[1], im1_s.shape[2]) * border_ratio)
            if dist > 0:
                border = create_border_mask(im1_s.shape, dist, im1_s.dtype)

        terms = compute_losses(
            im1_s, im2_s, flow_fw_px, flow_bw_px,
            border_mask=border,
            mask_occlusion=mask_occlusion,
            data_max_distance=LAYER_PATCH_DISTANCES[i],
            weights=weights,
        )
        scale_total = jnp.zeros((), jnp.float32)
        for key, value in terms.items():
            scale_total = scale_total + weights[key] * value
            logs[f"{key}/scale{i}"] = value
        total = total + LAYER_WEIGHTS[i] * scale_total

    logs["total"] = total
    return total, logs
