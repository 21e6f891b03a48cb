"""Loss primitives: charbonnier, census/ternary, smoothness, masks.

Reference: simonmeister/UnFlow ``src/e2eflow/core/losses.py``
(``charbonnier_loss``, ``ternary_loss``/``_ternary_transform``/
``_hamming_distance``, ``photometric_loss``, ``gradient_loss``,
``smoothness_loss``, ``second_order_loss``, ``create_outgoing_mask``,
``create_border_mask``, ``length_sq``).

Constants follow SURVEY.md §2.2 P3 ([MED] confidence — re-verify against
the real source when available): census normalization 0.81, soft-hamming
0.1, charbonnier alpha 0.45 / beta 1.0 / eps 0.001, fb-occlusion
alpha1 0.01 / alpha2 0.5, disocclusion threshold 0.8.

All terms are pure elementwise/stencil math over dense fields — XLA
fuses them into a handful of VPU passes on TPU; no Pallas needed except
where they combine with the warp gathers (future fusion target).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DISOCC_THRESH = 0.8


def length_sq(x: jax.Array) -> jax.Array:
    return jnp.sum(jnp.square(x), axis=-1, keepdims=True)


def charbonnier_loss(
    x: jax.Array,
    mask: jax.Array | None = None,
    truncate: float | None = None,
    alpha: float = 0.45,
    beta: float = 1.0,
    epsilon: float = 0.001,
) -> jax.Array:
    """Generalized charbonnier: mean over all elements of ((x*beta)^2 + eps^2)^alpha.

    Matches the reference semantics: the normalization is the full
    element count regardless of the mask (src/e2eflow/core/losses.py::
    charbonnier_loss).
    """
    error = jnp.power(jnp.square(x * beta) + jnp.square(epsilon), alpha)
    if mask is not None:
        error = error * mask
    if truncate is not None:
        error = jnp.minimum(error, truncate)
    # max(size, 1): degenerate pyramid levels (1-px extents) produce empty
    # stencil slices; their loss is 0, not NaN.
    return jnp.sum(error) / max(error.size, 1)


def create_outgoing_mask(flow: jax.Array) -> jax.Array:
    """1.0 where the flow target stays inside the frame, else 0.0.

    Reference: src/e2eflow/core/losses.py::create_outgoing_mask.
    Returns (B, H, W, 1).
    """
    b, h, w, _ = flow.shape
    # f32 coordinates regardless of flow dtype: bf16 cannot represent
    # integer positions past 256, which would misplace the inside-frame
    # test by whole pixels on KITTI-width frames (same hazard
    # ops/warp.py::_sample_coords guards against).
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = gx + flow[..., 0].astype(jnp.float32)
    y = gy + flow[..., 1].astype(jnp.float32)
    inside = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    return inside[..., None].astype(flow.dtype)


def create_border_mask(shape: tuple, distance: int, dtype=jnp.float32) -> jax.Array:
    """1.0 away from the border, 0.0 within ``distance`` px of it.

    Reference: src/e2eflow/core/losses.py::create_border_mask (used to
    keep census patches fully inside the frame).
    """
    b, h, w = shape[0], shape[1], shape[2]
    # Clamp: 2*distance >= extent would make the .at[] slice empty and
    # silently zero every loss term masked by it (reachable on the
    # coarsest pyramid levels of small crops).
    distance = min(distance, (min(h, w) - 1) // 2)
    m = jnp.zeros((h, w), dtype)
    m = m.at[distance : h - distance, distance : w - distance].set(1.0)
    return jnp.broadcast_to(m[None, :, :, None], (b, h, w, 1))


# ---------------------------------------------------------------------------
# Census / ternary loss
# ---------------------------------------------------------------------------


def _to_grayscale(im: jax.Array) -> jax.Array:
    """RGB -> luminance scaled to [0, 255] as the reference transform does."""
    if im.shape[-1] == 3:
        gray = (
            0.2989 * im[..., 0:1] + 0.5870 * im[..., 1:2] + 0.1140 * im[..., 2:3]
        )
    else:
        gray = jnp.mean(im, axis=-1, keepdims=True)
    return gray * 255.0


def _extract_patches(x: jax.Array, radius: int) -> jax.Array:
    """(B, H, W, 1) -> (B, H, W, (2r+1)^2) neighborhood values (zero pad)."""
    k = 2 * radius + 1
    # conv_general_dilated_patches returns channels ordered (c, ky, kx).
    patches = lax.conv_general_dilated_patches(
        x, (k, k), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return patches


def ternary_transform(im: jax.Array, max_distance: int) -> jax.Array:
    """Normalized census transform over a (2d+1)^2 patch.

    Reference: src/e2eflow/core/losses.py::_ternary_transform —
    per-neighbor intensity difference, normalized d / sqrt(0.81 + d^2).
    """
    gray = _to_grayscale(im)
    patches = _extract_patches(gray, max_distance)
    diff = patches - gray
    return diff / jnp.sqrt(0.81 + jnp.square(diff))


def hamming_distance_soft(t1: jax.Array, t2: jax.Array) -> jax.Array:
    """Soft hamming: sum_k (d_k^2 / (0.1 + d_k^2)).

    Reference: src/e2eflow/core/losses.py::_hamming_distance.
    """
    sq = jnp.square(t1 - t2)
    return jnp.sum(sq / (0.1 + sq), axis=-1, keepdims=True)


def ternary_loss(
    im1: jax.Array, im2_warped: jax.Array, mask: jax.Array, max_distance: int = 1
) -> jax.Array:
    """Census data loss between frame 1 and the warped frame 2.

    Reference: src/e2eflow/core/losses.py::ternary_loss. The mask is
    shrunk by ``max_distance`` so every compared patch is fully inside
    the frame.
    """
    t1 = ternary_transform(im1, max_distance)
    t2 = ternary_transform(im2_warped, max_distance)
    dist = hamming_distance_soft(t1, t2)
    border = create_border_mask(im1.shape, max_distance, im1.dtype)
    return charbonnier_loss(dist, mask * border, truncate=None)


# ---------------------------------------------------------------------------
# Photometric / gradient data losses
# ---------------------------------------------------------------------------


def photometric_loss(im_diff: jax.Array, mask: jax.Array) -> jax.Array:
    """Reference: src/e2eflow/core/losses.py::photometric_loss."""
    return charbonnier_loss(im_diff, mask, beta=255.0)


def _image_grads(im: jax.Array):
    gx = im[:, :, 1:, :] - im[:, :, :-1, :]
    gy = im[:, 1:, :, :] - im[:, :-1, :, :]
    return gx, gy


def gradient_loss(im1: jax.Array, im2_warped: jax.Array, mask: jax.Array) -> jax.Array:
    """Image-gradient data term (src/e2eflow/core/losses.py::gradient_loss)."""
    g1x, g1y = _image_grads(im1)
    g2x, g2y = _image_grads(im2_warped)
    lx = charbonnier_loss(g1x - g2x, mask[:, :, 1:, :], beta=255.0)
    ly = charbonnier_loss(g1y - g2y, mask[:, 1:, :, :], beta=255.0)
    return lx + ly


# ---------------------------------------------------------------------------
# Smoothness priors
# ---------------------------------------------------------------------------


def smoothness_loss(flow: jax.Array) -> jax.Array:
    """First-order flow smoothness (src/e2eflow/core/losses.py::smoothness_loss).

    Reference scaling: the two directional terms are SUMMED (each a
    charbonnier mean), not averaged — the shipped smooth/smooth_2nd
    weights assume this, so halving here would silently train at half
    the paper's regularization strength.
    """
    dx = flow[:, :, 1:, :] - flow[:, :, :-1, :]
    dy = flow[:, 1:, :, :] - flow[:, :-1, :, :]
    return charbonnier_loss(dx) + charbonnier_loss(dy)


def second_order_loss(flow: jax.Array) -> jax.Array:
    """Second-order smoothness: 3-point stencils along h, v and both
    diagonals (src/e2eflow/core/losses.py::second_order_loss).

    Reference scaling: charbonnier_loss(delta_u) + charbonnier_loss(
    delta_v), each a mean over (B, H, W, 4 stencils) — i.e. 2x the mean
    over everything. The per-stencil means below each average u and v
    jointly, so summing the 4 and halving reproduces it exactly.
    """
    h = flow[:, :, 2:, :] - 2.0 * flow[:, :, 1:-1, :] + flow[:, :, :-2, :]
    v = flow[:, 2:, :, :] - 2.0 * flow[:, 1:-1, :, :] + flow[:, :-2, :, :]
    d1 = flow[:, 2:, 2:, :] - 2.0 * flow[:, 1:-1, 1:-1, :] + flow[:, :-2, :-2, :]
    d2 = flow[:, 2:, :-2, :] - 2.0 * flow[:, 1:-1, 1:-1, :] + flow[:, :-2, 2:, :]
    return (
        charbonnier_loss(h)
        + charbonnier_loss(v)
        + charbonnier_loss(d1)
        + charbonnier_loss(d2)
    ) / 2.0
