"""On-device affine geometric augmentation (rotation / zoom / translation).

Reference: simonmeister/UnFlow ``src/e2eflow/core/augment.py`` geometric
augmentation — one *global* affine transform shared by the frame pair
plus a small *relative* transform applied to frame 2 only (so the pair's
apparent motion changes), with ground-truth flow remapped accordingly
for supervised training (SURVEY.md §2.2 P5; parameter ranges are [MED]
recollections, so every range defaults to "off" and is set per config).

TPU design: the transform is resolved to a dense coordinate map and
resampled with the same bilinear-gather machinery as
:func:`unflow_tpu.ops.warp.backward_warp` — pure jnp inside the jitted
train step (no host round-trip, fuses with the input pipeline).

Math
----
Each output pixel x samples the source at ``W_i(x) = A_i (x - c) + c + t_i``
(centered affine; c = image center, i = frame index). With ground-truth
flow f mapping frame-1 points p to frame-2 points p + f(p):

    f'(x) = W2^{-1}( W1(x) + f(W1(x)) ) - x
          = A2^{-1} ( A1 (x - c) + t1 - t2 + f(W1(x)) ) + c - x

Out-of-source samples are zero-filled (images) and invalidated (masks).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class AffineParams(NamedTuple):
    """Per-example 2x2 matrices and translations, frames 1 and 2."""

    a1: jax.Array  # (B, 2, 2)
    t1: jax.Array  # (B, 2)
    a2: jax.Array  # (B, 2, 2)
    t2: jax.Array  # (B, 2)


def _rot_scale(angle: jax.Array, scale: jax.Array) -> jax.Array:
    """(B,) angle [rad], (B,) scale -> (B, 2, 2) scale * rotation."""
    c = jnp.cos(angle) * scale
    s = jnp.sin(angle) * scale
    return jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )


def _inv2x2(a: jax.Array) -> jax.Array:
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    inv = jnp.stack(
        [
            jnp.stack([a[..., 1, 1], -a[..., 0, 1]], -1),
            jnp.stack([-a[..., 1, 0], a[..., 0, 0]], -1),
        ],
        axis=-2,
    )
    return inv / det[..., None, None]


def sample_affine_params(
    key: jax.Array,
    batch: int,
    hw: tuple[int, int],
    translate: float = 0.0,
    rotate_deg: float = 0.0,
    zoom_min: float = 1.0,
    zoom_max: float = 1.0,
    rel_translate: float = 0.0,
    rel_rotate_deg: float = 0.0,
    rel_zoom: float = 0.0,
) -> AffineParams:
    """Draw per-example global + relative affine parameters.

    ``translate`` / ``rel_translate`` are fractions of min(H, W);
    rotations in degrees; zoom drawn log-uniform in [zoom_min, zoom_max],
    relative zoom log-uniform in [1-rel_zoom, 1+rel_zoom]. The matrices
    map OUTPUT coords to SOURCE coords, so a sampled "zoom in" by z uses
    scale 1/z.
    """
    h, w = hw
    ext = float(min(h, w))
    keys = jax.random.split(key, 6)
    deg = jnp.pi / 180.0

    ang = jax.random.uniform(
        keys[0], (batch,), minval=-rotate_deg * deg, maxval=rotate_deg * deg
    )
    zoom = jnp.exp(
        jax.random.uniform(
            keys[1], (batch,),
            minval=jnp.log(zoom_min), maxval=jnp.log(zoom_max),
        )
    )
    t_glob = jax.random.uniform(
        keys[2], (batch, 2), minval=-translate * ext, maxval=translate * ext
    )
    d_ang = jax.random.uniform(
        keys[3], (batch,),
        minval=-rel_rotate_deg * deg, maxval=rel_rotate_deg * deg,
    )
    d_zoom = jnp.exp(
        jax.random.uniform(
            keys[4], (batch,),
            minval=jnp.log(jnp.maximum(1.0 - rel_zoom, 1e-3)),
            maxval=jnp.log(1.0 + rel_zoom),
        )
    )
    d_t = jax.random.uniform(
        keys[5], (batch, 2),
        minval=-rel_translate * ext, maxval=rel_translate * ext,
    )

    a1 = _rot_scale(ang, 1.0 / zoom)
    a2 = _rot_scale(ang + d_ang, 1.0 / (zoom * d_zoom))
    return AffineParams(a1, t_glob, a2, t_glob + d_t)


def _source_coords(a: jax.Array, t: jax.Array, hw: tuple[int, int]):
    """Source-coordinate maps (xs, ys), each (B, H, W), for W(x)=A(x-c)+c+t."""
    h, w = hw
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None] - cy
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :] - cx
    # Convention: coordinate vector (x, y) = (u along W, v along H),
    # matching the flow channel order.
    xs = a[:, 0, 0, None, None] * gx + a[:, 0, 1, None, None] * gy + cx + t[:, 0, None, None]
    ys = a[:, 1, 0, None, None] * gx + a[:, 1, 1, None, None] * gy + cy + t[:, 1, None, None]
    return xs, ys


def _bilinear_at(im: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    """Sample (B,H,W,C) image at float coords; zero outside the frame."""
    from unflow_tpu.ops.warp import backward_warp_packed

    b, h, w, _ = im.shape
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    flow_equiv = jnp.stack([xs - gx, ys - gy], axis=-1)
    # Packed single-gather formulation (same edge-clamp semantics as the
    # 4-gather oracle, measured 2.4x cheaper — this runs at the full
    # pre-crop resolution inside every augmented train step).
    out = backward_warp_packed(im, flow_equiv)
    inside = (
        (xs >= 0.0) & (xs <= w - 1.0) & (ys >= 0.0) & (ys <= h - 1.0)
    ).astype(im.dtype)[..., None]
    return out * inside


def apply_affine(
    params: AffineParams,
    ims: Sequence[jax.Array],
    flows: Sequence[jax.Array] | None = None,
    masks: Sequence[jax.Array] | None = None,
):
    """Resample (im1, im2) with (A1,t1)/(A2,t2); remap GT flow + mask.

    ims: [im1, im2] (B, H, W, C). flows/masks: frame-1-anchored GT.
    Returns (ims', flows', masks'). masks' is None only when neither
    masks nor flows were given: remapped flow is zero-filled where the
    pull-back W1(x) leaves the source frame, so flows WITHOUT a caller
    mask synthesize the inside-frame validity mask — training on the
    zero-filled samples at full weight would corrupt supervised GT.
    """
    im1, im2 = ims
    b, h, w, _ = im1.shape
    hw = (h, w)
    xs1, ys1 = _source_coords(params.a1, params.t1, hw)
    xs2, ys2 = _source_coords(params.a2, params.t2, hw)
    out_ims = [_bilinear_at(im1, xs1, ys1), _bilinear_at(im2, xs2, ys2)]

    inside1 = (
        (xs1 >= 0.0) & (xs1 <= w - 1.0) & (ys1 >= 0.0) & (ys1 <= h - 1.0)
    ).astype(jnp.float32)[..., None]
    out_flows = out_masks = None
    if flows is not None:
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        a2_inv = _inv2x2(params.a2)
        out_flows = []
        for f in flows:
            fp = _bilinear_at(f, xs1, ys1)  # f(W1(x)), zero outside
            # q - c - t2 with q = W1(x) + f(W1(x))
            qx = xs1 + fp[..., 0] - cx - params.t2[:, 0, None, None]
            qy = ys1 + fp[..., 1] - cy - params.t2[:, 1, None, None]
            fx = a2_inv[:, 0, 0, None, None] * qx + a2_inv[:, 0, 1, None, None] * qy + cx - gx
            fy = a2_inv[:, 1, 0, None, None] * qx + a2_inv[:, 1, 1, None, None] * qy + cy - gy
            out_flows.append(jnp.stack([fx, fy], axis=-1))
    if masks is not None:
        out_masks = []
        for m in masks:
            ms = _bilinear_at(m, xs1, ys1)
            # strict validity: every bilinear corner must be valid
            out_masks.append((ms > 0.999).astype(m.dtype) * inside1)
    elif flows is not None:
        out_masks = [inside1.astype(f.dtype) for f in out_flows]
    return out_ims, out_flows, out_masks


def random_affine(
    key: jax.Array,
    ims: Sequence[jax.Array],
    flows: Sequence[jax.Array] | None = None,
    masks: Sequence[jax.Array] | None = None,
    **ranges,
):
    """Draw params (see :func:`sample_affine_params`) and apply them."""
    b, h, w, _ = ims[0].shape
    params = sample_affine_params(key, b, (h, w), **ranges)
    return apply_affine(params, ims, flows, masks)


__all__ = [
    "AffineParams",
    "sample_affine_params",
    "apply_affine",
    "random_affine",
]
