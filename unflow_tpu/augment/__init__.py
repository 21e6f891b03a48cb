"""On-device data augmentation (runs inside the jitted train step).

Reference: simonmeister/UnFlow ``src/e2eflow/core/augment.py::
random_photometric`` (contrast, additive brightness, per-channel colour,
gamma, gaussian noise — identical parameters across the frame pair) and
the crop/flip geometric augmentation from ``core/input.py``
(SURVEY.md §2.2 P5; parameter defaults are [MED] recollections).

TPU design: the reference augments on the TF graph CPU side; here
augmentation is pure jnp traced into the train step, so it runs on-chip
fused with the first conv's input pipeline, and is keyed by the step's
PRNG — deterministic given (seed, step).

Convention: images enter in [0, 1]; photometric outputs are clipped
back to [0, 1]. Horizontal flips negate the u component of ground-truth
flow (supervised pipelines).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def random_photometric(
    key: jax.Array,
    ims: Sequence[jax.Array],
    noise_stddev: float = 0.04,
    min_contrast: float = -0.3,
    max_contrast: float = 0.3,
    brightness_stddev: float = 0.02,
    min_colour: float = 0.9,
    max_colour: float = 1.1,
    min_gamma: float = 0.7,
    max_gamma: float = 1.5,
) -> list[jax.Array]:
    """Apply one random photometric transform to every image in ``ims``.

    The same per-example parameters are shared across the pair (the
    reference draws one parameter set per example and applies it to both
    frames); independent gaussian noise is added per frame.
    """
    b = ims[0].shape[0]
    c = ims[0].shape[-1]
    k_contrast, k_gamma, k_bright, k_colour, k_noise = jax.random.split(key, 5)

    contrast = jax.random.uniform(
        k_contrast, (b, 1, 1, 1), minval=min_contrast, maxval=max_contrast
    )
    gamma = jax.random.uniform(k_gamma, (b, 1, 1, 1), minval=min_gamma, maxval=max_gamma)
    gamma_inv = 1.0 / gamma
    bright = brightness_stddev * jax.random.normal(k_bright, (b, 1, 1, 1))
    colour = jax.random.uniform(
        k_colour, (b, 1, 1, c), minval=min_colour, maxval=max_colour
    )

    out = []
    for i, im in enumerate(ims):
        noise_key = jax.random.fold_in(k_noise, i)
        im = (im * (1.0 + contrast) + bright) * colour
        im = jnp.clip(im, 0.0, 1.0) ** gamma_inv
        if noise_stddev > 0:
            im = im + noise_stddev * jax.random.normal(noise_key, im.shape)
        out.append(jnp.clip(im, 0.0, 1.0))
    return out


def random_crop_flip(
    key: jax.Array,
    ims: Sequence[jax.Array],
    crop_hw: tuple[int, int],
    horizontal_flip: bool = True,
    flows: Sequence[jax.Array] | None = None,
):
    """Shared random crop (+ optional horizontal flip) across the pair.

    One crop offset / flip decision per batch (static shapes under jit;
    the offset is a traced scalar fed to dynamic_slice). GT flows get
    their u component negated under flips.

    Returns (cropped_ims, cropped_flows_or_None).
    """
    b, h, w, _ = ims[0].shape
    ch, cw = crop_hw
    if ch > h or cw > w:
        raise ValueError(f"crop {crop_hw} larger than image {(h, w)}")
    k_off, k_flip = jax.random.split(key)
    oy = jax.random.randint(k_off, (), 0, h - ch + 1)
    ox = jax.random.randint(jax.random.fold_in(k_off, 1), (), 0, w - cw + 1)
    do_flip = horizontal_flip & (jax.random.uniform(k_flip, ()) < 0.5)

    def crop(x):
        sizes = (x.shape[0], ch, cw, x.shape[3])
        out = jax.lax.dynamic_slice(x, (0, oy, ox, 0), sizes)
        return jax.lax.cond(do_flip, lambda v: v[:, :, ::-1, :], lambda v: v, out)

    out_ims = [crop(im) for im in ims]
    out_flows = None
    if flows is not None:
        out_flows = []
        for f in flows:
            fc = crop(f)
            fc = jax.lax.cond(
                do_flip,
                lambda v: v * jnp.array([-1.0, 1.0], v.dtype),
                lambda v: v,
                fc,
            )
            out_flows.append(fc)
    return out_ims, out_flows


def normalize(im: jax.Array, mean: Sequence[float], stddev: float) -> jax.Array:
    """Dataset mean/std normalization (reference: Input.get_normalization)."""
    return (im * 255.0 - jnp.asarray(mean, im.dtype)) / stddev


def random_order_swap(
    key: jax.Array, im1: jax.Array, im2: jax.Array, prob: float
) -> tuple[jax.Array, jax.Array]:
    """Per-example temporal order-swap: with probability ``prob`` an
    example trains on (im2, im1) instead of (im1, im2).

    Reference: core/input.py's optional image swapping (SURVEY §2.2 P8).
    Unsupervised-only — the bidirectional objective is direction-
    symmetric; GT flow is not. An elementwise select on the (sharded)
    batch axis, so it lowers GSPMD-clean with no resharding.
    """
    swap = jax.random.bernoulli(key, prob, (im1.shape[0], 1, 1, 1))
    return jnp.where(swap, im2, im1), jnp.where(swap, im1, im2)


from unflow_tpu.augment.affine import (  # noqa: E402
    apply_affine,
    random_affine,
    sample_affine_params,
)

__all__ = [
    "random_photometric",
    "random_crop_flip",
    "random_order_swap",
    "normalize",
    "random_affine",
    "apply_affine",
    "sample_affine_params",
]
