"""Stride-2 SAME conv with a phase-decomposed data-gradient VJP.

Why this exists (TPU ceiling work, no reference counterpart — the
reference's convs are cuDNN, `src/e2eflow/core/flownet.py` encoder):
XLA lowers the *data gradient* of a stride-2 convolution as a
convolution over the zero-dilated cotangent (lhs_dilation=2), which on
the MXU costs 4x the forward conv's FLOPs — and ~75% of them multiply
interleaved zeros. The two 5x5/2 encoder convs' data gradients alone
are 21.8% of the whole UnFlow-C train step's analytic FLOPs
(scripts/flops_breakdown.py), making this the single largest known
waste in the lowering.

The fix is the same subpixel-phase factorization the decoder's
``_PhaseDeconv`` uses for transposed convs (models/flownet.py), applied
to the gradient: split dx by input-pixel parity phase (py, px) in
{0,1}^2. For a fixed phase, the kernel taps that can touch it have
fixed parity too, so each phase of dx is ONE dense stride-1 conv of dy
with a small sub-kernel (for K=5: 3x3 / 3x2 / 2x3 / 2x2 — 25 taps
total, exactly the forward's work). Two variants:

  * ``phase``        — 4 exact sub-kernel convs, then interleave.
                       FLOPs == forward conv (4x saving vs dilated).
  * ``phase_folded`` — the 4 sub-kernels zero-padded to a common
                       (ceil(K/2))^2 footprint and stacked on the
                       output-channel axis: ONE conv to 4C channels +
                       interleave (bigger matmul, 1.3-1.8x forward
                       FLOPs — still 2.2-3x better than dilated).

The forward pass and the filter gradient are untouched XLA lowerings
(the filter gradient is already dense). Numerics: identical contraction
structure to XLA's own transposed conv up to float summation order —
parity-tested against ``jax.grad`` of the plain conv in
tests/test_ops_conv2d.py, both f32 (tight tol) and bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def _same_pad_lo(size: int, k: int) -> tuple[int, int, int]:
    """(out_size, pad_lo, pad_hi) of a stride-2 SAME conv along one dim
    (TF/XLA SAME: the extra padding goes on the high side)."""
    out = -(-size // 2)
    total = max((out - 1) * 2 + k - size, 0)
    lo = total // 2
    return out, lo, total - lo


def _fwd_conv(x: jax.Array, w: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding="SAME", dimension_numbers=_DIMS
    )


def _phase_geometry(size: int, k: int, phase: int):
    """Per-phase data-grad conv geometry along one spatial dim.

    dx[2u + phase] = sum_a dy[u + t - a] * w[2a + q]  (OOB -> 0), with
    q = (phase + pad_lo) % 2, a in [0, n_taps), t = (phase+pad_lo-q)//2.
    Expressed as a stride-1 conv over dy with the sub-kernel flipped:
    pad_lo_dy = n_taps - 1 - t (>= 0 for every SAME stride-2 case).
    Returns (q, n_taps, out_len, pad_lo_dy, pad_hi_dy).
    """
    out_size, pad_lo, _ = _same_pad_lo(size, k)
    q = (phase + pad_lo) % 2
    n_taps = (k - q + 1) // 2
    t = (phase + pad_lo - q) // 2
    pl = n_taps - 1 - t
    assert pl >= 0, (size, k, phase)
    out_len = (size - phase + 1) // 2  # rows of dx with this parity
    ph = out_len - out_size - pl + n_taps - 1
    return q, n_taps, out_len, pl, ph


def _interleave_phases(phases: dict, b: int, h: int, w: int, c: int) -> jax.Array:
    """phases[(py, px)] of shape (B, ceil-ish, ceil-ish, C) -> (B,H,W,C)."""
    hp, wp = -(-h // 2), -(-w // 2)

    def padto(p):
        return jnp.pad(
            p, ((0, 0), (0, hp - p.shape[1]), (0, wp - p.shape[2]), (0, 0))
        )

    r0 = jnp.stack([padto(phases[(0, 0)]), padto(phases[(0, 1)])], 3)
    r1 = jnp.stack([padto(phases[(1, 0)]), padto(phases[(1, 1)])], 3)
    out = jnp.stack(
        [r0.reshape(b, hp, 2 * wp, c), r1.reshape(b, hp, 2 * wp, c)], 2
    )
    return out.reshape(b, 2 * hp, 2 * wp, c)[:, :h, :w]


def _data_grad_phase(dy: jax.Array, w: jax.Array, x_shape) -> jax.Array:
    """dx via 4 exact sub-kernel convs (FLOPs == forward conv)."""
    b, h, wd, c = x_shape
    k = w.shape[0]
    phases = {}
    for py in (0, 1):
        qy, _, hp, ply, phy = _phase_geometry(h, k, py)
        for px in (0, 1):
            qx, _, wp, plx, phx = _phase_geometry(wd, k, px)
            sub = w[qy::2, qx::2]  # (na_y, na_x, C, F)
            kern = sub[::-1, ::-1].transpose(0, 1, 3, 2)  # HWIO, I=F, O=C
            out = lax.conv_general_dilated(
                dy, kern, window_strides=(1, 1),
                padding=((ply, max(phy, 0)), (plx, max(phx, 0))),
                dimension_numbers=_DIMS,
            )
            phases[(py, px)] = out[:, :hp, :wp]
    return _interleave_phases(phases, b, h, wd, c)


def _data_grad_phase_folded(dy: jax.Array, w: jax.Array, x_shape) -> jax.Array:
    """dx via ONE conv to 4C channels (sub-kernels zero-padded to a
    common footprint, aligned so every phase shares the same output
    index), then interleave."""
    b, h, wd, c = x_shape
    k = w.shape[0]
    f = w.shape[3]
    na_max = (k + 1) // 2

    geo_y = {p: _phase_geometry(h, k, p) for p in (0, 1)}
    geo_x = {p: _phase_geometry(wd, k, p) for p in (0, 1)}
    # Shared dy padding: the deepest per-phase reach-back, and enough
    # high-side rows for the longest phase at the shared kernel size.
    pl_y = max(g[3] for g in geo_y.values())
    pl_x = max(g[3] for g in geo_x.values())
    hp_max = max(g[2] for g in geo_y.values())
    wp_max = max(g[2] for g in geo_x.values())
    ho, _, _ = _same_pad_lo(h, k)
    wo, _, _ = _same_pad_lo(wd, k)
    ph_y = hp_max - ho - pl_y + na_max - 1
    ph_x = wp_max - wo - pl_x + na_max - 1

    kern = jnp.zeros((na_max, na_max, f, 4 * c), w.dtype)
    for py in (0, 1):
        qy, nay, _, ply, _ = geo_y[py]
        oy = pl_y - ply  # offset that keeps this phase on the shared index
        for px in (0, 1):
            qx, nax, _, plx, _ = geo_x[px]
            ox = pl_x - plx
            sub = w[qy::2, qx::2][::-1, ::-1].transpose(0, 1, 3, 2)
            kern = kern.at[
                oy : oy + nay, ox : ox + nax, :, (2 * py + px) * c : (2 * py + px + 1) * c
            ].set(sub)
    out = lax.conv_general_dilated(
        dy, kern, window_strides=(1, 1),
        padding=((pl_y, max(ph_y, 0)), (pl_x, max(ph_x, 0))),
        dimension_numbers=_DIMS,
    )  # (B, >=hp_max, >=wp_max, 4C)
    phases = {
        (py, px): out[:, : geo_y[py][2], : geo_x[px][2],
                      (2 * py + px) * c : (2 * py + px + 1) * c]
        for py in (0, 1) for px in (0, 1)
    }
    return _interleave_phases(phases, b, h, wd, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_s2_same(x: jax.Array, w: jax.Array, bwd_impl: str = "phase") -> jax.Array:
    """Stride-2 SAME NHWC/HWIO conv; identical to
    ``lax.conv_general_dilated(..., (2, 2), "SAME")`` forward, with the
    data gradient computed by ``bwd_impl``: "phase" (4 exact sub-kernel
    convs) or "phase_folded" (one 4C-channel conv)."""
    return _fwd_conv(x, w)


def _conv_fwd(x, w, bwd_impl):
    return _fwd_conv(x, w), (x, w)


def _conv_bwd(bwd_impl, res, dy):
    x, w = res
    grad = _data_grad_phase_folded if bwd_impl == "phase_folded" else _data_grad_phase
    dx = grad(dy, w, x.shape)
    # Filter gradient: XLA's own (already dense) lowering. The conv is
    # linear in w, so linear_transpose gives exactly the standard
    # filter-grad conv WITHOUT re-evaluating the forward (jax.vjp would
    # cost one extra forward conv per layer per step).
    (dw,) = jax.linear_transpose(lambda w_: _fwd_conv(x, w_), w)(dy)
    return dx, dw


conv2d_s2_same.defvjp(_conv_fwd, _conv_bwd)
