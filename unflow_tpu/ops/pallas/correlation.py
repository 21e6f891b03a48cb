"""Fused Pallas TPU kernels for the FlowNetC correlation cost volume.

Replaces the reference CUDA kernels in
``src/e2eflow/ops/correlation_op.cu.cc`` (forward + CorrelationGrad).

Design
------
The op computes, for displacement grid (dy, dx) in
``{-P, ..., +P}`` step ``s`` (D = 2*(P//s)+1 values per axis):

    out[b, y, x, dy*D+dx] = (1/C) * sum_c f1[b,y,x,c] * f2[b,y+dy,x+dx,c]

A naive XLA lowering re-reads the f2 feature map from HBM once per
displacement (441x HBM traffic for the FlowNetC config). These kernels
instead stage a halo window of the second operand in VMEM once per row
stripe and compute every displacement from on-chip memory:

  * Layout ``(B, rows, C, W)``: rows sit on the *untiled* leading axes
    (Mosaic allows arbitrary dynamic offsets there), C is the sublane
    axis so the channel reduction needs no relayout, W is the lane axis
    (static unaligned shifts of in-register values are supported).
  * The dy displacement axis is folded into the innermost grid
    dimension: each grid step emits one row (D channels) of the cost
    volume; the halo window and accumulators persist in VMEM scratch
    across dy steps (the window DMA runs only at dy == 0).
  * Mosaic requires manual-DMA extents to be multiples of 128 on the
    lane axis (and 8 on sublanes), so manually-copied arrays are padded
    to 128-multiple widths by the wrapper.
  * Channels are processed in chunks of <=128 (partial cost volumes are
    summed, gradients concatenated, outside the kernel) which bounds the
    VMEM window at ~6.5 MB for FlowNetC shapes: total HBM traffic for f2
    is unchanged (each chunk is read once).

The custom VJP runs two sibling kernels:

  * d f1[y,x,c]  = (1/C) * sum_d g[d, y, x]       * f2[y+dy, x+dx, c]
  * d f2[u,v,c]  = (1/C) * sum_d g[d, u-dy, v-dx] * f1[u-dy, v-dx, c]

— the same shifted-window accumulation with flipped offsets (the f2
gradient reads zero-padded g/f1 so every shift stays in-window).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# CPU tests exercise these kernels through the Pallas interpreter.
_INTERPRET = jax.default_backend() != "tpu"

_MAX_CHUNK = 128  # channels per kernel invocation


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _row_tile(h: int) -> tuple[int, int]:
    if h % 8 == 0:
        return 8, h
    if h < 8:
        return h, h
    return 8, _round_up(h, 8)


def _split_channels(x: jax.Array, max_chunk: int = _MAX_CHUNK):
    """Pad C to a sublane multiple and split into <=max_chunk chunks."""
    c = x.shape[-1]
    ck = min(max_chunk, _round_up(c, 8))
    cp = _round_up(c, ck)
    if cp != c:
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, cp - c),))
    return [x[..., i : i + ck] for i in range(0, cp, ck)]


def _prep(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H, C, W) (rows untiled, W on lanes).

    bfloat16 inputs stay bf16 (halves the VMEM window and runs the VPU
    multiplies ~1.45x faster on this chip; accumulation is f32 either
    way); everything else is computed in f32.
    """
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    return jnp.transpose(x, (0, 1, 3, 2)).astype(dt)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _corr_fwd_chunk(f1: jax.Array, f2: jax.Array, P: int, s: int, inv_c: float):
    """Unnormalized-per-chunk cost volume; f1/f2 are (B, H, W, Cchunk)."""
    b, h, w, c = f1.shape
    d = 2 * (P // s) + 1

    th, hp = _row_tile(h)
    wl = _round_up(w + 2 * P, 128)
    f1t = jnp.pad(_prep(f1), ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    f2p = jnp.pad(_prep(f2), ((0, 0), (P, P + hp - h), (0, 0), (P, wl - w - P)))

    wh = th + 2 * P

    def kernel(f1_ref, f2p_ref, out_ref, f2w, sem):
        bi, i, dy = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when(dy == 0)
        def _():
            cp = pltpu.make_async_copy(
                f2p_ref.at[bi, pl.ds(i * th, wh), :, :], f2w, sem
            )
            cp.start()
            cp.wait()

        f1b = f1_ref[0]  # (TH, C, W)
        rows = f2w[pl.ds(dy * s, th), :, :]  # (TH, C, WL)
        for dx in range(d):
            f2s = rows[:, :, dx * s : dx * s + w]
            out_ref[0, dx, :, :] = jnp.sum(f1b * f2s, axis=1, dtype=jnp.float32) * inv_c

    out = pl.pallas_call(
        kernel,
        grid=(b, hp // th, d),
        in_specs=[
            pl.BlockSpec((1, th, c, w), lambda bi, i, dy: (bi, i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, d, th, w), lambda bi, i, dy: (bi, dy, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d * d, hp, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((wh, c, wl), f2p.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_INTERPRET,
    )(f1t, f2p)

    return out[:, :, :h, :]  # (B, D*D, H, W)


def _mxu_chunk(dtype) -> int:
    # bf16 windows are half the bytes -> a full 256-channel pass fits VMEM.
    return 256 if dtype == jnp.bfloat16 else 128


def _mxu_ok(dtype, h: int, w: int, P: int, s: int, c: int) -> bool:
    """Gate for the MXU kernels: bf16 only (f32 would need 3-pass
    matmuls whose VMEM stack overflows; the VPU kernels keep f32 exact),
    supported geometry, AND channel chunks whose lane extent is a
    128-multiple — the MXU kernels manually DMA windows with C on the
    lane axis, and Mosaic rejects non-128-multiple async-copy lane
    extents (empirical rule, module docstring)."""
    if dtype != jnp.bfloat16:
        return False
    from unflow_tpu.ops.pallas import correlation_mxu as mxu

    if not mxu.supported(h, w, P, s):
        return False
    ck = min(_mxu_chunk(dtype), _round_up(c, 8))
    return ck % 128 == 0


def _corr_fwd_impl(f1: jax.Array, f2: jax.Array, P: int, s: int) -> jax.Array:
    if P % s != 0:
        raise ValueError(f"max_displacement ({P}) must be divisible by stride ({s})")
    if f1.shape != f2.shape:
        raise ValueError(f"f1/f2 shape mismatch: {f1.shape} vs {f2.shape}")
    in_dtype = f1.dtype
    inv_c = 1.0 / f1.shape[-1]

    from unflow_tpu.ops.pallas import correlation_mxu as mxu

    _, h, w, c_in = f1.shape
    if _mxu_ok(in_dtype, h, w, P, s, c_in):
        chunk = _mxu_chunk(in_dtype)
        chunks1 = _split_channels(f1, chunk)
        chunks2 = _split_channels(f2, chunk)
        # Accumulate cross-chunk partials in f32 (each kernel returns its
        # compute dtype; a bf16 += per chunk would add one rounding per
        # chunk that the VPU/jnp paths don't have).
        out = mxu.corr_fwd_mxu(chunks1[0], chunks2[0], P, s, inv_c).astype(jnp.float32)
        for a, b2 in zip(chunks1[1:], chunks2[1:]):
            out = out + mxu.corr_fwd_mxu(a, b2, P, s, inv_c).astype(jnp.float32)
        return out.astype(in_dtype)

    chunks1, chunks2 = _split_channels(f1), _split_channels(f2)
    out = _corr_fwd_chunk(chunks1[0], chunks2[0], P, s, inv_c)
    for a, b2 in zip(chunks1[1:], chunks2[1:]):
        out = out + _corr_fwd_chunk(a, b2, P, s, inv_c)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(in_dtype)


# ---------------------------------------------------------------------------
# Backward: gradient w.r.t. f1
# ---------------------------------------------------------------------------


def _corr_bwd_f1_chunk(gt: jax.Array, f2: jax.Array, P: int, s: int, inv_c: float):
    """gt: (B, D*D, Hp, W) float32; f2: (B, H, W, Cchunk). Returns (B, Hp, C, W)."""
    b, h, w, c = f2.shape
    d = 2 * (P // s) + 1
    hp = gt.shape[2]
    th = 8 if hp % 8 == 0 and hp >= 8 else hp

    wl = _round_up(w + 2 * P, 128)
    f2p = jnp.pad(_prep(f2), ((0, 0), (P, P + hp - h), (0, 0), (P, wl - w - P)))
    wh = th + 2 * P

    def kernel(g_ref, f2p_ref, out_ref, f2w, acc, sem):
        bi, i, dy = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when(dy == 0)
        def _():
            cp = pltpu.make_async_copy(
                f2p_ref.at[bi, pl.ds(i * th, wh), :, :], f2w, sem
            )
            cp.start()
            cp.wait()
            acc[:] = jnp.zeros_like(acc)

        rows = f2w[pl.ds(dy * s, th), :, :]  # (TH, C, WL)
        for dx in range(d):
            f2s = rows[:, :, dx * s : dx * s + w]
            acc[:] = acc[:] + g_ref[0, dx][:, None, :] * f2s

        @pl.when(dy == d - 1)
        def _():
            out_ref[0] = acc[:] * inv_c

    return pl.pallas_call(
        kernel,
        grid=(b, hp // th, d),
        in_specs=[
            pl.BlockSpec((1, d, th, w), lambda bi, i, dy: (bi, dy, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, c, w), lambda bi, i, dy: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, c, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((wh, c, wl), f2p.dtype),
            pltpu.VMEM((th, c, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_INTERPRET,
    )(gt, f2p)


def _corr_bwd_f1_impl(g: jax.Array, f2: jax.Array, P: int, s: int) -> jax.Array:
    b, h, w, c = f2.shape
    in_dtype = f2.dtype
    inv_c = 1.0 / c

    from unflow_tpu.ops.pallas import correlation_mxu as mxu

    if _mxu_ok(in_dtype, h, w, P, s, c):
        chunk = _mxu_chunk(in_dtype)
        parts = [
            mxu.corr_bwd_f1_mxu(g, f2c, P, s, inv_c)
            for f2c in _split_channels(f2, chunk)
        ]
        return jnp.concatenate(parts, axis=-1)[..., :c].astype(in_dtype)

    _, hp = _row_tile(h)
    # g stays f32: bf16 (th, 1, w) broadcasts hit an unsupported Mosaic
    # shape cast; the bandwidth win lives in the f2/f1 windows anyway.
    gt = jnp.pad(
        jnp.transpose(g, (0, 3, 1, 2)).astype(jnp.float32),
        ((0, 0), (0, 0), (0, hp - h), (0, 0)),
    )
    parts = [
        _corr_bwd_f1_chunk(gt, f2c, P, s, inv_c) for f2c in _split_channels(f2)
    ]
    out = jnp.concatenate(parts, axis=2)[:, :h, :c, :]  # (B, H, C, W)
    return jnp.transpose(out, (0, 1, 3, 2)).astype(in_dtype)


# ---------------------------------------------------------------------------
# Backward: gradient w.r.t. f2
# ---------------------------------------------------------------------------


def _corr_bwd_f2_chunk(gp: jax.Array, f1: jax.Array, P: int, s: int, inv_c: float):
    """gp: (B, H2p + 2P rows, Dy, Dx8, WW) padded g; f1: (B, H, W, Cchunk).

    Returns (B, H2p, C, W+2P): gradient over the padded f2 extent.
    """
    b, h, w, c = f1.shape
    d = 2 * (P // s) + 1
    p2 = 2 * P
    w2 = w + 2 * P
    h2 = h + 2 * P
    th, h2p = _row_tile(h2)
    ww = gp.shape[-1]

    f1p = jnp.pad(_prep(f1), ((0, 0), (p2, h2p - h), (0, 0), (p2, ww - w - p2)))
    wh = th + p2

    def kernel(f1p_ref, gp_ref, out_ref, f1w, gwin, acc, sems):
        bi, i, dy = pl.program_id(0), pl.program_id(1), pl.program_id(2)

        @pl.when(dy == 0)
        def _():
            cp = pltpu.make_async_copy(
                f1p_ref.at[bi, pl.ds(i * th, wh), :, :], f1w, sems.at[0]
            )
            cp.start()
            cp.wait()
            acc[:] = jnp.zeros_like(acc)

        cp = pltpu.make_async_copy(
            gp_ref.at[bi, pl.ds(i * th, wh), dy, :, :], gwin, sems.at[1]
        )
        cp.start()
        cp.wait()

        roff = p2 - dy * s  # local row offset for (u - dy)
        f1rows = f1w[pl.ds(roff, th), :, :]  # (TH, C, WW)
        grows = gwin[pl.ds(roff, th), :, :]  # (TH, Dx8, WW)
        for dx in range(d):
            coff = p2 - dx * s
            gs = grows[:, dx, coff : coff + w2]  # (TH, W2)
            f1s = f1rows[:, :, coff : coff + w2]  # (TH, C, W2)
            acc[:] = acc[:] + gs[:, None, :] * f1s

        @pl.when(dy == d - 1)
        def _():
            out_ref[0] = acc[:] * inv_c

    return pl.pallas_call(
        kernel,
        grid=(b, h2p // th, d),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, c, w2), lambda bi, i, dy: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h2p, c, w2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((wh, c, ww), f1p.dtype),
            pltpu.VMEM((wh, gp.shape[3], ww), gp.dtype),
            pltpu.VMEM((th, c, w2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET,
    )(f1p, gp)


def _corr_bwd_f2_impl(g: jax.Array, f1: jax.Array, P: int, s: int) -> jax.Array:
    """d f2[u,v,c] = (1/C) sum_{dy,dx} g[u-dy, v-dx, (dy,dx)] * f1[u-dy, v-dx, c].

    Computed over the padded extent (H+2P, W+2P) then cropped; g and f1
    are zero-padded by 2P on rows and columns so each shifted read stays
    inside the staged window.
    """
    b, h, w, c = f1.shape
    d = 2 * (P // s) + 1
    in_dtype = f1.dtype
    inv_c = 1.0 / c

    from unflow_tpu.ops.pallas import correlation_mxu as mxu

    # MXU path (bf16): 16.0 ms vs 42.7 ms for the VPU kernel at the
    # production shape (B=8, 40x144, C=256) — the banded-matmul kernel
    # needs ~18 MB of VMEM windows, over Mosaic's default budget, so it
    # raises vmem_limit_bytes for its own pallas_call (v5e has headroom).
    if _mxu_ok(in_dtype, h, w, P, s, c):
        chunk = _mxu_chunk(in_dtype)
        parts = [
            mxu.corr_bwd_f2_mxu(g, f1c, P, s, inv_c)
            for f1c in _split_channels(f1, chunk)
        ]
        return jnp.concatenate(parts, axis=-1)[..., :c].astype(in_dtype)

    p2 = 2 * P
    _, h2p = _row_tile(h + 2 * P)
    ww = _round_up(w + 4 * P, 128)
    d8 = _round_up(d, 8)  # Dx sublane extent for the manual DMA

    # g: (B, H, W, Dy*Dx) -> (B, rows, Dy, Dx8, WW): rows/dy on untiled
    # axes, Dx sublane (padded to 8), W lane (padded to 128-multiple).
    gp = jnp.pad(
        jnp.transpose(g.reshape(b, h, w, d, d), (0, 1, 3, 4, 2)).astype(jnp.float32),
        ((0, 0), (p2, h2p - h), (0, 0), (0, d8 - d), (p2, ww - w - p2)),
    )
    parts = [
        _corr_bwd_f2_chunk(gp, f1c, P, s, inv_c) for f1c in _split_channels(f1)
    ]
    out = jnp.concatenate(parts, axis=2)  # (B, H2p, Cp, W2)
    out = out[:, P : P + h, :c, P : P + w]
    return jnp.transpose(out, (0, 1, 3, 2)).astype(in_dtype)


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def correlation_pallas(
    f1: jax.Array, f2: jax.Array, max_displacement: int = 20, stride: int = 2
) -> jax.Array:
    return _corr_fwd_impl(f1, f2, max_displacement, stride)


def _vjp_fwd(f1, f2, max_displacement, stride):
    return _corr_fwd_impl(f1, f2, max_displacement, stride), (f1, f2)


def _vjp_bwd(max_displacement, stride, res, g):
    f1, f2 = res
    df1 = _corr_bwd_f1_impl(g, f2, max_displacement, stride)
    df2 = _corr_bwd_f2_impl(g, f1, max_displacement, stride)
    return df1, df2


correlation_pallas.defvjp(_vjp_fwd, _vjp_bwd)
