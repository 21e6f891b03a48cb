"""MXU (systolic-array) formulation of the correlation cost volume.

The VPU kernels in :mod:`unflow_tpu.ops.pallas.correlation` compute the
441 displacement channels as shifted multiply-reduces — inherently
vector-unit work. This module reformulates the op so the contraction
runs on the MXU:

  * **Phase decomposition.** With displacement stride ``s``, column
    ``x = s*k + p`` only ever correlates against columns of the same
    phase ``p``; rows likewise split into ``s`` row-parity planes. The
    op factors into ``s^2``-fewer-overlap banded products per phase.
  * **Banded matmul.** For one output row and phase, stacking all dy
    rows of the (pre-padded, phase-split) second feature map gives
    ``B2 = (D * W2p, C)``; a single MXU matmul
    ``A (Wp, C) @ B2^T -> M (Wp, D*W2p)`` computes every (dy, dx)
    product sum — the needed outputs are the diagonals
    ``M[k, dy*W2p + k + dx]``.
  * **Band extraction / band build.** The needed outputs sit on
    per-row diagonals ``M[k, dy*W2p + k + dx]``. The forward kernel
    aligns the low 3 bits of ``k`` with a masked barrel roll and folds
    the residual per-8-row-block shift into static lane offsets of the
    extraction stores. Both gradients avoid in-kernel rolls entirely:
    the cotangent's per-column shift is precomputed in XLA on the
    compact channel layout (:func:`_shifted_cotangent`, one pad +
    reflatten reshape shared by both), so the kernels are masked
    slice-stores plus ONE large matmul per (row, phase).

Measured at the production shape (40x144, C=256, bf16), standalone at
the train step's effective batch 16: forward 9.9 -> 7.5 ms, f1
gradient 11.1 -> 8.8 ms (2.3 ms in-step, where the cotangent prep is
shared with the f2 gradient), f2 gradient 15.9 -> 6.2 ms at batch 8.
Numerics match the jnp reference to bf16 noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = jax.default_backend() != "tpu"


def _matmul_precision(dtype):
    # f32 operands need the 3-pass decomposition; the MXU's default
    # single pass is bf16-accurate only (observed 2e-3 rel error).
    return lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _stage_dtype(x: jax.Array):
    return x.dtype if x.dtype == jnp.bfloat16 else jnp.float32


def _dims(h: int, w: int, P: int, s: int):
    d = 2 * (P // s) + 1
    wp = -(-w // s)  # phase width
    w2 = wp + d - 1  # band width per phase
    w2p = _round_up(w2, 8)
    th = 8 if h % 8 == 0 and h >= 8 else h
    hp = _round_up(h, th)
    if (th + 2 * P) % s or (hp + 2 * P) % s or th % s:
        raise ValueError(f"unsupported geometry h={h} P={P} s={s}")
    if (hp + 2 * P) % th:
        # the f2-gradient kernel grids over the padded (hp + 2P) rows
        raise ValueError(f"unsupported geometry h={h} P={P} s={s}")
    return d, wp, w2, w2p, th, hp


def supported(h: int, w: int, P: int, s: int) -> bool:
    if s not in (1, 2) or P % s:
        # The band geometry assumes s | P (e.g. _prep_f2's wp + 2P/s
        # split and the rp = D-1 identity); callers bypassing
        # correlation_pallas's own check must not pass the gate.
        return False
    try:
        _dims(h, w, P, s)
    except ValueError:
        return False
    return True


def _shift_rows_by_index(x: jax.Array, width_out: int) -> jax.Array:
    """``out[..., k, c] = x[..., k, c - k]`` as a pure reshape.

    x: (..., R, width_out + 1) with at least R-1 trailing zeros per row
    (so the positions where ``c - k < 0``, which alias the previous
    row's tail after reflattening, read zeros). Flattening rows of
    width ``width_out + 1`` and re-slicing rows of width ``width_out``
    moves row k's content right by exactly k lanes — one XLA copy, no
    gather, no per-row roll.
    """
    *lead, r, x1 = x.shape
    assert x1 == width_out + 1
    flat = x.reshape(*lead, r * x1)
    return flat[..., : r * width_out].reshape(*lead, r, width_out)


def _unshift_rows_by_index(x: jax.Array, width: int) -> jax.Array:
    """``out[..., k, c] = x[..., k, c + k]`` as a pure reshape.

    Inverse of :func:`_shift_rows_by_index`: flatten rows of ``width``,
    pad R trailing elements, re-slice rows of ``width + 1`` — row k's
    view starts k elements deeper. Positions ``c + k >= width`` alias
    the next row's head; callers must only read below that.
    """
    *lead, r, win = x.shape
    assert win == width
    flat = x.reshape(*lead, r * win)
    flat = jnp.pad(flat, ((0, 0),) * len(lead) + ((0, r),))
    return flat.reshape(*lead, r, win + 1)[..., :win]


def _shifted_cotangent(
    g: jax.Array, s: int, h: int, hp: int, wps: int, d: int, dpw: int, x_ch: int
) -> jax.Array:
    """Phase/parity-split cotangent with per-column channel shift.

    Returns (B, s, hp/s, s, Wps, X) with R[k, c'] = g2[k, c' - k], where
    g2 packs each dy block at EVEN stride dpw. Shared by the f1 and f2
    gradient kernels (identical prep -> XLA CSEs one copy per step).
    """
    gs = jnp.pad(g, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    gs = _phase_split_cols(gs, s, wps)
    gs = _row_parity_split(gs, s)  # (B, s, hp/s, s, Wps, dd)
    if dpw != d:  # pad each dy block d -> dpw channels
        gs = gs.reshape(*gs.shape[:-1], d, d)
        gs = jnp.pad(gs, ((0, 0),) * (gs.ndim - 1) + ((0, dpw - d),))
        gs = gs.reshape(*gs.shape[:-2], d * dpw)
    gs = jnp.pad(gs, ((0, 0),) * 5 + ((0, x_ch + 1 - d * dpw),))
    return _shift_rows_by_index(gs, x_ch)


def _phase_split_cols(x: jax.Array, s: int, wp: int) -> jax.Array:
    """(B, R, W', C) -> (B, R, s, Wp, C): column x = s*k + p -> [p, k]."""
    b, r, wpad, c = x.shape
    if wpad != s * wp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, s * wp - wpad), (0, 0)))
    return jnp.transpose(x.reshape(b, r, wp, s, c), (0, 1, 3, 2, 4))


def _row_parity_split(x: jax.Array, s: int) -> jax.Array:
    """(B, R, ...) -> (B, s, R//s, ...): row v = s*r + q -> [q, r]."""
    b, r = x.shape[:2]
    rest = x.shape[2:]
    x = x.reshape(b, r // s, s, *rest)
    perm = (0, 2, 1) + tuple(range(3, x.ndim))
    return jnp.transpose(x, perm)


def _prep_f2(f2: jax.Array, P: int, s: int, hp: int, wp: int, w2p: int) -> jax.Array:
    """(B, H, W, C) -> (B, s, (hp+2P)/s, s, W2p, C) padded + phase/parity split."""
    b, h, w, c = f2.shape
    f2 = f2.astype(_stage_dtype(f2))
    f2 = jnp.pad(f2, ((0, 0), (P, P + hp - h), (P, s * wp - w + P), (0, 0)))
    f2 = _phase_split_cols(f2, s, wp + (2 * P) // s)  # width s*w2 = s*wp + 2P
    w2 = wp + (2 * P) // s
    if w2p != w2:
        f2 = jnp.pad(f2, ((0, 0), (0, 0), (0, 0), (0, w2p - w2), (0, 0)))
    return _row_parity_split(f2, s)


def _prep_phase(x: jax.Array, s: int, hp: int, wp: int) -> jax.Array:
    """(B, H, W, Cx) -> (B, hp, s, Wp, Cx) (rows padded, cols phase-split)."""
    b, h, w, cx = x.shape
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    return _phase_split_cols(x, s, wp)


def _merge_phase(x: jax.Array, h: int, w: int):
    """(B, hp, s, Wp, Cx) -> (B, h, w, Cx)."""
    b, hp, s, wp, cx = x.shape
    out = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, hp, s * wp, cx)
    return out[:, :h, :w]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def corr_fwd_mxu(
    f1: jax.Array, f2: jax.Array, P: int, s: int, inv_c: float | None = None
) -> jax.Array:
    """Banded matmul + two-level in-kernel diagonal extraction.

    Extraction options measured at the production shape (B=16, 40x144,
    C=256, bf16):
      * v1 full 7-step barrel roll per (row, phase): 9.9 ms.
      * matmul-only kernel + XLA-side unshift (pad+reflatten reshape,
        mirroring the gradients' pre-shift trick): kernel drops to 5.7
        ms but the XLA stride-change relayout costs 10.6 ms and a lane
        gather 822 ms — both dead ends; the gradients' trick only works
        there because the shift happens on the narrow (X~640) compact
        layout BEFORE the heavy operand is formed.
      * this version: align the low 3 bits of k with a 3-step barrel
        (the only per-row-varying part), then the high bits with 9
        STATIC block rolls (one op each, no select): ~9 value passes
        over the (Wp, N2) product instead of ~15.
    """
    b, h, w, c = f1.shape
    d, wp, w2, w2p, th, hp = _dims(h, w, P, s)
    n2 = d * w2p
    whp = (th + 2 * P) // s  # window rows per parity plane
    inv_c = (1.0 / c) if inv_c is None else inv_c
    in_dtype = f1.dtype
    nblk = -(-wp // 8)  # 8-row blocks share one static high-bit roll

    f1s = _prep_phase(f1.astype(_stage_dtype(f1)), s, hp, wp)
    f2s = _prep_f2(f2, P, s, hp, wp, w2p)

    def kernel(f1_ref, f2p_ref, out_ref, f2w, sem):
        bi, i = pl.program_id(0), pl.program_id(1)
        cp = pltpu.make_async_copy(
            f2p_ref.at[bi, :, pl.ds(i * (th // s), whp), :, :, :], f2w, sem
        )
        cp.start()
        cp.wait()
        kidx = lax.broadcasted_iota(jnp.int32, (wp, n2), 0)
        for t in range(th):
            par, r0 = t % s, t // s
            for p in range(s):
                a = f1_ref[0, t, p]  # (Wp, C)
                b2 = f2w[par, r0 : r0 + d, p].reshape(n2, c)
                m = lax.dot_general(
                    a, b2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_matmul_precision(a.dtype),
                )  # (Wp, N2)
                r = m * inv_c
                for bit in range(3):  # align k mod 8
                    rolled = pltpu.roll(r, n2 - (1 << bit), axis=1)
                    r = jnp.where(((kidx >> bit) & 1) == 1, rolled, r)
                # After the 3-bit barrel, r[k, c] = m[k, c + (k mod 8)];
                # the residual per-8-row-block shift is a STATIC lane
                # offset of the extraction load (Mosaic rejects the
                # concat-of-rolled-blocks alternative: "offset mismatch
                # on non-concat dimension").
                for kb in range(nblk):
                    blk = r[kb * 8 : (kb + 1) * 8]
                    for dyi in range(d):
                        off = dyi * w2p + 8 * kb
                        out_ref[
                            0, t, p, kb * 8 : (kb + 1) * 8, dyi * d : (dyi + 1) * d
                        ] = blk[:, off : off + d]

    out = pl.pallas_call(
        kernel,
        grid=(b, hp // th),
        in_specs=[
            pl.BlockSpec((1, th, s, wp, c), lambda bi, i: (bi, i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, s, wp, d * d), lambda bi, i: (bi, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, s, wp, d * d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((s, whp, s, w2p, c), f2s.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        # The f32 (HIGHEST-precision) path's per-block value chains need
        # ~32 MB of scoped VMEM; v5e has headroom over the 16 MB default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_INTERPRET,
    )(f1s, f2s)

    return _merge_phase(out, h, w).astype(in_dtype)


# ---------------------------------------------------------------------------
# Gradient w.r.t. f1
# ---------------------------------------------------------------------------


def corr_bwd_f1_mxu(
    g: jax.Array, f2: jax.Array, P: int, s: int, inv_c: float | None = None
) -> jax.Array:
    """df1[v,u,c] = (1/C) sum_{dy,dx} g[v, u, (dy,dx)] * f2[v+s*dy', u+s*dx', c].

    v2, same machinery as :func:`corr_bwd_f2_mxu`: the cotangent's
    per-output-column band shift is precomputed in XLA on the COMPACT
    (X~640-lane) channel layout via :func:`_shifted_cotangent` — shared
    with the f2 gradient, so one step pays the prep once — and the
    kernel builds the (Wps, D*W2p) band with D masked lane-slice stores
    and runs ONE (Wps, N2) @ (N2, C) matmul per (row, phase): no
    in-kernel rolls and no f32 cotangent staging (the v1 roll kernel,
    kept below, needed f32 for Mosaic's 32-bit-only rotate and measured
    10.9 ms vs 4-5 ms here at the production shape).

    NOTE: an earlier experiment pre-shifted the FLAT D*W2p-wide band in
    XLA and was slower (377 MB intermediate); the compact-layout shift
    avoids that blowup.

    Hazard + alignment notes: see :func:`corr_bwd_f2_mxu` — the same
    rotating band buffer + dep-chain ordering and the same sublane/lane
    tile rules apply.
    """
    SER_DIST = 2  # stores wait on the matmul from this many iterations back
    NBUF = SER_DIST + 1
    b, h, w, c = f2.shape
    d, wp, w2, w2p, th, hp = _dims(h, w, P, s)
    n2 = d * w2p
    whp = (th + 2 * P) // s
    inv_c = (1.0 / c) if inv_c is None else inv_c
    in_dtype = f2.dtype
    stage = _stage_dtype(f2)
    dpw = d + (d % 2)
    x_ch = _round_up((d - 1) * dpw + w2p, 128)
    wps = _round_up(wp, 16 if stage == jnp.bfloat16 else 8)
    assert x_ch + 1 - d * dpw >= wps

    gs = _shifted_cotangent(g.astype(stage), s, h, hp, wps, d, dpw, x_ch)
    f2s = _prep_f2(f2, P, s, hp, wp, w2p)
    nb = th // s

    def kernel(gp_ref, f2p_ref, out_ref, gwin, f2w, zz, sems):
        bi, i = pl.program_id(0), pl.program_id(1)
        cp0 = pltpu.make_async_copy(
            gp_ref.at[bi, :, pl.ds(i * nb, nb), :, :, :], gwin, sems.at[0]
        )
        cp1 = pltpu.make_async_copy(
            f2p_ref.at[bi, :, pl.ds(i * nb, whp), :, :, :], f2w, sems.at[1]
        )
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()
        kk = lax.broadcasted_iota(jnp.int32, (wps, w2p), 0)
        pos = lax.broadcasted_iota(jnp.int32, (wps, w2p), 1)
        band = (pos >= kk) & (pos - kk < d)
        deps = [jnp.zeros((), jnp.float32)] * SER_DIST
        for t in range(th):
            par, base = t % s, t // s
            for p in range(s):
                n = t * s + p
                buf = (n % NBUF) * wps
                zero = jnp.zeros((wps, w2p), stage) + (deps[0] * 0).astype(stage)
                grow = gwin[par, base, p]  # (Wps, X)
                for dyi in range(d):
                    sl = grow[:, dyi * dpw : dyi * dpw + w2p]
                    zz[pl.ds(buf, wps), dyi * w2p : (dyi + 1) * w2p] = jnp.where(
                        band, sl, zero
                    )
                f2stack = f2w[par, base : base + d, p].reshape(n2, c)
                df1 = lax.dot_general(
                    zz[pl.ds(buf, wps), :], f2stack, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_matmul_precision(f2stack.dtype),
                )  # (Wps, C)
                out_ref[0, t, p] = df1 * inv_c
                deps = deps[1:] + [df1[0, 0]]

    out = pl.pallas_call(
        kernel,
        grid=(b, hp // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, s, wps, c), lambda bi, i: (bi, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, s, wps, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((s, nb, s, wps, x_ch), stage),
            pltpu.VMEM((s, whp, s, w2p, c), stage),
            pltpu.VMEM((NBUF * wps, n2), stage),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_INTERPRET,
    )(gs, f2s)

    out = out[:, :, :, :wp, :]
    return _merge_phase(out, h, w).astype(in_dtype)


# ---------------------------------------------------------------------------
# Gradient w.r.t. f2
# ---------------------------------------------------------------------------


def corr_bwd_f2_mxu(
    g: jax.Array, f1: jax.Array, P: int, s: int, inv_c: float | None = None
) -> jax.Array:
    """d f2[v,u,c] = (1/C) sum_{dy,dx} g[v-s*dy, u-s*dx] * f1[v-s*dy, u-s*dx, c].

    v2: the per-output-column shift of the cotangent band is precomputed
    in XLA (:func:`_shift_rows_by_index` over the displacement-channel
    axis: R[k, c'] = g[k, c' - k], so the dy-band needed at output
    position ``pos`` is the STATIC slice ``R[:, dy*D + pos]``). The
    kernel builds the K-stacked band with D masked slice-stores and runs
    ONE (D*Wp, W2p)^T x (D*Wp, C) matmul per (row, phase) — no
    in-kernel rolls, no chunked accumulation.

    Out-of-band positions of a slice (``pos - k`` outside ``[0, D)``)
    would read the NEIGHBORING dy block's values (the channel axis is
    packed), so each slice-store applies a static (k, pos) band mask.

    Hazard note (verified empirically on v5e): the bf16 single-pass MXU
    matmul reads its VMEM operand lazily, and Mosaic does NOT order the
    next iteration's band stores against it — mid-loop outputs read
    half-overwritten bands. The fix is a rotating band buffer plus an
    explicit data dependency: iteration n's stores consume a dummy
    scalar derived from iteration n-2's matmul result, so a store can
    only clobber a buffer whose matmul has retired. f32 (3-pass
    HIGHEST) materializes operands eagerly and never raced.
    """
    SER_DIST = 2  # stores wait on the matmul from this many iterations back
    NBUF = SER_DIST + 1
    b, h, w, c = f1.shape
    d, wp, w2, w2p, th, hp = _dims(h, w, P, s)
    dd = d * d
    inv_c = (1.0 / c) if inv_c is None else inv_c
    in_dtype = f1.dtype
    h2 = hp + 2 * P  # padded output rows
    whp = (th + 2 * P) // s  # window rows per parity plane
    stage = _stage_dtype(f1)

    # Shifted-channel cotangent. Each dy block is padded from d to an
    # EVEN stride dpw: the kernel's in-register lane slices start at
    # dy*dpw, and odd lane offsets on bf16 values silently corrupt the
    # read (two bf16s pack per 32-bit lane word; verified empirically —
    # odd-offset slices returned wrong data at d=21). X covers the
    # deepest slice read ((d-1)*dpw + w2p) and guarantees the previous
    # row's tail aliased by c' < k reads zeros (X + 1 - d*dpw >= wp).
    dpw = d + (d % 2)
    x_ch = _round_up((d - 1) * dpw + w2p, 128)
    # The kernel merges (d, wps) into the matmul contraction axis with a
    # value reshape; that is only a relabeling when the sublane extent
    # wps is a multiple of the dtype's sublane tile (16 for bf16, 8 for
    # f32) — otherwise Mosaic silently mis-repacks (observed for bf16 at
    # wp=72). Pad the staged phase width accordingly.
    wps = _round_up(wp, 16 if stage == jnp.bfloat16 else 8)
    assert x_ch + 1 - d * dpw >= wps

    # Prep order matters for cost: phase/parity-split and the channel
    # shift run on the RAW h rows; the 4P row padding (which triples the
    # row count at production geometry) is applied LAST so the heavy
    # copies never touch the zero rows. Row parity is pad-invariant
    # because s | 2P (2P/s = D-1).
    rp = 2 * P // s  # per-parity-plane row padding

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
        x = _phase_split_cols(x, s, wps)  # (B, hp, s, Wps, cx)
        return _row_parity_split(x, s)  # (B, s, hp/s, s, Wps, cx)

    def pad_rows(x):
        return jnp.pad(x, ((0, 0), (0, 0), (rp, rp), (0, 0), (0, 0), (0, 0)))

    gs = pad_rows(_shifted_cotangent(g.astype(stage), s, h, hp, wps, d, dpw, x_ch))
    f1s = pad_rows(prep(f1.astype(stage)))

    n_base = th // s
    # Only output rows [P, P+h) survive the crop below; blocks fully in
    # the padded margins (9 of 15 at the production geometry) would
    # compute discarded rows. Grid only the covering block range.
    blk_lo = P // th
    blk_hi = -(-(P + h) // th)

    def kernel(gp_ref, f1p_ref, out_ref, gwin, f1w, zz, sems):
        bi, i = pl.program_id(0), pl.program_id(1) + blk_lo
        cp0 = pltpu.make_async_copy(
            gp_ref.at[bi, :, pl.ds(i * n_base, whp), :, :, :], gwin, sems.at[0]
        )
        cp1 = pltpu.make_async_copy(
            f1p_ref.at[bi, :, pl.ds(i * n_base, whp), :, :, :], f1w, sems.at[1]
        )
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()
        # Static band mask: slice position pos for column k is in-band
        # iff pos - k in [0, D).
        kk = lax.broadcasted_iota(jnp.int32, (wps, w2p), 0)
        pos = lax.broadcasted_iota(jnp.int32, (wps, w2p), 1)
        band = (pos >= kk) & (pos - kk < d)
        deps = [jnp.zeros((), jnp.float32)] * SER_DIST
        for t in range(th):
            par, base = t % s, t // s
            for p in range(s):
                n = t * s + p
                buf = (n % NBUF) * d * wps
                # The dep chain orders these stores after the matmul
                # from SER_DIST iterations back (see hazard note).
                zero = jnp.zeros((wps, w2p), stage) + (deps[0] * 0).astype(stage)
                # K-stacked band: window row base+j holds dy = D-1-j.
                for j in range(d):
                    dy = d - 1 - j
                    sl = gwin[par, base + j, p][:, dy * dpw : dy * dpw + w2p]
                    zz[pl.ds(buf + j * wps, wps), :] = jnp.where(band, sl, zero)
                f1stack = f1w[par, base : base + d, p].reshape(d * wps, c)
                df2 = lax.dot_general(
                    zz[pl.ds(buf, d * wps), :], f1stack, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_matmul_precision(f1stack.dtype),
                )  # (W2p, C)
                out_ref[0, t, p] = df2 * inv_c
                deps = deps[1:] + [df2[0, 0]]

    out = pl.pallas_call(
        kernel,
        grid=(b, blk_hi - blk_lo),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, s, w2p, c), lambda bi, i: (bi, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, (blk_hi - blk_lo) * th, s, w2p, c), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((s, whp, s, wps, x_ch), stage),
            pltpu.VMEM((s, whp, s, wps, c), stage),
            pltpu.VMEM((NBUF * d * wps, w2p), stage),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_INTERPRET,
    )(gs, f1s)

    # Crop rows [P, P+h) of the padded extent (local to the gridded
    # blocks); cols: global u = s*j + p in [P, P+w) -> j from P//s.
    r0 = P - blk_lo * th
    j0 = P // s
    out = out[:, r0 : r0 + h, :, j0 : j0 + wp, :]
    return _merge_phase(out, h, w).astype(in_dtype)
