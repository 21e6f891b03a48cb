"""Dense bilinear warping ops (backward gather, forward splat).

Reference: simonmeister/UnFlow
  * ``src/e2eflow/ops/backward_warp_op.cc`` / ``.cu.cc`` — bilinear
    gather ``out(x) = im(x + flow(x))`` with custom gradients w.r.t. both
    the image and the flow; a pure-TF fallback lives at
    ``src/e2eflow/core/image_warp.py::image_warp``.
  * ``src/e2eflow/ops/forward_warp_op.cc`` / ``.cu.cc`` — bilinear
    splat along the flow; its density ("range") map detects disocclusion
    (``src/e2eflow/core/losses.py``: ``forward_warp(flow) < DISOCC_THRESH``).

TPU design: backward warp is a gather; we flatten (H, W) and use
``take_along_axis`` with clamped indices, which XLA lowers to a dynamic
gather — differentiable through autodiff (gather -> scatter-add VJP).
Forward warp is a scatter-add; TPU has no float atomics, so we express it
as ``.at[].add`` with ``mode='drop'`` (XLA scatter-add), which on TPU
lowers to a deterministic sorted-segment accumulation. Both are exposed
as pure functions of (image, flow) and are fully differentiable.

Convention: ``flow[..., 0]`` is the horizontal displacement (u, along W)
and ``flow[..., 1]`` the vertical displacement (v, along H), matching the
reference and the .flo / KITTI formats.

Border policy: backward_warp clamps sample coordinates to the image
border (edge-extend). The reference's losses mask out-of-frame pixels
explicitly via ``create_outgoing_mask``, so the border policy does not
leak into training; edge-extend keeps gradients finite everywhere.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools

import jax
import jax.numpy as jnp


def _sample_coords(flow: jax.Array):
    """Absolute sample coordinates (x, y) for each target pixel.

    Coordinate math is forced to >= f32: bf16 cannot represent pixel
    positions past 256 exactly (8 mantissa bits), which corrupts the
    integer tap indices, not just the fractional weights.
    """
    b, h, w, _ = flow.shape
    ct = jnp.promote_types(flow.dtype, jnp.float32)
    gy = jnp.arange(h, dtype=ct)[None, :, None]
    gx = jnp.arange(w, dtype=ct)[None, None, :]
    x = gx + flow[..., 0].astype(ct)
    y = gy + flow[..., 1].astype(ct)
    return x, y


def backward_warp_jnp(im: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear backward warp: ``out[p] = im[p + flow[p]]``.

    Reference formulation (4 independent clamped gathers) — kept as the
    test oracle for :func:`backward_warp_packed`.
    """
    b, h, w, c = im.shape
    x, y = _sample_coords(flow)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(im.dtype)[..., None]
    wy = (y - y0).astype(im.dtype)[..., None]

    def clamp(ix, iy):
        ix = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iy = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        return iy * w + ix

    im_flat = im.reshape(b, h * w, c)

    def gather(idx):
        return jnp.take_along_axis(im_flat, idx.reshape(b, h * w, 1), axis=1).reshape(
            b, h, w, c
        )

    v00 = gather(clamp(x0, y0))
    v01 = gather(clamp(x0 + 1, y0))
    v10 = gather(clamp(x0, y0 + 1))
    v11 = gather(clamp(x0 + 1, y0 + 1))

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def backward_warp_packed(im: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear backward warp as ONE gather of 4C packed channels.

    XLA's TPU gather pays per *index*, not per byte (measured: 4 gathers
    of C channels take 2.4x longer than 1 gather of 4C channels at the
    loss-pyramid shapes). So the 2x2 bilinear neighborhood of every
    pixel is pre-packed into the channel axis with three edge-extended
    shifts; one gather at (floor(y), floor(x)) then fetches all four
    taps. Autodiff inherits the shape: the VJP is ONE 4C scatter-add
    plus shift-adds, instead of four C scatters.

    Matches :func:`backward_warp_jnp`'s edge-clamp semantics exactly:
    the +1 taps come from edge-duplicated shifts (correct at the
    right/bottom border), and for coordinates left/above the frame
    (floor < 0) the fractional weight is zeroed so the mix collapses to
    the clamped base tap, as independent clamping would produce.
    """
    coords = _packed_coords(flow, im.dtype)
    return _packed_gather(im, *coords)


def _packed_coords(flow: jax.Array, dtype):
    """Shared gather coordinates + bilinear weights for a flow field."""
    b, h, w, _ = flow.shape
    x, y = _sample_coords(flow)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = jnp.where(x0 < 0, 0.0, x - x0).astype(dtype)[..., None]
    wy = jnp.where(y0 < 0, 0.0, y - y0).astype(dtype)[..., None]
    ix = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    iy = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    idx = (iy * w + ix).reshape(b, h * w, 1)
    return idx, wx, wy


# XLA's TPU gather throughput collapses superlinearly once the operand
# outgrows ~100 MB (measured on v5e at the 320x1152 KITTI crop, bf16
# 12-channel pack: batch 8 = 71 MB -> 29 ms, batch 16 = 142 MB -> 101 ms;
# two batch-8 gathers inside ONE program = 56 ms). Chunking the gather
# along the batch axis keeps every operand under the cliff and restores
# linear scaling — critical for cascade specs, whose stage-glue warps run
# at the fw/bw-interleaved 2x batch.
_GATHER_CHUNK_BYTES = 96 * 2**20

# Data-parallel shard count of the batch axis, declared (scoped) by the
# trainer. Batch slices under a sharded axis ALWAYS reshard — GSPMD
# retiles every chunk over the full mesh even when chunk boundaries land
# on shard boundaries (verified by HLO inspection: 42 all-to-alls + 708
# collective-permutes in the warp VJP at 8 aligned chunks x 8 devices).
# So chunking is single-device-only. That costs nothing: the cliff is
# per-DEVICE, and with g shards each device's gather operand is
# bytes/g — at the KITTI crop a sharded step sits far below it.
_GATHER_SHARD_GRANULARITY = contextvars.ContextVar(
    "gather_shard_granularity", default=1
)


@contextlib.contextmanager
def gather_shard_granularity(n: int):
    """Scoped declaration of the data-axis shard count for gather-cliff
    chunking (trace-time hint; 1 = unsharded).

    Read at TRACE time, not part of any jit cache key — wrap the calls
    that trace warp-containing programs. (The Trainer does not rely on
    ambient scoping for its hot path: make_train_step re-enters this
    scope inside the traced body with a closure-bound value, so the
    compiled step can never alias a program traced under a different
    granularity, and worker-thread tracing sees the right value.) Scoping via a context
    manager (rather than a process-global setter) means a sharded
    trainer can coexist with unsharded above-cliff inference in one
    process without either silently changing what the other's
    later-traced programs compile to. Staleness inside a scope costs
    only the chunking perf heuristic, never correctness.
    """
    if n < 1:
        raise ValueError(f"shard granularity must be >= 1, got {n}")
    token = _GATHER_SHARD_GRANULARITY.set(int(n))
    try:
        yield
    finally:
        _GATHER_SHARD_GRANULARITY.reset(token)


def _pick_n_chunks(b: int, packed_bytes: int, granularity: int | None = None) -> int:
    if granularity is None:
        granularity = _GATHER_SHARD_GRANULARITY.get()
    if granularity > 1:
        return 1  # sharded batch: slicing it is never collective-clean
    want = min(b, max(1, -(-packed_bytes // _GATHER_CHUNK_BYTES)))
    if want == 1:
        return 1
    # equal chunks only (uneven ceil-splits pessimize the final chunk's
    # layout); smallest divisor of b that clears the byte target
    for n in range(want, b + 1):
        if b % n == 0:
            return n
    return b


def _packed_gather(im: jax.Array, idx: jax.Array, wx: jax.Array, wy: jax.Array,
                   granularity: int | None = None):
    """One 4C-packed gather + bilinear mix at precomputed coords.

    Batches whose packed (B, H*W, 4C) operand exceeds the measured TPU
    gather cliff are processed in equal batch chunks (static Python
    loop, shapes stay static). Chunk counts divide the batch AND the
    declared shard granularity, so every slice boundary lands on a
    device-shard boundary and GSPMD keeps the chunks shard-local.

    granularity: data-axis shard count (None = read the scoped
    contextvar at trace time).
    """
    b, h, w, c = im.shape
    packed_bytes = b * h * w * 4 * c * im.dtype.itemsize
    n_chunks = _pick_n_chunks(b, packed_bytes, granularity)
    if n_chunks > 1:
        s = b // n_chunks
        outs = []
        for off in range(0, b, s):
            outs.append(_packed_gather(
                im[off:off + s], idx[off:off + s],
                wx[off:off + s], wy[off:off + s]))
        return jnp.concatenate(outs, axis=0)

    # (B, H, W, 4C): [im, im shifted -x, im shifted -y, im shifted -x-y],
    # edge-extended so the +1 taps clamp at the right/bottom border.
    shx = jnp.concatenate([im[:, :, 1:], im[:, :, -1:]], axis=2)
    shy = jnp.concatenate([im[:, 1:], im[:, -1:]], axis=1)
    shxy = jnp.concatenate([shx[:, 1:], shx[:, -1:]], axis=1)
    packed = jnp.concatenate([im, shx, shy, shxy], axis=-1)

    g = jnp.take_along_axis(packed.reshape(b, h * w, 4 * c), idx, axis=1)
    v00, v01, v10, v11 = [
        g[..., i * c : (i + 1) * c].reshape(b, h, w, c) for i in range(4)
    ]

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _splat(values: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear forward splat of per-pixel ``values`` along ``flow``.

    values: (B, H, W, C); returns (B, H, W, C). Out-of-frame mass is
    dropped (matches the reference kernel, which skips OOB targets).
    """
    b, h, w, c = values.shape
    x, y = _sample_coords(flow)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(values.dtype)
    wy = (y - y0).astype(values.dtype)

    # Per-example scatter under vmap: the batch dim becomes an explicit
    # scatter batching dim, which GSPMD keeps shard-local under a sharded
    # batch axis. (Indexing the batch with a global jnp.arange(b) instead
    # lowers to all-reduces/all-gathers in the 8-device step — a purely
    # local op paying cross-device traffic; see tests/test_sharding.py's
    # HLO-cleanliness assertions.)
    def splat_one(vals_ex, idx_ex):
        return jnp.zeros((h * w, c), values.dtype).at[idx_ex].add(
            vals_ex, mode="drop"
        )

    out = jnp.zeros((b, h * w, c), values.dtype)
    for iy, yw in ((y0, 1.0 - wy), (y0 + 1, wy)):
        for ix, xw in ((x0, 1.0 - wx), (x0 + 1, wx)):
            inb = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            # OOB -> index h*w, genuinely out of bounds so mode='drop'
            # discards it. (An index of -1 would NOT be dropped: JAX
            # wraps negative indices before the bounds check, so it
            # would scatter into the last pixel — currently masked by
            # the inb factor on contrib, but not something to rely on.)
            idx = jnp.where(
                inb, iy.astype(jnp.int32) * w + ix.astype(jnp.int32), h * w
            )
            contrib = values * (xw * yw * inb.astype(values.dtype))[..., None]
            out = out + jax.vmap(splat_one)(
                contrib.reshape(b, h * w, c), idx.reshape(b, h * w)
            )
    return out.reshape(b, h, w, c)


def forward_warp_jnp(flow: jax.Array) -> jax.Array:
    """Splat density ("range") map: how much mass lands on each pixel.

    Pixels where nothing lands (density ~ 0) are disoccluded; the
    reference thresholds this at DISOCC_THRESH to build the ``disocc``
    occlusion mask (src/e2eflow/core/losses.py).
    """
    b, h, w, _ = flow.shape
    ones = jnp.ones((b, h, w, 1), flow.dtype)
    return _splat(ones, flow)


def forward_warp_image_jnp(im: jax.Array, flow: jax.Array) -> jax.Array:
    """Forward-warp an image by splatting (unnormalized accumulation)."""
    return _splat(im, flow)


@functools.partial(jax.jit, static_argnames=("impl", "shard_granularity"))
def _backward_warp_jit(
    im: jax.Array, flow: jax.Array, impl: str | None, shard_granularity: int
) -> jax.Array:
    if impl == "jnp":
        return backward_warp_jnp(im, flow)
    coords = _packed_coords(flow, im.dtype)
    return _packed_gather(im, *coords, granularity=shard_granularity)


def backward_warp(im: jax.Array, flow: jax.Array, impl: str | None = None) -> jax.Array:
    """Differentiable bilinear backward warp (see module docstring).

    impl: None/'packed' (default, one 4C gather) or 'jnp' (the
    4-gather reference formulation).

    The scoped gather-shard granularity (``gather_shard_granularity``)
    is read HERE, outside the jit, and passed as a static argument — so
    two scopes with different granularities can never alias one
    compiled program through the jit cache (it is part of the key).
    When called inside an outer trace, the contextvar read happens at
    outer-trace time, i.e. still under the caller's with-scope.
    """
    return _backward_warp_jit(
        im, flow, impl, _GATHER_SHARD_GRANULARITY.get()
    )


@functools.partial(jax.jit, static_argnames=("impl",))
def forward_warp(flow: jax.Array, impl: str | None = None) -> jax.Array:
    """Differentiable forward-splat density map (B, H, W, 1)."""
    del impl
    return forward_warp_jnp(flow)


@functools.partial(jax.jit, static_argnames=("impl",))
def forward_warp_image(
    im: jax.Array, flow: jax.Array, impl: str | None = None
) -> jax.Array:
    del impl
    return forward_warp_image_jnp(im, flow)
