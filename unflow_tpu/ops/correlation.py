"""FlowNetC correlation (cost volume) op.

Reference: simonmeister/UnFlow ``src/e2eflow/ops/correlation_op.cc`` /
``correlation_op.cu.cc`` (CUDA kernel + dedicated CorrelationGrad kernel),
wrapped in ``src/e2eflow/ops.py::correlation``. FlowNetC calls it with
``kernel_size=1, max_displacement=20, stride_1=1, stride_2=2, pad=20`` on
the 1/8-resolution conv3 features, producing a 21x21 = 441-channel cost
volume (``src/e2eflow/core/flownet.py::flownet_c``).

Semantics implemented here (kernel_size fixed to 1, stride_1 fixed to 1,
pad fixed to max_displacement — the only configuration the reference ever
uses):

    out[b, y, x, (dy, dx)] = (1/C) * sum_c f1[b, y, x, c]
                                         * f2[b, y + dy, x + dx, c]

for dy, dx in ``{-max_displacement, ..., +max_displacement}`` with step
``stride_2``; out-of-bounds reads of f2 are zero (zero padding). Output
displacement channels are ordered row-major over (dy, dx) with dy the
slowest axis, matching the reference's loop nest. The 1/C normalization
follows the FlowNet convention (divide by the patch element count; patch
is 1x1xC here).

TPU mapping: the naive formulation re-reads f2 from HBM once per
displacement (441x traffic). The Pallas kernel
(:mod:`unflow_tpu.ops.pallas.correlation`) tiles the batch/rows/cols,
stages the f1 tile plus the (tile + 2*max_displacement) halo window of f2
into VMEM once, and computes all 441 multiply-reduces on-chip, with
matching custom-VJP kernels for both gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from unflow_tpu.ops import resolve_impl


def _displacement_count(max_displacement: int, stride: int) -> int:
    return 2 * (max_displacement // stride) + 1


def correlation_jnp(
    f1: jax.Array,
    f2: jax.Array,
    max_displacement: int = 20,
    stride: int = 2,
) -> jax.Array:
    """Pure-XLA reference implementation (differentiable via autodiff)."""
    b, h, w, c = f1.shape
    if f2.shape != f1.shape:
        raise ValueError(f"f1/f2 shape mismatch: {f1.shape} vs {f2.shape}")
    d = _displacement_count(max_displacement, stride)
    pad = max_displacement
    f2p = jnp.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    # Scan over the flattened displacement grid: each step slices the
    # shifted window and does one multiply-reduce. Keeps the graph small
    # (one scan) and lets XLA pipeline the 441 steps.
    def step(_, idx):
        dy = (idx // d) * stride
        dx = (idx % d) * stride
        f2s = lax.dynamic_slice(f2p, (0, dy, dx, 0), (b, h, w, c))
        out = jnp.sum(f1 * f2s, axis=-1)  # (B, H, W)
        return None, out

    _, vols = lax.scan(step, None, jnp.arange(d * d))
    out = jnp.transpose(vols, (1, 2, 3, 0))  # (B, H, W, D*D)
    return out / jnp.asarray(c, out.dtype)


@functools.partial(jax.jit, static_argnames=("max_displacement", "stride", "backend"))
def _correlation_jit(f1, f2, max_displacement, stride, backend):
    if backend == "pallas":
        from unflow_tpu.ops.pallas.correlation import correlation_pallas

        return correlation_pallas(f1, f2, max_displacement, stride)
    return correlation_jnp(f1, f2, max_displacement, stride)


def correlation(
    f1: jax.Array,
    f2: jax.Array,
    max_displacement: int = 20,
    stride: int = 2,
    impl: str | None = None,
) -> jax.Array:
    """Cost volume between two feature maps.

    Args:
      f1, f2: ``(B, H, W, C)`` feature maps.
      max_displacement: search radius in pixels (reference: 20); must be
        divisible by ``stride`` (the displacement grid is symmetric).
      stride: displacement grid step (reference ``stride_2``: 2).
      impl: ``auto`` | ``jnp`` | ``pallas``.

    Returns:
      ``(B, H, W, D*D)`` with ``D = 2*(max_displacement//stride) + 1``.
    """
    # Both checked and resolved OUTSIDE the jit: resolving inside would
    # bake the process-wide default into the first trace's cache and
    # silently ignore later set_default_impl() calls; and the jnp path
    # would otherwise accept an asymmetric grid the pallas path rejects.
    if max_displacement % stride:
        raise ValueError(
            f"max_displacement ({max_displacement}) must be divisible by "
            f"stride ({stride})"
        )
    return _correlation_jit(f1, f2, max_displacement, stride, resolve_impl(impl))
