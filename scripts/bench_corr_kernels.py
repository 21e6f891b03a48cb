"""Micro-benchmark: correlation kernel variants at the production shape.

Production geometry: KITTI crop 320x1152 -> conv3 features (B, 40, 144, 256)
bf16, max_displacement=20, stride=2 (441-channel cost volume).

Times forward / grad-f1 / grad-f2 for the VPU kernels, the MXU kernels,
and the jnp reference, on the real TPU. Run: python scripts/bench_corr_kernels.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unflow_tpu.ops.correlation import correlation_jnp
from unflow_tpu.ops.pallas import correlation as vpu
from unflow_tpu.ops.pallas import correlation_mxu as mxu

B, H, W, C = 8, 40, 144, 256
P, S = 20, 2
D = 2 * (P // S) + 1


def timeit(name, fn, *args, iters=20):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None
    # axon block_until_ready can return early; fetch a scalar to sync.
    def sync(o):
        leaves = jax.tree_util.tree_leaves(o)
        return float(jnp.sum(leaves[0][..., 0]))

    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    g = jnp.asarray(rng.randn(B, H, W, D * D), jnp.bfloat16)

    print(f"shape=({B},{H},{W},{C}) P={P} s={S} D^2={D*D} dtype=bf16")

    inv_c = 1.0 / C

    timeit("fwd dispatcher", jax.jit(lambda a, b: vpu.correlation_pallas(a, b, P, S)), f1, f2)
    timeit("fwd mxu (256)", jax.jit(lambda a, b: mxu.corr_fwd_mxu(a, b, P, S, inv_c)), f1, f2)
    timeit("bwd_f1 mxu (256)", jax.jit(lambda gg, b: mxu.corr_bwd_f1_mxu(gg, b, P, S, inv_c)), g, f2)

    def force_vpu(fn):
        """The _impl dispatchers pick MXU for this bf16 geometry; the
        'vpu' rows must actually time the VPU kernels, so the gate is
        held False during their (first, tracing) call."""
        def wrapped(*args):
            orig = vpu._mxu_ok
            vpu._mxu_ok = lambda *a, **k: False
            try:
                return fn(*args)
            finally:
                vpu._mxu_ok = orig
        return wrapped

    timeit("bwd_f1 vpu kernel", force_vpu(jax.jit(lambda gg, b: vpu._corr_bwd_f1_impl(gg.astype(jnp.float32), b, P, S))), g, f2)
    timeit("bwd_f2 vpu kernel", force_vpu(jax.jit(lambda gg, a: vpu._corr_bwd_f2_impl(gg.astype(jnp.float32), a, P, S))), g, f1)
    timeit("bwd_f2 mxu (256)", jax.jit(lambda gg, a: mxu.corr_bwd_f2_mxu(gg, a, P, S, inv_c)), g, f1)
    timeit("bwd_f2 mxu (128ch x2)", jax.jit(
        lambda gg, a: jnp.concatenate([
            mxu.corr_bwd_f2_mxu(gg, a[..., :128], P, S, inv_c),
            mxu.corr_bwd_f2_mxu(gg, a[..., 128:], P, S, inv_c),
        ], axis=-1)), g, f1)

    # Full custom-vjp backward (both grads) through the dispatcher.
    def full_vjp(a, b, gg):
        _, vjp = jax.vjp(lambda x, y: vpu.correlation_pallas(x, y, P, S), a, b)
        return vjp(gg.astype(jnp.float32))

    timeit("full vjp (dispatcher)", jax.jit(full_vjp), f1, f2, g)
    timeit("fwd jnp", jax.jit(functools.partial(correlation_jnp, max_displacement=P, stride=S)), f1, f2)


if __name__ == "__main__":
    main()
