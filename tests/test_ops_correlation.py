"""Correlation op: golden values, gradient checks, Pallas/jnp parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unflow_tpu.ops.correlation import correlation, correlation_jnp
from unflow_tpu.ops.pallas.correlation import correlation_pallas
from tests.gradcheck import check_grads_fd


def _numpy_correlation(f1, f2, max_disp, stride):
    """Brute-force numpy oracle."""
    b, h, w, c = f1.shape
    d = 2 * (max_disp // stride) + 1
    out = np.zeros((b, h, w, d * d), np.float64)
    f2p = np.pad(f2, ((0, 0), (max_disp, max_disp), (max_disp, max_disp), (0, 0)))
    for dy in range(d):
        for dx in range(d):
            sl = f2p[:, dy * stride : dy * stride + h, dx * stride : dx * stride + w]
            out[..., dy * d + dx] = (f1.astype(np.float64) * sl).sum(-1)
    return out / c


@pytest.mark.parametrize("max_disp,stride", [(4, 2), (3, 1)])
def test_correlation_jnp_matches_numpy(rng, max_disp, stride):
    f1 = rng.randn(2, 8, 12, 6).astype(np.float32)
    f2 = rng.randn(2, 8, 12, 6).astype(np.float32)
    got = np.asarray(correlation_jnp(jnp.asarray(f1), jnp.asarray(f2), max_disp, stride))
    want = _numpy_correlation(f1, f2, max_disp, stride)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_correlation_zero_displacement_is_dot(rng):
    f1 = rng.randn(1, 8, 8, 4).astype(np.float32)
    out = np.asarray(correlation_jnp(jnp.asarray(f1), jnp.asarray(f1), 2, 2))
    d = 2 * (2 // 2) + 1
    center = out[..., (d * d) // 2]
    np.testing.assert_allclose(center, (f1 * f1).mean(-1), rtol=1e-5, atol=1e-5)


def test_correlation_pallas_matches_jnp(rng):
    f1 = jnp.asarray(rng.randn(2, 8, 16, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, 8, 16, 8).astype(np.float32))
    ref = correlation_jnp(f1, f2, 4, 2)
    got = correlation_pallas(f1, f2, 4, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_correlation_pallas_nondivisible_width(rng):
    # Exercises the wrapper's padding path (W not a tile multiple).
    f1 = jnp.asarray(rng.randn(1, 8, 72, 4).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 8, 72, 4).astype(np.float32))
    ref = correlation_jnp(f1, f2, 4, 2)
    got = correlation_pallas(f1, f2, 4, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_correlation_pallas_grads_match_jnp(rng):
    f1 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 8, 8, 25).astype(np.float32))

    def loss_ref(a, b):
        return jnp.sum(correlation_jnp(a, b, 4, 2) * g)

    def loss_pl(a, b):
        return jnp.sum(correlation_pallas(a, b, 4, 2) * g)

    ref = jax.grad(loss_ref, argnums=(0, 1))(f1, f2)
    got = jax.grad(loss_pl, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-4, atol=1e-4)


def test_correlation_jnp_gradcheck(rng):
    f1 = jnp.asarray(rng.randn(1, 4, 6, 3).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 4, 6, 3).astype(np.float32))
    check_grads_fd(lambda a, b: correlation_jnp(a, b, 2, 1), (f1, f2), atol=1e-2, rtol=1e-2)


def test_correlation_dispatcher_jnp(rng):
    f1 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    out = correlation(f1, f1, max_displacement=4, stride=2, impl="jnp")
    assert out.shape == (1, 8, 8, 25)


def test_correlation_pallas_bf16_mxu_path(rng):
    """bf16 dispatch takes the MXU banded-matmul kernels; parity vs f32."""
    f1 = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    ref = correlation_jnp(f1, f2, 4, 2)
    got = correlation_pallas(f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16), 4, 2)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - got.astype(jnp.float32)))) / scale < 0.02


def test_correlation_pallas_bf16_grads(rng):
    f1 = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(1, 8, 16, 25).astype(np.float32))

    ref = jax.grad(
        lambda a, b: jnp.sum(correlation_jnp(a, b, 4, 2) * g), argnums=(0, 1)
    )(f1, f2)
    got = jax.grad(
        lambda a, b: jnp.sum(correlation_pallas(a, b, 4, 2).astype(jnp.float32) * g),
        argnums=(0, 1),
    )(f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16))
    for r, gt_ in zip(ref, got):
        scale = float(jnp.max(jnp.abs(r)))
        assert float(jnp.max(jnp.abs(r - gt_.astype(jnp.float32)))) / scale < 0.02


def test_correlation_pallas_bf16_stride1(rng):
    """s=1 exercises the single-phase MXU path."""
    f1 = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    ref = correlation_jnp(f1, f1, 3, 1)
    got = correlation_pallas(
        f1.astype(jnp.bfloat16), f1.astype(jnp.bfloat16), 3, 1
    )
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - got.astype(jnp.float32)))) / scale < 0.02


def test_shift_unshift_rows_by_index(rng):
    """The pad+reflatten shift helpers are exact row-indexed shifts."""
    from unflow_tpu.ops.pallas.correlation_mxu import (
        _shift_rows_by_index,
        _unshift_rows_by_index,
    )

    r, width = 16, 40
    x = jnp.asarray(rng.standard_normal((2, r, width + 1)).astype(np.float32))
    # shift requires >= r-1 trailing zeros per row for the alias guarantee
    x = x.at[..., width - r :].set(0.0)
    shifted = _shift_rows_by_index(x, width)
    for k in range(r):
        row = np.asarray(x[0, k, : width + 1])
        exp = np.zeros(width, np.float32)
        exp[k:] = row[: width - k]
        np.testing.assert_allclose(np.asarray(shifted[0, k]), exp, rtol=0, atol=0)

    y = jnp.asarray(rng.standard_normal((2, r, width)).astype(np.float32))
    unshifted = _unshift_rows_by_index(y, width)
    for k in range(r):
        # valid below the alias point c + k < width
        valid = width - k
        np.testing.assert_allclose(
            np.asarray(unshifted[0, k, :valid]),
            np.asarray(y[0, k, k : k + valid]),
            rtol=0,
            atol=0,
        )


def test_asymmetric_grid_rejected_on_every_backend(rng):
    """max_displacement not divisible by stride must raise for BOTH
    impls — the jnp path used to silently produce an asymmetric
    displacement grid the pallas path rejects."""
    f = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    for impl in ("jnp", "pallas"):
        with pytest.raises(ValueError):
            correlation(f, f, max_displacement=5, stride=2, impl=impl)


def test_set_default_impl_not_baked_into_jit_cache(rng, monkeypatch):
    """The process-wide default is resolved OUTSIDE the jit: changing it
    after a cached trace must reach the other backend (it used to be
    baked into the first trace and silently ignored)."""
    import unflow_tpu.ops as ops
    import unflow_tpu.ops.pallas.correlation as pallas_mod

    f = jnp.asarray(rng.randn(1, 8, 16, 8).astype(np.float32))
    old = ops.get_default_impl()
    try:
        ops.set_default_impl("jnp")
        a = correlation(f, f, max_displacement=2, stride=1)

        called = []
        orig = pallas_mod.correlation_pallas

        def spy(*args, **kw):
            called.append(True)
            return orig(*args, **kw)

        monkeypatch.setattr(pallas_mod, "correlation_pallas", spy)
        ops.set_default_impl("pallas")
        b = correlation(f, f, max_displacement=2, stride=1)
        assert called, "default-impl change ignored (stale jit cache)"
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5)
    finally:
        ops.set_default_impl(old)


def test_mxu_gate_channel_and_geometry():
    """The MXU dispatch gate falls back to the VPU kernels when the
    channel chunking would stage a non-128-multiple lane extent (Mosaic
    rejects such manual DMAs), and supported() rejects P % s != 0 for
    direct callers."""
    from unflow_tpu.ops.pallas import correlation_mxu as mxu
    from unflow_tpu.ops.pallas.correlation import _mxu_ok

    assert _mxu_ok(jnp.bfloat16, 40, 144, 20, 2, 256)
    assert _mxu_ok(jnp.bfloat16, 40, 144, 20, 2, 128)
    assert not _mxu_ok(jnp.bfloat16, 40, 144, 20, 2, 72)  # 80-lane DMA
    assert not _mxu_ok(jnp.float32, 40, 144, 20, 2, 256)
    assert not mxu.supported(40, 144, 5, 2)  # s does not divide P

    # the odd-channel fallback still computes the right thing (bf16 VPU)
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(1, 16, 32, 72).astype(np.float32)).astype(jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(1, 16, 32, 72).astype(np.float32)).astype(jnp.bfloat16)
    got = correlation_pallas(f1, f2, 4, 2)
    want = correlation_jnp(f1.astype(jnp.float32), f2.astype(jnp.float32), 4, 2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.02, atol=0.02
    )
