"""Downsample / resize ops."""

import jax.numpy as jnp
import numpy as np

from unflow_tpu.ops.downsample import downsample, downsample_flow, upsample2x_bilinear


def test_downsample_average(rng):
    x = rng.randn(2, 8, 12, 3).astype(np.float32)
    out = np.asarray(downsample(jnp.asarray(x), 4))
    want = x.reshape(2, 2, 4, 3, 4, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_downsample_identity(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    np.testing.assert_allclose(np.asarray(downsample(x, 1)), np.asarray(x))


def test_downsample_flow_rescale():
    flow = jnp.ones((1, 4, 4, 2), jnp.float32) * 8.0
    out = np.asarray(downsample_flow(flow, 2, rescale=True))
    np.testing.assert_allclose(out, 4.0 * np.ones((1, 2, 2, 2)), rtol=1e-6)


def test_upsample2x_constant():
    x = jnp.full((1, 3, 4, 2), 2.5, jnp.float32)
    out = np.asarray(upsample2x_bilinear(x))
    assert out.shape == (1, 6, 8, 2)
    np.testing.assert_allclose(out, 2.5, rtol=1e-6)
