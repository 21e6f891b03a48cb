"""conv2d_s2_same: forward + phase-decomposed VJP vs XLA's own grads.

The op's forward IS the plain lax conv; what needs proving is that the
phase-decomposed data gradient (both variants) matches jax.grad of the
unmodified conv to float tolerance on every shape class the models hit:
7x7/5x5/3x3 kernels, even and odd spatial dims, C!=F.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unflow_tpu.ops.conv2d import conv2d_s2_same

SHAPES = [
    # (H, W, C, F, K)
    (8, 12, 3, 8, 7),    # conv1-like
    (10, 14, 6, 8, 5),   # conv2/3-like
    (9, 11, 4, 8, 5),    # odd dims
    (8, 10, 8, 16, 3),   # conv4/5/6-like
    (7, 9, 5, 8, 3),     # odd dims, K=3
    (5, 5, 2, 4, 7),     # kernel bigger than out grid
]


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("h,w,c,f,k", SHAPES)
@pytest.mark.parametrize("impl", ["phase", "phase_folded"])
def test_forward_and_grads_match_xla(h, w, c, f, k, impl):
    rng = np.random.RandomState(hash((h, w, c, f, k)) % 2**31)
    x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
    kern = jnp.asarray(rng.randn(k, k, c, f), jnp.float32)
    cot = jnp.asarray(rng.randn(*_ref_conv(x, kern).shape), jnp.float32)

    y = conv2d_s2_same(x, kern, impl)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(_ref_conv(x, kern)))

    def loss_ref(x_, k_):
        return jnp.vdot(_ref_conv(x_, k_), cot)

    def loss_op(x_, k_):
        return jnp.vdot(conv2d_s2_same(x_, k_, impl), cot)

    dx_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    dx_op, dw_op = jax.grad(loss_op, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(
        np.asarray(dx_op), np.asarray(dx_ref), rtol=1e-5, atol=1e-5
    )
    # The filter grad reuses XLA's lowering - expect bit equality.
    np.testing.assert_array_equal(np.asarray(dw_op), np.asarray(dw_ref))


def test_bf16_grads_close():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 14, 6), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(5, 5, 6, 8), jnp.bfloat16)

    def loss(fn):
        def inner(x_, k_):
            return jnp.sum(fn(x_, k_).astype(jnp.float32) ** 2)
        return inner

    dx_ref, dw_ref = jax.grad(loss(_ref_conv), argnums=(0, 1))(x, kern)
    dx_op, dw_op = jax.grad(
        loss(lambda x_, k_: conv2d_s2_same(x_, k_, "phase")), argnums=(0, 1)
    )(x, kern)
    np.testing.assert_allclose(
        np.asarray(dx_op, np.float32), np.asarray(dx_ref, np.float32),
        rtol=0.05, atol=0.05,
    )
    np.testing.assert_array_equal(
        np.asarray(dw_op, np.float32), np.asarray(dw_ref, np.float32)
    )


def test_jit_and_vmap_compose():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 2, 8, 12, 4), jnp.float32)
    kern = jnp.asarray(rng.randn(5, 5, 4, 8), jnp.float32)
    f = jax.jit(lambda x_: jax.vmap(lambda xi: conv2d_s2_same(xi, kern, "phase"))(x_))
    ref = jax.vmap(lambda xi: _ref_conv(xi, kern))(x)
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(ref), rtol=1e-6)
