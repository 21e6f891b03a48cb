"""FLOP-accounting tests (utils/flops.py — the bench.py MFU denominator)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unflow_tpu.utils.flops import matmul_flops, peak_flops


def conv(x, k, stride=1):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_conv_flops_exact():
    x = jnp.zeros((2, 8, 8, 16))
    k = jnp.zeros((3, 3, 16, 32))
    # 2 MACs x out elements x fan-in
    assert matmul_flops(conv, x, k) == 2 * (2 * 8 * 8 * 32) * (3 * 3 * 16)


def test_conv_strided_flops():
    x = jnp.zeros((1, 8, 8, 4))
    k = jnp.zeros((3, 3, 4, 8))
    got = matmul_flops(lambda a: conv(a, k, stride=2), x)
    assert got == 2 * (1 * 4 * 4 * 8) * (3 * 3 * 4)


def test_dot_flops_exact():
    a, b = jnp.zeros((3, 5)), jnp.zeros((5, 7))
    assert matmul_flops(lambda x, y: x @ y, a, b) == 2 * 3 * 7 * 5


def test_grad_counts_backward_convs():
    """grad w.r.t. filter adds exactly one conv-sized contraction
    (dW = x * dy) on top of the forward pass."""
    x = jnp.zeros((1, 4, 4, 16))
    k = jnp.zeros((1, 1, 16, 8))
    fwd = matmul_flops(lambda kk: conv(x, kk), k)
    both = matmul_flops(jax.grad(lambda kk: jnp.sum(conv(x, kk) ** 2)), k)
    assert both == 2 * fwd


def test_recurses_into_remat():
    x = jnp.zeros((1, 4, 4, 16))
    k = jnp.zeros((1, 1, 16, 8))

    @jax.checkpoint
    def f(kk):
        return jnp.sum(conv(x, kk) ** 2)

    # remat recomputes the forward inside the backward: fwd + refwd + dW
    fwd = matmul_flops(lambda kk: conv(x, kk), k)
    assert matmul_flops(jax.grad(f), k) == 3 * fwd


def test_elementwise_not_counted():
    assert matmul_flops(lambda x: jnp.tanh(x) + x * 2, jnp.zeros((128,))) == 0


def test_peak_flops_known_kinds():
    class Fake:
        def __init__(self, kind):
            self.device_kind = kind

    assert peak_flops(Fake("TPU v5 lite")) == 197e12
    assert peak_flops(Fake("TPU v5p chip")) == 459e12
    assert peak_flops(Fake("TPU v6e whatever")) == 918e12
    assert peak_flops(Fake("Mystery NPU")) is None


def test_train_step_flops_scale_with_batch():
    """Per-pair FLOPs are batch-invariant on the traced train step."""
    from unflow_tpu.config import Config
    from unflow_tpu.train import (
        TrainState,
        build_model,
        build_optimizer,
        make_train_step,
    )

    def count(bs):
        cfg = Config()
        t = cfg.train
        t.flownet = "S"
        t.height = t.width = 64
        t.batch_size = bs
        t.compute_dtype = "float32"
        model = build_model(cfg)
        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), sample, sample
        )["params"]
        tx = build_optimizer(cfg, params)
        opt = jax.eval_shape(tx.init, params)
        sds = lambda tree: jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
        )
        state = TrainState(
            jax.ShapeDtypeStruct((), jnp.int32), sds(params), sds(opt)
        )
        batch = {
            "im1": jax.ShapeDtypeStruct((bs, 64, 64, 3), jnp.float32),
            "im2": jax.ShapeDtypeStruct((bs, 64, 64, 3), jnp.float32),
        }
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
        return matmul_flops(make_train_step(model, tx, cfg), state, batch, rng)

    f2, f4 = count(2), count(4)
    assert f2 > 0
    np.testing.assert_allclose(f4, 2 * f2, rtol=1e-6)
