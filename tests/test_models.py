"""FlowNet model tests: shapes, stacking, freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unflow_tpu.models import (
    FLOW_SCALE,
    FlowNetC,
    FlowNetS,
    FlowNetStack,
    full_res_flow,
    param_labels,
)

H, W = 64, 128  # divisible by 64


def test_flownet_s_shapes(rng):
    x = jnp.asarray(rng.randn(2, H, W, 6).astype(np.float32))
    model = FlowNetS()
    params = model.init(jax.random.PRNGKey(0), x)
    flows = model.apply(params, x)
    assert len(flows) == 5
    for i, f in enumerate(flows):
        s = 4 * 2**i
        assert f.shape == (2, H // s, W // s, 2), (i, f.shape)


def test_flownet_c_shapes(rng):
    im1 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    model = FlowNetC(corr_impl="jnp")
    params = model.init(jax.random.PRNGKey(0), im1, im2)
    flows = model.apply(params, im1, im2)
    assert flows[0].shape == (1, H // 4, W // 4, 2)
    assert flows[4].shape == (1, H // 64, W // 64, 2)


def test_flownet_c_shared_towers(rng):
    model = FlowNetC(corr_impl="jnp")
    im = jnp.zeros((1, H, W, 3))
    params = model.init(jax.random.PRNGKey(0), im, im)
    names = set(params["params"].keys())
    # one shared tower (conv1..conv3), not two
    assert "conv1" in names and "conv1_1" not in names


def test_full_res_flow_scaling():
    flows = [jnp.ones((1, H // 4, W // 4, 2))] + [
        jnp.zeros((1, H // (4 * 2**i), W // (4 * 2**i), 2)) for i in range(1, 5)
    ]
    out = full_res_flow(flows, H, W)
    assert out.shape == (1, H, W, 2)
    np.testing.assert_allclose(np.asarray(out), 4.0 * FLOW_SCALE, rtol=1e-5)


def test_stack_css_structure(rng):
    im1 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    model = FlowNetStack(spec="cS", corr_impl="jnp")
    params = model.init(jax.random.PRNGKey(0), im1, im2)
    stages = model.apply(params, im1, im2)
    assert len(stages) == 2 and len(stages[0]) == 5
    labels = param_labels("cS", params["params"])
    assert labels["stage0_C"] == "frozen"
    assert labels["stage1_S"] == "trainable"


def test_stack_frozen_stage_gets_no_gradient(rng):
    im1 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    model = FlowNetStack(spec="sS", corr_impl="jnp")
    params = jax.jit(model.init)(jax.random.PRNGKey(0), im1, im2)

    def loss(p):
        stages = model.apply(p, im1, im2)
        return sum(jnp.sum(jnp.square(f)) for f in stages[-1])

    # jitted so the persistent compile cache makes warm suite runs fast
    grads = jax.jit(jax.grad(loss))(params)["params"]
    g_frozen = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["stage0_S"], 0.0
    )
    g_train = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["stage1_S"], 0.0
    )
    assert g_frozen == 0.0
    assert g_train > 0.0


def test_backward_flow_shared_params(rng):
    """Backward flow = same params applied to swapped inputs (reference
    flownet.py::flownet backward_flow=True semantics)."""
    im1 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    model = FlowNetS()
    x_fw = jnp.concatenate([im1, im2], -1)
    x_bw = jnp.concatenate([im2, im1], -1)
    params = model.init(jax.random.PRNGKey(0), x_fw)
    f_fw = model.apply(params, x_fw)
    f_bw = model.apply(params, x_bw)
    assert f_fw[0].shape == f_bw[0].shape
    assert not np.allclose(np.asarray(f_fw[0]), np.asarray(f_bw[0]))


def test_stack_glue_grad_finite_at_zero_brightness_error():
    """CSS/train_all regression: the stage-glue brightness error must have
    a finite VJP when im1 - warp(im2) == 0 exactly.

    jnp.linalg.norm's gradient is x/||x|| -> NaN at zero; constant equal
    images make the difference exactly zero at every pixel (bf16 training
    hit this by step 2 of CSS train_all). The glue now uses an
    epsilon-guarded norm.
    """
    im = jnp.full((1, H, W, 3), 0.5, jnp.float32)
    model = FlowNetStack(spec="CS", corr_impl="jnp")
    params = jax.jit(model.init)(jax.random.PRNGKey(0), im, im)

    def loss(p):
        stages = model.apply(p, im, im)
        return sum(jnp.sum(jnp.square(f)) for st in stages for f in st)

    # jitted so the persistent compile cache makes warm suite runs fast
    grads = jax.jit(jax.grad(loss))(params)["params"]
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)


def test_pair_flipped_tower_dedup_exact(rng):
    """pair_flipped_im2=True (single shared-tower pass + pair flip) must
    reproduce the plain two-tower-pass bidirectional apply exactly:
    convolution commutes with batch permutation, so the dedup is not an
    approximation."""
    n1 = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))
    n2 = jnp.asarray(rng.randn(2, H, W, 3).astype(np.float32))

    def interleave(a, b):
        return jnp.stack([a, b], axis=1).reshape((2 * a.shape[0],) + a.shape[1:])

    im1 = interleave(n1, n2)
    im2 = interleave(n2, n1)
    for spec in ("C", "CS"):
        model = FlowNetStack(spec=spec, corr_impl="jnp")
        params = jax.jit(model.init)(jax.random.PRNGKey(0), n1, n2)
        # jitted (cacheable); static flag keeps the two programs distinct
        apply = jax.jit(
            lambda p, a, b, flipped: model.apply(p, a, b, pair_flipped_im2=flipped),
            static_argnums=3,
        )
        ref = apply(params, im1, im2, False)
        dedup = apply(params, im1, im2, True)
        for st_ref, st_dedup in zip(ref, dedup):
            for f_ref, f_dedup in zip(st_ref, st_dedup):
                np.testing.assert_allclose(
                    np.asarray(f_dedup), np.asarray(f_ref), rtol=0, atol=1e-5
                )


def test_phase_deconv_matches_native():
    """_PhaseDeconv is checkpoint-compatible and numerically identical to
    nn.ConvTranspose (same param tree, same outputs) through a full
    FlowNetS — the decoder impl is a pure runtime choice."""
    import chex
    import numpy as np

    from unflow_tpu.models.flownet import FlowNetS

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 128, 6).astype(np.float32))
    native = FlowNetS(compute_dtype=jnp.float32, deconv_impl="native")
    phase = FlowNetS(compute_dtype=jnp.float32, deconv_impl="phase")
    p_native = native.init(jax.random.PRNGKey(7), x)["params"]
    p_phase = phase.init(jax.random.PRNGKey(7), x)["params"]
    # identical param trees (same names, shapes, and init draws)
    chex.assert_trees_all_equal(p_native, p_phase)
    out_native = native.apply({"params": p_native}, x)
    out_phase = phase.apply({"params": p_native}, x)  # cross-impl params
    for a, b in zip(out_native, out_phase):
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)


def _assert_remat_matches_plain(spec):
    """remat=True is a pure memory/schedule choice: identical param tree,
    identical outputs, identical gradients (per-stage jax.checkpoint
    recomputes activations in the backward pass)."""
    import chex

    rng = np.random.RandomState(3)
    im1 = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    kw = dict(spec=spec, compute_dtype=jnp.float32, corr_impl="jnp",
              max_displacement=4)
    plain = FlowNetStack(**kw)
    remat = FlowNetStack(remat=True, **kw)
    p_plain = jax.jit(plain.init)(jax.random.PRNGKey(1), im1, im2)["params"]
    p_remat = jax.jit(remat.init)(jax.random.PRNGKey(1), im1, im2)["params"]
    chex.assert_trees_all_equal(p_plain, p_remat)

    def loss(model):
        def fn(params):
            stages = model.apply({"params": params}, im1, im2,
                                 pair_flipped_im2=False)
            return sum(jnp.sum(jnp.square(f)) for st in stages for f in st)
        return fn

    l_plain, g_plain = jax.jit(jax.value_and_grad(loss(plain)))(p_plain)
    l_remat, g_remat = jax.jit(jax.value_and_grad(loss(remat)))(p_plain)
    np.testing.assert_allclose(float(l_remat), float(l_plain), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_remat_stack_matches_plain():
    # Single stage in the default suite (compile-time budget, VERDICT r3
    # item 1); the cascade variant runs under --runslow below.
    _assert_remat_matches_plain("S")


@pytest.mark.slow
def test_remat_cascade_matches_plain():
    _assert_remat_matches_plain("CS")


def test_remat_bidirectional_pair_flip_static():
    """The pair_flipped_im2 bool stays a STATIC arg under nn.remat
    (it branches the tower structure; tracing it would fail)."""
    rng = np.random.RandomState(4)
    n1 = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    n2 = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    im1 = jnp.stack([n1, n2], 1).reshape(4, H, W, 3)
    im2 = jnp.stack([n2, n1], 1).reshape(4, H, W, 3)
    model = FlowNetStack(spec="C", compute_dtype=jnp.float32,
                         corr_impl="jnp", max_displacement=4, remat=True)
    params = model.init(jax.random.PRNGKey(2), im1, im2)
    ref = model.apply(params, im1, im2)
    dedup = jax.jit(
        lambda p, a, b: model.apply(p, a, b, pair_flipped_im2=True)
    )(params, im1, im2)
    for st_ref, st_dedup in zip(ref, dedup):
        for f_ref, f_dedup in zip(st_ref, st_dedup):
            np.testing.assert_allclose(
                np.asarray(f_dedup), np.asarray(f_ref), rtol=0, atol=1e-5
            )


@pytest.mark.parametrize("impl", ["phase", "phase_folded"])
def test_phase_bwd_conv_matches_native(impl):
    """conv_impl=phase[_folded] only changes the stride-2 convs' DATA
    GRADIENT lowering: identical param tree, bit-identical forward
    (the forward IS the plain lax conv), gradients equal to float
    tolerance through a full FlowNetC."""
    import chex

    rng = np.random.RandomState(11)
    im1 = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32))
    kw = dict(compute_dtype=jnp.float32, corr_impl="jnp", max_displacement=4)
    native = FlowNetC(conv_impl="native", **kw)
    phased = FlowNetC(conv_impl=impl, **kw)
    p_native = jax.jit(native.init)(jax.random.PRNGKey(5), im1, im2)["params"]
    p_phase = jax.jit(phased.init)(jax.random.PRNGKey(5), im1, im2)["params"]
    chex.assert_trees_all_equal(p_native, p_phase)

    out_native = native.apply({"params": p_native}, im1, im2)
    out_phase = phased.apply({"params": p_native}, im1, im2)
    for a, b in zip(out_native, out_phase):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(model):
        def inner(p):
            flows = model.apply({"params": p}, im1, im2)
            return sum(jnp.sum(f**2) for f in flows)
        return inner

    g_native = jax.jit(jax.grad(loss(native)))(p_native)
    g_phase = jax.jit(jax.grad(loss(phased)))(p_native)
    chex.assert_trees_all_close(g_phase, g_native, rtol=1e-4, atol=1e-5)
