"""Backward/forward warp ops: golden values and gradient checks."""

import jax.numpy as jnp
import numpy as np

from unflow_tpu.ops.warp import backward_warp, forward_warp, forward_warp_image
from tests.gradcheck import check_grads_fd


def test_backward_warp_zero_flow_is_identity(rng):
    im = jnp.asarray(rng.randn(2, 6, 8, 3).astype(np.float32))
    flow = jnp.zeros((2, 6, 8, 2), jnp.float32)
    out = backward_warp(im, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(im), rtol=1e-6, atol=1e-6)


def test_backward_warp_integer_shift(rng):
    im = rng.randn(1, 6, 8, 2).astype(np.float32)
    # flow u=+2 (sample 2 px to the right): out[y, x] = im[y, x+2]
    flow = np.zeros((1, 6, 8, 2), np.float32)
    flow[..., 0] = 2.0
    out = np.asarray(backward_warp(jnp.asarray(im), jnp.asarray(flow)))
    np.testing.assert_allclose(out[:, :, :6], im[:, :, 2:], rtol=1e-6, atol=1e-6)


def test_backward_warp_subpixel(rng):
    im = rng.randn(1, 4, 6, 1).astype(np.float32)
    flow = np.zeros((1, 4, 6, 2), np.float32)
    flow[..., 1] = 0.5  # halfway between rows
    out = np.asarray(backward_warp(jnp.asarray(im), jnp.asarray(flow)))
    want = 0.5 * (im[:, :3] + im[:, 1:])
    np.testing.assert_allclose(out[:, :3], want, rtol=1e-6, atol=1e-6)


def test_backward_warp_gradcheck(rng):
    im = jnp.asarray(rng.randn(1, 5, 6, 2).astype(np.float32))
    # Keep flow away from integer lattice points (floor() kinks).
    flow = jnp.asarray(rng.uniform(0.2, 0.8, (1, 5, 6, 2)).astype(np.float32))
    check_grads_fd(backward_warp, (im, flow))


def test_forward_warp_zero_flow_density_one():
    flow = jnp.zeros((1, 5, 7, 2), jnp.float32)
    dens = np.asarray(forward_warp(flow))
    np.testing.assert_allclose(dens, np.ones((1, 5, 7, 1)), rtol=1e-6, atol=1e-6)


def test_forward_warp_mass_conservation_in_frame(rng):
    # Small flows that keep everything in-frame: total mass preserved.
    flow = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 8, 8, 2)).astype(np.float32))
    # zero the border so no mass leaves the frame
    flow = flow.at[:, :2].set(0).at[:, -2:].set(0).at[:, :, :2].set(0).at[:, :, -2:].set(0)
    dens = np.asarray(forward_warp(flow))
    np.testing.assert_allclose(dens.sum(), 8 * 8, rtol=1e-5)


def test_forward_warp_disocclusion():
    # All pixels move right by 2: leftmost 2 columns receive nothing.
    flow = np.zeros((1, 4, 8, 2), np.float32)
    flow[..., 0] = 2.0
    dens = np.asarray(forward_warp(jnp.asarray(flow)))[0, :, :, 0]
    np.testing.assert_allclose(dens[:, :2], 0.0, atol=1e-6)
    np.testing.assert_allclose(dens[:, 2:], 1.0, atol=1e-6)


def test_forward_warp_image_shift(rng):
    im = rng.randn(1, 4, 8, 3).astype(np.float32)
    flow = np.zeros((1, 4, 8, 2), np.float32)
    flow[..., 0] = 3.0
    out = np.asarray(forward_warp_image(jnp.asarray(im), jnp.asarray(flow)))
    np.testing.assert_allclose(out[:, :, 3:], im[:, :, :5], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, :, :3], 0.0, atol=1e-6)


def test_forward_warp_gradcheck(rng):
    flow = jnp.asarray(rng.uniform(0.2, 0.8, (1, 4, 5, 2)).astype(np.float32))
    check_grads_fd(forward_warp, (flow,))


def test_backward_warp_packed_matches_reference(rng):
    """The packed single-gather formulation must match the 4-gather
    reference exactly, including far out-of-frame coordinates."""
    import jax

    from unflow_tpu.ops.warp import backward_warp_jnp, backward_warp_packed

    im = jnp.asarray(rng.randn(2, 7, 9, 3).astype(np.float32))
    # Flows spanning in-frame subpixel, exact-integer, and OOB on every
    # side (beyond both -1 and +extent).
    flow = jnp.asarray(rng.uniform(-12, 12, (2, 7, 9, 2)).astype(np.float32))
    flow = flow.at[0, 0, 0].set(jnp.asarray([0.5, 0.5]))
    flow = flow.at[0, 0, 1].set(jnp.asarray([-30.0, 0.0]))
    flow = flow.at[0, 1, 0].set(jnp.asarray([0.0, 30.0]))
    ref = backward_warp_jnp(im, flow)
    out = backward_warp_packed(im, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)

    # Gradients w.r.t. both operands must match too (the packed VJP is
    # one 4C scatter + shift-adds instead of four C scatters).
    g = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))

    def grads(f):
        _, vjp = jax.vjp(f, im, flow)
        return vjp(g)

    gi_ref, gf_ref = grads(backward_warp_jnp)
    gi, gf = grads(backward_warp_packed)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(gi_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref), rtol=1e-5, atol=1e-6)
