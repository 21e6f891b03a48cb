"""Loss-stack analytic tests (SURVEY.md §4 rebuild strategy, item b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unflow_tpu.losses import (
    charbonnier_loss,
    compute_losses,
    create_outgoing_mask,
    second_order_loss,
    smoothness_loss,
    supervised_loss,
    ternary_loss,
    unsupervised_loss,
)
from unflow_tpu.models.flownet import FLOW_SCALE


def test_charbonnier_zero_input():
    x = jnp.zeros((1, 4, 4, 2))
    # ((0)^2 + eps^2)^alpha = eps^(2*alpha)
    want = 0.001 ** 0.9
    np.testing.assert_allclose(float(charbonnier_loss(x)), want, rtol=1e-5)


def test_charbonnier_mask_zeroes_loss(rng):
    x = jnp.asarray(rng.randn(1, 4, 4, 2).astype(np.float32))
    mask = jnp.zeros((1, 4, 4, 1))
    np.testing.assert_allclose(float(charbonnier_loss(x, mask)), 0.0, atol=1e-8)


def test_smoothness_zero_for_constant_flow():
    flow = jnp.full((1, 8, 8, 2), 3.7)
    # Reference scaling SUMS the directional/component charbonnier means
    # (2x the overall mean), so the floor for exact-zero deltas is
    # 2 * charbonnier(0).
    eps_floor = 2 * 0.001 ** 0.9
    assert float(smoothness_loss(flow)) <= eps_floor + 1e-6
    assert float(second_order_loss(flow)) <= eps_floor + 1e-6


def test_second_order_zero_for_linear_flow():
    # Linearly varying flow has zero second derivative.
    ramp = jnp.arange(8, dtype=jnp.float32)[None, None, :, None]
    flow = jnp.broadcast_to(ramp, (1, 8, 8, 1))
    flow = jnp.concatenate([flow, 2 * flow], -1)
    eps_floor = 2 * 0.001 ** 0.9
    assert float(second_order_loss(flow)) <= eps_floor + 1e-6
    assert float(smoothness_loss(flow)) > eps_floor  # first-order is not zero


def test_smoothness_reference_scaling():
    """The smooth terms SUM their component charbonnier means instead of
    averaging (reference: losses.py returns loss_u + loss_v / gx + gy) —
    halving them would train at half the paper's regularization."""
    rng = np.random.RandomState(0)
    flow = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    dx = flow[:, :, 1:, :] - flow[:, :, :-1, :]
    dy = flow[:, 1:, :, :] - flow[:, :-1, :, :]
    want = float(charbonnier_loss(dx)) + float(charbonnier_loss(dy))
    np.testing.assert_allclose(float(smoothness_loss(flow)), want, rtol=1e-6)

    h = flow[:, :, 2:, :] - 2.0 * flow[:, :, 1:-1, :] + flow[:, :, :-2, :]
    v = flow[:, 2:, :, :] - 2.0 * flow[:, 1:-1, :, :] + flow[:, :-2, :, :]
    d1 = flow[:, 2:, 2:, :] - 2.0 * flow[:, 1:-1, 1:-1, :] + flow[:, :-2, :-2, :]
    d2 = flow[:, 2:, :-2, :] - 2.0 * flow[:, 1:-1, 1:-1, :] + flow[:, :-2, 2:, :]
    want2 = sum(float(charbonnier_loss(t)) for t in (h, v, d1, d2)) / 2.0
    np.testing.assert_allclose(float(second_order_loss(flow)), want2, rtol=1e-6)


def test_ternary_zero_for_identical_frames(rng):
    im = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    mask = jnp.ones((1, 16, 16, 1))
    loss_same = float(ternary_loss(im, im, mask, max_distance=2))
    im_other = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    loss_diff = float(ternary_loss(im, im_other, mask, max_distance=2))
    # identical frames leave only the charbonnier eps floor
    assert loss_same <= 0.001 ** 0.9 + 1e-6
    assert loss_diff > 100 * loss_same


def test_outgoing_mask():
    flow = np.zeros((1, 4, 8, 2), np.float32)
    flow[..., 0] = 3.0  # everything moves right 3 px
    mask = np.asarray(create_outgoing_mask(jnp.asarray(flow)))[0, :, :, 0]
    np.testing.assert_allclose(mask[:, :5], 1.0)
    np.testing.assert_allclose(mask[:, 5:], 0.0)


def test_compute_losses_consistent_flows_unoccluded(rng):
    # Constant consistent forward/backward flows: no fb inconsistency,
    # no occlusion -> occ and fb terms ~0.
    im1 = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    flow = jnp.zeros((1, 16, 16, 2))
    terms = compute_losses(im1, im2, flow, flow)
    eps_floor = 0.001 ** 0.9
    assert float(terms["occ"]) <= 2 * eps_floor + 1e-6
    assert float(terms["fb"]) <= 2 * eps_floor + 1e-6


def test_compute_losses_modes(rng):
    im = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    flow = jnp.asarray(rng.rand(1, 16, 16, 2).astype(np.float32))
    for mode in ("fb", "disocc", ""):
        terms = compute_losses(im, im, flow, -flow, mask_occlusion=mode)
        assert all(np.isfinite(float(v)) for v in terms.values())
    with pytest.raises(ValueError):
        compute_losses(im, im, flow, flow, mask_occlusion="bogus")


def test_unsupervised_loss_pyramid(rng):
    im1 = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    flows_fw = [
        jnp.asarray(rng.randn(1, 64 // (4 * 2**i), 128 // (4 * 2**i), 2).astype(np.float32))
        for i in range(5)
    ]
    flows_bw = [jnp.asarray(-np.asarray(f)) for f in flows_fw]
    # jitted so the persistent compile cache makes warm suite runs fast
    total, logs = jax.jit(unsupervised_loss)(im1, im2, flows_fw, flows_bw)
    assert np.isfinite(float(total)) and float(total) > 0
    assert "ternary/scale0" in logs and "smooth_2nd/scale4" in logs


def test_supervised_loss_zero_at_gt(rng):
    gt = jnp.asarray(rng.randn(1, 64, 64, 2).astype(np.float32) * 4)
    # Build predictions that exactly reproduce a constant GT at all scales.
    gt_const = jnp.full((1, 64, 64, 2), 2.5)
    flows = [
        jnp.full((1, 64 // (4 * 2**i), 64 // (4 * 2**i), 2), 2.5 / (4 * 2**i))
        / (FLOW_SCALE / (2**i))
        for i in range(5)
    ]
    total, _ = supervised_loss(flows, gt_const)
    floor, _ = supervised_loss(flows, gt_const * 0 + gt_const)  # identical
    assert float(total) == pytest.approx(float(floor))
    worse, _ = supervised_loss(flows, gt_const + 3.0)
    assert float(worse) > float(total)


def test_supervised_loss_sparse_mask(rng):
    gt = jnp.full((1, 32, 32, 2), 1.0)
    flows = [
        jnp.zeros((1, 32 // (4 * 2**i), 32 // (4 * 2**i), 2)) for i in range(4)
    ]
    mask0 = jnp.zeros((1, 32, 32, 1))
    total0, _ = supervised_loss(flows, gt, mask0)
    # eps floor only (charbonnier of masked-zero field)
    total1, _ = supervised_loss(flows, gt, jnp.ones_like(mask0))
    assert float(total0) < float(total1)


def test_border_mask_degenerate_extent_not_all_zero():
    """2*distance >= extent used to produce an all-zero mask (empty .at[]
    slice), silently zeroing every loss term it gates; the distance is
    now clamped so some interior survives."""
    from unflow_tpu.losses.terms import create_border_mask

    m = create_border_mask((1, 5, 64, 1), 3)
    assert float(jnp.sum(m)) > 0
    m2 = create_border_mask((1, 64, 64, 1), 3)  # normal case unchanged
    np.testing.assert_allclose(
        float(jnp.sum(m2)), (64 - 6) * (64 - 6), rtol=1e-6
    )


def test_outgoing_mask_bf16_flow_uses_f32_coords():
    """bf16 flow on wide frames: coordinate math must run in f32 (bf16
    cannot represent integer positions past 256)."""
    from unflow_tpu.losses.terms import create_outgoing_mask

    w = 1024
    flow = jnp.zeros((1, 2, w, 2), jnp.bfloat16)
    m = create_outgoing_mask(flow)
    # zero flow never leaves the frame — every pixel valid, incl. x>256
    np.testing.assert_allclose(np.asarray(m, np.float32), 1.0)
    # unit rightward flow leaves exactly at the last column
    flow1 = jnp.ones((1, 2, w, 2), jnp.bfloat16) * jnp.asarray([1, 0], jnp.bfloat16)
    m1 = np.asarray(create_outgoing_mask(flow1), np.float32)
    assert m1[0, 0, w - 1, 0] == 0.0 and m1[0, 0, w - 2, 0] == 1.0
