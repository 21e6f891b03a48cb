"""Eval metric and visualization tests (SURVEY.md §4 rebuild item e)."""

import jax.numpy as jnp
import numpy as np

from unflow_tpu.eval.metrics import endpoint_error, flow_error_avg, outlier_fraction
from unflow_tpu.eval.flow_viz import flow_error_image, flow_to_color


def test_aee_zero_for_exact():
    gt = jnp.ones((1, 4, 4, 2)) * 3.0
    assert float(flow_error_avg(gt, gt)) == 0.0


def test_aee_known_value():
    gt = jnp.zeros((1, 2, 2, 2))
    pred = jnp.full((1, 2, 2, 2), 3.0)  # epe = sqrt(18)
    np.testing.assert_allclose(float(flow_error_avg(pred, gt)), np.sqrt(18.0), rtol=1e-6)


def test_aee_respects_mask():
    gt = jnp.zeros((1, 2, 2, 2))
    pred = jnp.zeros((1, 2, 2, 2)).at[0, 0, 0].set(10.0)
    mask = jnp.ones((1, 2, 2, 1)).at[0, 0, 0].set(0.0)
    assert float(flow_error_avg(pred, gt, mask)) == 0.0


def test_outlier_fraction():
    gt = jnp.full((1, 1, 4, 2), 100.0)
    pred = jnp.asarray(gt)
    # px0 exact; px1 err 2px (< 3 abs); px2 err 4px but < 5% of |gt|~141;
    # px3 err 20px (> both) -> single outlier
    pred = pred.at[0, 0, 1, 0].add(2.0)
    pred = pred.at[0, 0, 2, 0].add(4.0)
    pred = pred.at[0, 0, 3, 0].add(20.0)
    np.testing.assert_allclose(float(outlier_fraction(pred, gt)), 0.25, rtol=1e-6)


def test_endpoint_error_shape():
    assert endpoint_error(jnp.zeros((2, 3, 4, 2)), jnp.zeros((2, 3, 4, 2))).shape == (
        2, 3, 4, 1,
    )


def test_flow_to_color_properties(rng):
    flow = rng.randn(8, 8, 2).astype(np.float32) * 5
    img = flow_to_color(flow)
    assert img.shape == (8, 8, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # zero flow -> zero saturation -> white
    white = flow_to_color(np.zeros((2, 2, 2), np.float32), max_flow=1.0)
    np.testing.assert_allclose(white, 1.0, atol=1e-6)


def test_flow_error_image(rng):
    gt = np.zeros((4, 4, 2), np.float32)
    pred = gt.copy()
    pred[0, 0] = 50.0
    img = flow_error_image(pred, gt)
    assert img.shape == (4, 4, 3)
    assert img[0, 0, 0] > img[1, 1, 0]  # more red where error is larger
