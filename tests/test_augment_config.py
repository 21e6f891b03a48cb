"""Augmentation and config-system tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unflow_tpu.augment import normalize, random_crop_flip, random_photometric
from unflow_tpu.config import Config, load_config, prepare_experiment_dir, save_config


def test_photometric_shared_across_pair(rng):
    key = jax.random.PRNGKey(0)
    im = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    out1, out2 = random_photometric(key, [im, im], noise_stddev=0.0)
    # identical inputs + shared params + no noise -> identical outputs
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)
    assert not np.allclose(np.asarray(out1), np.asarray(im))
    assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0


def test_photometric_batch_independent(rng):
    key = jax.random.PRNGKey(1)
    im = jnp.asarray(np.tile(rng.rand(1, 8, 8, 3).astype(np.float32), (4, 1, 1, 1)))
    (out,) = random_photometric(key, [im], noise_stddev=0.0)
    # different examples get different transforms
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))


def test_crop_flip_shapes_and_flow_negation(rng):
    key = jax.random.PRNGKey(0)
    ims = [jnp.asarray(rng.rand(2, 20, 30, 3).astype(np.float32))]
    flow = jnp.ones((2, 20, 30, 2))
    found_flip = False
    for seed in range(8):
        out, flows = random_crop_flip(
            jax.random.PRNGKey(seed), ims, (16, 24), flows=[flow]
        )
        assert out[0].shape == (2, 16, 24, 3)
        u = float(flows[0][0, 0, 0, 0])
        v = float(flows[0][0, 0, 0, 1])
        assert v == 1.0
        if u == -1.0:
            found_flip = True
    assert found_flip  # at least one flip in 8 seeds


def test_crop_too_large_raises():
    with pytest.raises(ValueError):
        random_crop_flip(jax.random.PRNGKey(0), [jnp.zeros((1, 8, 8, 3))], (16, 16))


def test_normalize():
    im = jnp.full((1, 2, 2, 3), 0.5)
    out = normalize(im, (127.5, 127.5, 127.5), 127.5)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.train.flownet = "CSS"
    cfg.train.finetune = ("ex_c", "ex_cs")
    cfg.train.learning_rate = 5e-5
    cfg.train.train_all = True
    path = tmp_path / "config.ini"
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded.train.flownet == "CSS"
    assert loaded.train.finetune == ("ex_c", "ex_cs")
    assert loaded.train.learning_rate == 5e-5
    assert loaded.train.train_all is True


def test_config_dataset_override(tmp_path):
    path = tmp_path / "config.ini"
    path.write_text(
        "[train]\ndataset = kitti\nbatch_size = 4\n\n"
        "[train_kitti]\nbatch_size = 8\nheight = 320\n"
    )
    cfg = load_config(path)
    assert cfg.train.batch_size == 8
    assert cfg.train.height == 320


def test_config_unknown_key_raises(tmp_path):
    path = tmp_path / "config.ini"
    path.write_text("[train]\nbogus_key = 1\n")
    with pytest.raises(KeyError):
        load_config(path)


def test_experiment_snapshot_governs_resume(tmp_path):
    cfg = Config()
    cfg.dirs.log = str(tmp_path)
    cfg.train.flownet = "C"
    ex = prepare_experiment_dir(cfg, "myex")
    assert (ex / "config.ini").exists()
    # Second call with a different config must keep the snapshot.
    cfg2 = Config()
    cfg2.dirs.log = str(tmp_path)
    cfg2.train.flownet = "CSS"
    prepare_experiment_dir(cfg2, "myex")
    snap = load_config(ex / "config.ini")
    assert snap.train.flownet == "C"


# ---------------------------------------------------------------------------
# Affine geometric augmentation
# ---------------------------------------------------------------------------


def test_affine_identity_params():
    from unflow_tpu.augment import apply_affine
    from unflow_tpu.augment.affine import AffineParams

    b, h, w = 2, 16, 24
    rng0 = np.random.RandomState(0)
    im1 = jnp.asarray(rng0.rand(b, h, w, 3).astype(np.float32))
    im2 = jnp.asarray(rng0.rand(b, h, w, 3).astype(np.float32))
    flow = jnp.asarray(rng0.randn(b, h, w, 2).astype(np.float32))
    mask = jnp.ones((b, h, w, 1), jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(2), (b, 2, 2))
    zero = jnp.zeros((b, 2))
    params = AffineParams(eye, zero, eye, zero)
    ims, flows, masks = apply_affine(params, [im1, im2], [flow], [mask])
    np.testing.assert_allclose(np.asarray(ims[0]), np.asarray(im1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ims[1]), np.asarray(im2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(flows[0]), np.asarray(flow), atol=1e-4)
    np.testing.assert_allclose(np.asarray(masks[0]), np.asarray(mask), atol=1e-6)


def test_affine_relative_translation_shifts_flow():
    """Pure relative translation d on frame 2 => f' = f - d (interior)."""
    from unflow_tpu.augment import apply_affine
    from unflow_tpu.augment.affine import AffineParams

    b, h, w = 1, 16, 24
    rng0 = np.random.RandomState(1)
    im1 = jnp.asarray(rng0.rand(b, h, w, 3).astype(np.float32))
    im2 = jnp.asarray(rng0.rand(b, h, w, 3).astype(np.float32))
    flow = jnp.asarray(np.full((b, h, w, 2), 1.5, np.float32))
    eye = jnp.broadcast_to(jnp.eye(2), (b, 2, 2))
    zero = jnp.zeros((b, 2))
    d = jnp.asarray([[2.0, -1.0]])
    params = AffineParams(eye, zero, eye, d)
    _, flows, _ = apply_affine(params, [im1, im2], [flow])
    np.testing.assert_allclose(
        np.asarray(flows[0][0, 4:-4, 4:-4]),
        np.asarray(flow[0, 4:-4, 4:-4] - d[0]),
        atol=1e-4,
    )


def test_affine_gt_consistency_under_random_transform():
    """backward_warp(im2', f') must reproduce im1' wherever the GT was
    photometrically consistent before augmentation (interior pixels)."""
    from unflow_tpu.augment import random_affine
    from unflow_tpu.ops import backward_warp

    b, h, w = 1, 40, 56
    rng0 = np.random.RandomState(2)
    # Smooth base image so bilinear interpolation error stays small.
    base = rng0.rand(h + 12, w + 12, 3).astype(np.float32)
    for _ in range(8):
        base = 0.25 * (
            np.roll(base, 1, 0) + np.roll(base, -1, 0)
            + np.roll(base, 1, 1) + np.roll(base, -1, 1)
        )
    # True flow: constant integer translation (tx, ty) = (3, 2):
    # im2[y, x] = im1[y - 2, x - 3]  =>  im1[p] = im2[p + f], f = (3, 2).
    ty, tx = 2, 3
    im1 = base[6 : 6 + h, 6 : 6 + w]
    im2 = base[6 - ty : 6 - ty + h, 6 - tx : 6 - tx + w]
    flow = np.broadcast_to(
        np.asarray([tx, ty], np.float32), (b, h, w, 2)
    ).copy()

    ims, flows, _ = random_affine(
        jax.random.PRNGKey(7),
        [jnp.asarray(im1[None]), jnp.asarray(im2[None])],
        flows=[jnp.asarray(flow)],
        translate=0.05, rotate_deg=8.0, zoom_min=0.95, zoom_max=1.1,
        rel_translate=0.02, rel_rotate_deg=5.0, rel_zoom=0.05,
    )
    rewarped = backward_warp(ims[1], flows[0])
    inner = np.s_[0, 10:-10, 10:-10, :]
    # Residual is double-bilinear interpolation noise; it converges to 0
    # as the image gets smoother (verified 3/8/20 blur passes:
    # 0.0135/0.0079/0.0043 mean).
    err = np.abs(np.asarray(rewarped)[inner] - np.asarray(ims[0])[inner])
    assert float(err.mean()) < 0.012, float(err.mean())
    assert float(err.max()) < 0.12, float(err.max())


def test_affine_zoom_mask_invalidates_outside():
    """Zoom OUT (scale < 1 content) samples outside the source frame at
    the borders -> mask must be invalidated there, valid inside."""
    from unflow_tpu.augment import apply_affine
    from unflow_tpu.augment.affine import AffineParams

    b, h, w = 1, 16, 16
    im = jnp.ones((b, h, w, 3), jnp.float32)
    flow = jnp.zeros((b, h, w, 2), jnp.float32)
    mask = jnp.ones((b, h, w, 1), jnp.float32)
    # Output->source scale 1.5: borders read outside the source.
    a = jnp.broadcast_to(1.5 * jnp.eye(2), (b, 2, 2))
    zero = jnp.zeros((b, 2))
    params = AffineParams(a, zero, a, zero)
    _, _, masks = apply_affine(params, [im, im], [flow], [mask])
    m = np.asarray(masks[0][0, :, :, 0])
    assert m[0, 0] == 0.0 and m[-1, -1] == 0.0
    assert m[h // 2, w // 2] == 1.0


@pytest.mark.slow
def test_affine_in_train_config_smoke():
    """Train step runs with affine aug on (tiny synthetic, CPU)."""
    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.train import TrainState, build_model, build_optimizer, make_train_step

    cfg = Config()
    t = cfg.train
    t.flownet = "S"
    t.height, t.width = 64, 64
    t.batch_size = 2
    t.compute_dtype = "float32"
    t.aug_rotate = 5.0
    t.aug_translate = 0.03
    t.aug_zoom_min, t.aug_zoom_max = 0.95, 1.05
    t.aug_rel_rotate = 2.0

    model = build_model(cfg)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    batch = {k: jnp.asarray(v) for k, v in next(
        batch_iterator(2, 64, 64, seed=0)
    ).items()}
    step = jax.jit(make_train_step(model, tx, cfg))
    new_state, logs = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))


def test_affine_flows_without_masks_synthesizes_validity():
    """Remapped GT is zero-filled where the pull-back leaves the source
    frame; apply_affine must return that validity as a mask even when
    the caller passes none (supervised training would otherwise consume
    corrupted GT at full weight)."""
    import jax
    import jax.numpy as jnp

    from unflow_tpu.augment.affine import AffineParams, apply_affine

    b, h, w = 1, 16, 24
    ident = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (b, 2, 2))
    # strong global translation: a band of output pixels pulls from
    # outside the source frame
    t = jnp.full((b, 2), 6.0, jnp.float32)
    params = AffineParams(ident, t, ident, t)
    rng = np.random.RandomState(0)
    ims = [jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)) for _ in range(2)]
    flow = jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32))
    out_ims, out_flows, out_masks = apply_affine(params, ims, flows=[flow])
    assert out_masks is not None and len(out_masks) == 1
    m = np.asarray(out_masks[0])
    assert m.min() == 0.0 and m.max() == 1.0  # both regions present
    # valid exactly where the pull-back stays inside the frame
    assert m[0, :, -1, 0].max() == 0.0  # right band pulls from x >= w
    assert m[0, 0, 0, 0] == 1.0


def test_order_swap_prob_extremes(rng):
    from unflow_tpu.augment import random_order_swap

    key = jax.random.PRNGKey(0)
    im1 = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
    a, b = random_order_swap(key, im1, im2, 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(im1))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(im2))
    a, b = random_order_swap(key, im1, im2, 1.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(im2))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(im1))


def test_order_swap_per_example_and_paired(rng):
    """The swap decision is drawn per example, and each example either
    keeps or swaps the WHOLE pair (never mixes frames)."""
    from unflow_tpu.augment import random_order_swap

    im1 = jnp.asarray(rng.rand(64, 4, 4, 3).astype(np.float32))
    im2 = jnp.asarray(rng.rand(64, 4, 4, 3).astype(np.float32))
    a, b = random_order_swap(jax.random.PRNGKey(1), im1, im2, 0.5)
    a, b = np.asarray(a), np.asarray(b)
    n_swap = n_keep = 0
    for i in range(64):
        if np.array_equal(a[i], np.asarray(im2)[i]):
            assert np.array_equal(b[i], np.asarray(im1)[i])
            n_swap += 1
        else:
            assert np.array_equal(a[i], np.asarray(im1)[i])
            assert np.array_equal(b[i], np.asarray(im2)[i])
            n_keep += 1
    # p=0.5 over 64 draws: both outcomes occur (P[fail] ~ 2^-63)
    assert n_swap > 0 and n_keep > 0


def test_order_swap_rejected_for_supervised(tmp_path):
    from unflow_tpu.train import build_model, build_optimizer, make_train_step

    cfg = Config()
    cfg.train.supervised = True
    cfg.train.aug_swap_prob = 0.5
    cfg.train.flownet = "S"
    model = build_model(cfg)
    with pytest.raises(ValueError, match="unsupervised"):
        make_train_step(model, None, cfg)
