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
