"""Trainer mode coverage: train_all cascades, disocc occlusion masking."""

import numpy as np
import pytest

from unflow_tpu.config import Config
from unflow_tpu.data.synthetic import batch_iterator
from unflow_tpu.parallel import create_mesh
from unflow_tpu.train import Trainer

H, W = 64, 128


def _cfg(tmp_path, **overrides):
    cfg = Config()
    cfg.dirs.log = str(tmp_path / "log")
    t = cfg.train
    t.flownet = "S"
    t.batch_size = 2
    t.height, t.width = H, W
    t.num_iters = 1
    t.save_interval = 1
    t.display_interval = 1
    t.compute_dtype = "float32"
    t.corr_impl = "jnp"
    for k, v in overrides.items():
        setattr(t, k, v)
    return cfg


@pytest.mark.slow
def test_train_all_stacked(tmp_path):
    """train_all applies the loss to every cascade stage (reference:
    config `train_all`, core/unsupervised.py)."""
    cfg = _cfg(tmp_path, flownet="SS", train_all=True)
    trainer = Trainer(cfg, tmp_path / "ex", batch_iterator(2, H, W, seed=0),
                      mesh=create_mesh(1))
    logs = trainer.run()
    assert np.isfinite(logs["loss"])
    assert any(k.startswith("stage0/") for k in logs)
    assert any(k.startswith("stage1/") for k in logs)
    trainer.ckpt.close()


@pytest.mark.slow
def test_disocc_occlusion_mode(tmp_path):
    """disocc masking exercises the forward-warp op inside the train step."""
    cfg = _cfg(tmp_path, mask_occlusion="disocc")
    trainer = Trainer(cfg, tmp_path / "ex2", batch_iterator(2, H, W, seed=0),
                      mesh=create_mesh(1))
    logs = trainer.run()
    assert np.isfinite(logs["loss"])
    trainer.ckpt.close()


@pytest.mark.slow
def test_no_occlusion_mode(tmp_path):
    cfg = _cfg(tmp_path, mask_occlusion="")
    trainer = Trainer(cfg, tmp_path / "ex3", batch_iterator(2, H, W, seed=0),
                      mesh=create_mesh(1))
    logs = trainer.run()
    assert np.isfinite(logs["loss"])
    trainer.ckpt.close()
