"""End-to-end Evaluator test: train -> checkpoint -> restore -> metrics."""

import numpy as np
import pytest

from unflow_tpu.config import Config
from unflow_tpu.data.base import Example
from unflow_tpu.data.io import write_image, write_flo
from unflow_tpu.data.synthetic import batch_iterator
from unflow_tpu.eval import Evaluator
from unflow_tpu.parallel import create_mesh
from unflow_tpu.train import Trainer

H, W = 64, 128


@pytest.mark.slow
def test_evaluator_end_to_end(tmp_path, rng):
    cfg = Config()
    cfg.dirs.log = str(tmp_path / "log")
    t = cfg.train
    t.flownet = "S"
    t.batch_size = 2
    t.height, t.width = H, W
    t.num_iters = 1
    t.save_interval = 1
    t.compute_dtype = "float32"
    t.corr_impl = "jnp"

    ex_dir = tmp_path / "ex"
    trainer = Trainer(cfg, ex_dir, batch_iterator(2, H, W, seed=0), mesh=create_mesh(1))
    trainer.run()
    trainer.ckpt.close()

    # Fabricate an eval example with GT at a non-/64 size (tests padding).
    im1 = rng.rand(50, 70, 3).astype(np.float32)
    im2 = rng.rand(50, 70, 3).astype(np.float32)
    gt = rng.randn(50, 70, 2).astype(np.float32)
    write_image(tmp_path / "a.png", im1)
    write_image(tmp_path / "b.png", im2)
    write_flo(tmp_path / "gt.flo", gt)
    examples = [
        Example(
            im1=str(tmp_path / "a.png"), im2=str(tmp_path / "b.png"),
            flow=str(tmp_path / "gt.flo"), meta={"id": "000000"},
        )
    ]

    evaluator = Evaluator(cfg, ex_dir)
    metrics = evaluator.run(examples, output_dir=tmp_path / "dump", output_format="viz")
    assert metrics["n"] == 1
    assert np.isfinite(metrics["aee"]) and metrics["aee"] >= 0
    assert 0.0 <= metrics["fl"] <= 1.0
    assert (tmp_path / "dump" / "000000_flow.png").exists()
    assert (tmp_path / "dump" / "000000_err.png").exists()

    # predict() crops the /64 padding back off
    flow = evaluator.predict(im1, im2)
    assert flow.shape == (50, 70, 2)


def test_evaluator_noc_occ_breakdown(tmp_path, rng):
    """With a noc source attached, run() reports aee_noc / fl_noc /
    aee_occ, and the all-pixel AEE is their pixel-weighted mean."""
    import jax

    from unflow_tpu.data.io import write_kitti_png_flow
    from unflow_tpu.train import build_model

    cfg = Config()
    t = cfg.train
    t.flownet = "S"
    t.height, t.width = H, W
    t.compute_dtype = "float32"
    t.corr_impl = "jnp"

    model = build_model(cfg)
    sample = np.zeros((1, H, W, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), sample, sample)["params"]

    im1 = rng.rand(H, W, 3).astype(np.float32)
    im2 = rng.rand(H, W, 3).astype(np.float32)
    gt = (rng.randn(H, W, 2) * 3).astype(np.float32)
    valid = np.ones((H, W, 1), np.float32)
    noc_valid = valid.copy()
    noc_valid[:, W // 4 :] = 0.0  # left quarter non-occluded
    write_image(tmp_path / "a.png", im1)
    write_image(tmp_path / "b.png", im2)
    write_kitti_png_flow(tmp_path / "gt.png", gt, valid)
    write_kitti_png_flow(tmp_path / "gt_noc.png", gt, noc_valid)

    ex = Example(
        im1=str(tmp_path / "a.png"), im2=str(tmp_path / "b.png"),
        flow=str(tmp_path / "gt.png"), flow_format="kitti_png",
        noc=str(tmp_path / "gt_noc.png"),
    )
    evaluator = Evaluator(cfg, tmp_path, params=params)
    m = evaluator.run([ex])
    for key in ("aee_noc", "fl_noc", "aee_occ"):
        assert key in m and np.isfinite(m[key]), m
    n_noc, n_occ = float(noc_valid.sum()), float((valid - noc_valid).sum())
    weighted = (m["aee_noc"] * n_noc + m["aee_occ"] * n_occ) / (n_noc + n_occ)
    np.testing.assert_allclose(m["aee"], weighted, rtol=1e-5)

    # without a noc source the breakdown keys stay absent
    ex_plain = Example(
        im1=ex.im1, im2=ex.im2, flow=ex.flow, flow_format="kitti_png"
    )
    m2 = evaluator.run([ex_plain])
    assert "aee_noc" not in m2 and "aee_occ" not in m2


def test_evaluator_mixed_gt_and_subdir_stems(tmp_path, rng):
    """AEE averages over GT-carrying examples only (GT-less scenes must
    not dilute it), collect= returns the GUI entries without re-running,
    and a Sintel-style 'scene/frame' id dumps into a scene subdir
    without stem collisions."""
    import jax

    from unflow_tpu.config import Config
    from unflow_tpu.train import build_model

    cfg = Config()
    t = cfg.train
    t.flownet = "S"
    t.height, t.width = H, W
    t.compute_dtype = "float32"

    model = build_model(cfg)
    sample = np.zeros((1, H, W, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), sample, sample)["params"]

    im1 = rng.rand(H, W, 3).astype(np.float32)
    gt = rng.randn(H, W, 2).astype(np.float32)
    write_image(tmp_path / "a.png", im1)
    write_flo(tmp_path / "gt.flo", gt)
    with_gt = Example(
        im1=str(tmp_path / "a.png"), im2=str(tmp_path / "a.png"),
        flow=str(tmp_path / "gt.flo"), meta={"id": "alley_1/frame_0001"},
    )
    no_gt = Example(
        im1=str(tmp_path / "a.png"), im2=str(tmp_path / "a.png"),
        meta={"id": "alley_1/frame_0002"},
    )

    evaluator = Evaluator(cfg, tmp_path, params=params)
    m_gt_only = evaluator.run([with_gt])
    m_mixed = evaluator.run(
        [with_gt, no_gt], output_dir=tmp_path / "dump", collect=2
    )
    assert m_mixed["n"] == 2 and m_mixed["n_gt"] == 1
    np.testing.assert_allclose(m_mixed["aee"], m_gt_only["aee"], rtol=1e-6)
    assert (tmp_path / "dump" / "alley_1" / "frame_0001.flo").exists()
    assert (tmp_path / "dump" / "alley_1" / "frame_0002.flo").exists()
    assert len(m_mixed["entries"]) == 2
    assert "gt" in m_mixed["entries"][0] and "gt" not in m_mixed["entries"][1]


def test_kitti_png_flow_roundtrip_rounds(tmp_path):
    """Quantization rounds to nearest 1/64 px (a floor cast would bias
    every value by up to -1/64 and break round-trips)."""
    from unflow_tpu.data.io import read_kitti_png_flow, write_kitti_png_flow

    flow = np.array([[[0.015, -0.015], [1.0 / 64, 5.25]]], np.float32)
    write_kitti_png_flow(tmp_path / "f.png", flow)
    back, valid = read_kitti_png_flow(tmp_path / "f.png")
    np.testing.assert_allclose(back, np.round(flow * 64) / 64, atol=1e-6)


def test_eval_batching_matches_serial(tmp_path, rng):
    """eval_batch groups SAME-SHAPE pairs into one forward; metrics,
    dumps, and collected entries must match the serial path exactly
    (mixed shapes fall into separate groups)."""
    import jax

    from unflow_tpu.config import Config
    from unflow_tpu.train import build_model

    cfg = Config()
    t = cfg.train
    t.flownet = "S"
    t.height, t.width = H, W
    t.compute_dtype = "float32"

    model = build_model(cfg)
    sample = np.zeros((1, H, W, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), sample, sample)["params"]
    evaluator = Evaluator(cfg, tmp_path, params=params)

    examples = []
    for i, (h, w) in enumerate([(H, W)] * 3 + [(50, 70)] * 2):
        im1 = rng.rand(h, w, 3).astype(np.float32)
        im2 = rng.rand(h, w, 3).astype(np.float32)
        gt = rng.randn(h, w, 2).astype(np.float32)
        write_image(tmp_path / f"a{i}.png", im1)
        write_image(tmp_path / f"b{i}.png", im2)
        write_flo(tmp_path / f"g{i}.flo", gt)
        examples.append(Example(
            im1=str(tmp_path / f"a{i}.png"), im2=str(tmp_path / f"b{i}.png"),
            flow=str(tmp_path / f"g{i}.flo"), meta={"id": f"{i:06d}"},
        ))

    serial = evaluator.run(examples, collect=5, eval_batch=1,
                           output_dir=tmp_path / "d1")
    batched = evaluator.run(examples, collect=5, eval_batch=4,
                            output_dir=tmp_path / "d2")
    assert batched["n"] == serial["n"] == 5
    np.testing.assert_allclose(batched["aee"], serial["aee"], rtol=1e-6)
    np.testing.assert_allclose(batched["fl"], serial["fl"], rtol=1e-6)
    for a, b in zip(serial["entries"], batched["entries"]):
        np.testing.assert_allclose(b["flow"], a["flow"], atol=1e-5)
    d1 = sorted(p.name for p in (tmp_path / "d1").iterdir())
    d2 = sorted(p.name for p in (tmp_path / "d2").iterdir())
    assert d1 == d2 and len(d1) == 5
