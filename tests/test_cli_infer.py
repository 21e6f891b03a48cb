"""Single-pair inference CLI (cli/infer.py): images in, flow files out."""

import numpy as np

from unflow_tpu.cli.infer import main as infer_main
from unflow_tpu.data.io import read_flo, read_image, read_kitti_png_flow, write_image


def test_infer_random_init_writes_flo_and_viz(tmp_path, rng):
    im1 = rng.rand(50, 70, 3).astype(np.float32)
    im2 = rng.rand(50, 70, 3).astype(np.float32)
    write_image(tmp_path / "a.png", im1)
    write_image(tmp_path / "b.png", im2)

    out = tmp_path / "flow.flo"
    viz = tmp_path / "flow_viz.png"
    rc = infer_main(
        [
            "--random-init",
            "--im1", str(tmp_path / "a.png"),
            "--im2", str(tmp_path / "b.png"),
            "--out", str(out),
            "--viz", str(viz),
        ]
    )
    assert rc == 0
    flow = read_flo(out)
    assert flow.shape == (50, 70, 2)  # /64 padding cropped back off
    assert np.isfinite(flow).all()
    assert read_image(viz).shape == (50, 70, 3)


def test_infer_kitti_png_output(tmp_path, rng):
    # Same 50x70 geometry as the .flo test above: the padded forward
    # program is identical, so the persistent compilation cache serves
    # the second CLI run without a fresh XLA compile.
    im1 = rng.rand(50, 70, 3).astype(np.float32)
    im2 = rng.rand(50, 70, 3).astype(np.float32)
    write_image(tmp_path / "a.png", im1)
    write_image(tmp_path / "b.png", im2)

    out = tmp_path / "flow_10.png"
    rc = infer_main(
        [
            "--random-init",
            "--im1", str(tmp_path / "a.png"),
            "--im2", str(tmp_path / "b.png"),
            "--out", str(out),
        ]
    )
    assert rc == 0
    flow, valid = read_kitti_png_flow(out)
    assert flow.shape == (50, 70, 2)
    assert valid.all()  # dense prediction: every pixel valid
