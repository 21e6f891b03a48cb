"""End-to-end CSS recipe smoke through the real CLI.

Reference recipe (SURVEY.md §3.2): train C -> freeze, train S on the
residual (cS, finetune=C) -> freeze both, train the second S
(csS, finetune=[C, cS]). Exercises config files, experiment dirs,
snapshots, finetune restore, and lowercase freezing end to end on
synthetic data.
"""

import numpy as np
import pytest

from unflow_tpu.cli.train import main as train_main
from unflow_tpu.config import load_config


def _ini(tmp_path, name, flownet, finetune=""):
    path = tmp_path / f"{name}.ini"
    lines = [
        "[dirs]",
        f"log = {tmp_path / 'log'}",
        "[train]",
        "dataset = synthetic",
        f"flownet = {flownet}",
        "batch_size = 2",
        "num_devices = 2",
        "height = 64",
        "width = 64",
        "max_displacement = 4",
        "num_iters = 2",
        "display_interval = 1",
        "save_interval = 2",
        "image_summary_interval = -1",
        "compute_dtype = float32",
        "corr_impl = jnp",
    ]
    if finetune:
        lines.append(f"finetune = {finetune}")
    path.write_text("\n".join(lines) + "\n")
    return path


@pytest.mark.slow
def test_css_recipe_end_to_end(tmp_path):
    import flax.traverse_util as tu

    from unflow_tpu.train.checkpoint import restore_params

    # Stage 1: FlowNetC.
    assert train_main(["--config", str(_ini(tmp_path, "c", "C")), "--ex", "rc_c"]) == 0
    # Stage 2: frozen c + trainable S, initialized from rc_c.
    assert (
        train_main(
            ["--config", str(_ini(tmp_path, "cs", "cS", "rc_c")), "--ex", "rc_cs"]
        )
        == 0
    )
    # Stage 3: frozen c + frozen s + trainable S.
    assert (
        train_main(
            [
                "--config",
                str(_ini(tmp_path, "css", "csS", "rc_c,rc_cs")),
                "--ex",
                "rc_css",
            ]
        )
        == 0
    )

    log = tmp_path / "log" / "ex"
    p_c = restore_params(log / "rc_c")
    p_cs = restore_params(log / "rc_cs")
    p_css = restore_params(log / "rc_css")
    assert set(p_css) == {"stage0_C", "stage1_S", "stage2_S"}

    flat_c = tu.flatten_dict(p_c["stage0_C"])
    flat_cs0 = tu.flatten_dict(p_cs["stage0_C"])
    flat_css0 = tu.flatten_dict(p_css["stage0_C"])
    flat_cs1 = tu.flatten_dict(p_cs["stage1_S"])
    flat_css1 = tu.flatten_dict(p_css["stage1_S"])
    for key in flat_c:
        # stage0 frozen through stages 2-3: identical to the C experiment.
        np.testing.assert_array_equal(flat_c[key], flat_cs0[key])
        np.testing.assert_array_equal(flat_c[key], flat_css0[key])
    for key in flat_cs1:
        # stage1 frozen in stage 3: identical to the cS experiment.
        np.testing.assert_array_equal(flat_cs1[key], flat_css1[key])

    # Snapshots govern the experiments (resume semantics intact).
    snap = load_config(log / "rc_css" / "config.ini")
    assert snap.train.flownet == "csS"
    assert snap.train.finetune == ("rc_c", "rc_cs")
