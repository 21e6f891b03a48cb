"""Process-level crash/resume: SIGKILL the train CLI mid-run, restart.

The reference's entire fault-tolerance model is "rerun run.py --ex
<name>": the copied config.ini + the latest tf.train.Saver checkpoint
make the restart idempotent (SURVEY.md §5 failure-detection row). The
library-level resume roundtrip is covered in test_train.py; this test
exercises the real thing — a hard kill of the training *process*
(possibly mid-checkpoint-write) followed by a restart of the CLI — and
asserts the experiment completes from the last finalized checkpoint.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _write_ini(tmp_path: Path) -> Path:
    path = tmp_path / "crash.ini"
    path.write_text(
        "\n".join(
            [
                "[dirs]",
                f"log = {tmp_path / 'log'}",
                "[train]",
                "dataset = synthetic",
                "flownet = S",
                "batch_size = 2",
                "num_devices = 1",
                "height = 64",
                "width = 64",
                "num_iters = 120",
                "display_interval = 1",
                "save_interval = 2",
                "image_summary_interval = -1",
                "compute_dtype = float32",
                "corr_impl = jnp",
            ]
        )
        + "\n"
    )
    return path


def _spawn(ini: Path):
    env = {
        k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip axon plugin registration -> CPU backend
    env["PYTHONPATH"] = str(REPO)
    return subprocess.Popen(
        [
            sys.executable, "-m", "unflow_tpu.cli.train",
            "--config", str(ini), "--ex", "crash",
        ],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO,
    )


def _finalized_ckpt_steps(exp_dir: Path) -> list[int]:
    """Orbax writes into a tmp-suffixed dir and renames on finalize, so
    digit-named entries are exactly the crash-safe restorable steps."""
    ckpts = exp_dir / "checkpoints"
    if not ckpts.is_dir():
        return []
    return sorted(int(p.name) for p in ckpts.iterdir() if p.name.isdigit())


def _steps_logged(metrics: Path) -> list[int]:
    if not metrics.exists():
        return []
    steps = []
    for line in metrics.read_text().splitlines():
        try:
            steps.append(int(json.loads(line)["step"]))
        except (ValueError, KeyError):
            pass  # a torn final line from the kill is expected
    return steps


@pytest.mark.slow
def test_sigkill_mid_training_then_restart_completes(tmp_path):
    ini = _write_ini(tmp_path)
    metrics = tmp_path / "log" / "ex" / "crash" / "metrics.jsonl"

    # Run 1: kill -9 once a FINALIZED checkpoint exists (orbax saves are
    # async — a kill before the first finalize legitimately restarts at
    # step 0, which is the at-most-one-interval data-loss contract, not
    # a resume failure).
    exp_dir = tmp_path / "log" / "ex" / "crash"
    proc = _spawn(ini)
    deadline = time.time() + 600
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                pytest.fail(
                    "run finished before it could be killed:\n"
                    + proc.communicate()[0][-2000:]
                )
            if _finalized_ckpt_steps(exp_dir):
                break
            time.sleep(0.05)
        else:
            proc.kill()
            pytest.fail(
                "no checkpoint finalized in time:\n" + proc.communicate()[0][-2000:]
            )
    finally:
        if proc.poll() is None:
            proc.kill()  # SIGKILL: no cleanup, no atexit, no orbax close
            proc.wait()

    saved = _finalized_ckpt_steps(exp_dir)
    killed_at = max(_steps_logged(metrics) + saved)
    assert killed_at < 120, "run 1 was supposed to die mid-training"

    # Run 2: same --ex resumes from the last finalized checkpoint and
    # completes. The snapshot governs (no --config needed, but passing it
    # again matches how users actually restart).
    proc2 = _spawn(ini)
    out, _ = proc2.communicate(timeout=600)
    assert proc2.returncode == 0, out[-3000:]

    # Resumed, not restarted: the CLI reports a nonzero starting step
    # no later than the kill point (a checkpoint-write in flight when
    # SIGKILL landed must be ignored, never half-restored).
    start = [l for l in out.splitlines() if l.startswith("experiment crash: step ")]
    assert start, out[-2000:]
    resumed_step = int(start[0].split("step ")[1].split(" ")[0])
    assert 0 < resumed_step <= killed_at
    assert resumed_step % 2 == 0  # only save_interval steps are restorable
    assert "done at step 120" in out

    # The metrics stream covers the full run: the resumed segment picks
    # up from the checkpoint (earlier duplicate steps from the crashed
    # segment are fine; data loss past the checkpoint is not).
    steps = _steps_logged(metrics)
    assert max(steps) == 120
    # (last occurrence: the crashed segment may have logged the same
    # step numbers before dying past the checkpoint)
    first_new = len(steps) - 1 - steps[::-1].index(resumed_step + 1)
    resumed_segment = steps[first_new:]
    assert resumed_segment == list(range(resumed_step + 1, 121))

    # And the final state is a loadable checkpoint at step 120.
    sys.path.insert(0, str(REPO))
    from unflow_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(tmp_path / "log" / "ex" / "crash")
    assert ckpt.latest_step() == 120
    ckpt.close()
