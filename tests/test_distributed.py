"""Multi-host support: per-process batch slicing, global-batch assembly,
and a real 2-process coordination-service integration test (slow)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unflow_tpu.data.base import Example, Loader
from unflow_tpu.parallel import (
    batch_sharding,
    create_mesh,
    init_distributed,
    is_lead_process,
    per_process_batch_size,
    process_shard,
    put_global_batch,
)


def test_single_process_defaults():
    assert init_distributed() is False  # no coordinator configured: no-op
    assert is_lead_process()
    assert process_shard() == (0, 1)
    assert per_process_batch_size(8) == 8


def test_loader_shard_union_matches_unsharded(tmp_path, rng):
    """Two processes' sharded streams concatenate to exactly the
    single-host stream (same seed -> same global epoch order)."""
    from unflow_tpu.data.io import write_image

    examples = []
    for i in range(12):
        im = rng.rand(8, 8, 3).astype(np.float32)
        write_image(tmp_path / f"{i}.png", np.full_like(im, i / 12.0))
        examples.append(
            Example(im1=str(tmp_path / f"{i}.png"), im2=str(tmp_path / f"{i}.png"))
        )

    def stream(shard, batch_size):
        loader = Loader(
            examples, batch_size=batch_size, load_hw=(8, 8),
            seed=7, loop=False, num_threads=1, shard=shard,
        )
        return [b["im1"] for b in loader]

    full = stream((0, 1), 4)
    half0 = stream((0, 2), 2)
    half1 = stream((1, 2), 2)
    assert len(full) == len(half0) == len(half1) == 3
    for f, a, b in zip(full, half0, half1):
        np.testing.assert_array_equal(f, np.concatenate([a, b], axis=0))


def test_loader_shard_validation(tmp_path, rng):
    from unflow_tpu.data.io import write_image

    write_image(tmp_path / "a.png", rng.rand(8, 8, 3).astype(np.float32))
    ex = [Example(im1=str(tmp_path / "a.png"), im2=str(tmp_path / "a.png"))]
    with pytest.raises(ValueError):
        Loader(ex, batch_size=1, load_hw=(8, 8), shard=(2, 2))


def test_put_global_batch_single_process():
    mesh = create_mesh(8)
    sharding = batch_sharding(mesh)
    batch = {"im1": np.arange(8 * 4, dtype=np.float32).reshape(8, 4)}
    out = put_global_batch(batch, sharding)
    assert out["im1"].sharding == sharding
    np.testing.assert_array_equal(np.asarray(out["im1"]), batch["im1"])


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    """Spawn 2 real processes (4 virtual CPU devices each), run one full
    unsupervised train step over the global 8-device mesh with per-process
    batch feeding, and check both agree with the single-process loss."""
    # Single-process reference on this test process's own 8 devices.
    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.parallel import replicated
    from unflow_tpu.train import (
        TrainState,
        build_model,
        build_optimizer,
        make_train_step,
    )

    cfg = Config()
    t = cfg.train
    t.flownet = "S"
    t.height = t.width = 64
    t.batch_size = 8
    t.compute_dtype = "float32"
    t.corr_impl = "jnp"

    mesh = create_mesh(8)
    model = build_model(cfg)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sample, sample)["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    state = jax.device_put(state, replicated(mesh))
    batch = put_global_batch(
        next(batch_iterator(8, 64, 64, seed=0)), batch_sharding(mesh)
    )
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    _, logs = step(state, batch, jax.random.PRNGKey(0))
    ref_loss = float(logs["loss"])

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = Path(__file__).parent / "_distributed_worker.py"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip axon plugin registration
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    losses = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
        for line in out.splitlines():
            if line.startswith("WORKER_LOSS"):
                _, pid, loss = line.split()
                losses[int(pid)] = float(loss)
    assert set(losses) == {0, 1}, outs
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-4)


@pytest.mark.slow
def test_two_process_trainer_run(tmp_path):
    """The REAL Trainer on a 2-process mesh: local-device init,
    per-process batch feeding through Trainer.run, the collective orbax
    save (a lead-only save deadlocks the pod — regression), lead-gated
    metrics. Both processes must finish with the same loss and a
    restorable final checkpoint."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = Path(__file__).parent / "_trainer_worker.py"
    exp = tmp_path / "ex_dist"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(exp)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    done = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
        for line in out.splitlines():
            if line.startswith("TRAINER_DONE"):
                _, pid, loss, latest = line.split()
                done[int(pid)] = (float(loss), int(latest))
    assert set(done) == {0, 1}, outs
    np.testing.assert_allclose(done[0][0], done[1][0], rtol=1e-6)
    assert done[0][1] == 4  # final step checkpoint finalized
    # metrics written by the lead process only
    assert (exp / "metrics.jsonl").exists()
    lines = (exp / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 4  # display_interval=1, one writer
