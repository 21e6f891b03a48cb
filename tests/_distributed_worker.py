"""2-process integration worker for tests/test_distributed.py.

Usage: python _distributed_worker.py <process_id> <port>
Runs one full unsupervised train step over the global 8-device mesh
(2 processes x 4 virtual CPU devices), feeding this process's batch
slice via put_global_batch, and prints the resulting loss.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from unflow_tpu.parallel import init_distributed

    assert init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import jax.numpy as jnp

    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.parallel import (
        batch_sharding,
        create_mesh,
        per_process_batch_size,
        put_global_batch,
        replicated,
    )
    from unflow_tpu.train import TrainState, build_model, build_optimizer, make_train_step

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

    batch = next(batch_iterator(t.batch_size, 64, 64, seed=0))
    local = per_process_batch_size(t.batch_size)
    local_batch = {k: v[pid * local : (pid + 1) * local] for k, v in batch.items()}
    global_batch = put_global_batch(local_batch, batch_sharding(mesh))
    assert global_batch["im1"].shape[0] == t.batch_size

    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    _, logs = step(state, global_batch, jax.random.PRNGKey(0))
    print(f"WORKER_LOSS {pid} {float(logs['loss']):.6f}", flush=True)


if __name__ == "__main__":
    main()
