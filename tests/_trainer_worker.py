"""2-process TRAINER integration worker for tests/test_distributed.py.

Usage: python _trainer_worker.py <process_id> <port> <exp_dir>

Unlike _distributed_worker.py (which hand-builds the train step), this
drives the real ``Trainer`` class end to end on a 2-process mesh —
exercising the multi-host paths the unit tests can't: local-device
model init, per-process batch feeding through ``Trainer.run``, the
COLLECTIVE orbax checkpoint save (every process must enter it), and
lead-gated metrics. Prints the final loss and the restorable step.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> None:
    pid, port, exp_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from unflow_tpu.parallel import init_distributed

    assert init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)

    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.parallel import create_mesh, per_process_batch_size
    from unflow_tpu.train import Trainer

    cfg = Config()
    t = cfg.train
    t.flownet = "S"
    t.height = t.width = 64
    t.batch_size = 8  # global batch; each process feeds 4 rows
    t.num_iters = 4
    t.save_interval = 2
    t.display_interval = 1
    t.image_summary_interval = -1
    t.compute_dtype = "float32"
    t.corr_impl = "jnp"

    local = per_process_batch_size(t.batch_size)

    def local_batches():
        # Same global epoch order on both processes; each slices its rows
        # (mirrors Loader's shard= behavior for the synthetic stream).
        for batch in batch_iterator(t.batch_size, 64, 64, seed=0):
            yield {k: v[pid * local : (pid + 1) * local] for k, v in batch.items()}

    trainer = Trainer(cfg, exp_dir, local_batches(), mesh=create_mesh(8))
    logs = trainer.run()
    latest = trainer.ckpt.latest_step()
    trainer.ckpt.close()
    print(f"TRAINER_DONE {pid} {logs['loss']:.6f} {latest}", flush=True)


if __name__ == "__main__":
    main()
