"""Headline benchmark: unsupervised FlowNetC training throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "pairs/sec/chip", "vs_baseline": N}

Measures the full UnFlow-C unsupervised train step (forward + backward
flow passes, census + 2nd-order smoothness + fb-consistency losses,
Adam update) at the reference's KITTI training crop 320x1152, batch 8,
bf16 towers + f32 losses, Pallas correlation — on one real TPU chip.

Baseline methodology: the reference repo publishes NO throughput numbers
(BASELINE.md). The denominator used here is 10.0 image pairs/sec/chip,
a generous estimate for the TF1 implementation on a 2017-class GPU
(GTX 1080 Ti: ~0.4 s/step at batch 4 for FlowNetC + bidirectional
census losses with custom CUDA ops). Revisit once the reference is
runnable (BASELINE.md north star: >= 5x that).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_SEC = 10.0
BATCH = 8  # best measured throughput point on v5e (103 pairs/s vs 99 at B=12, 91 at B=16)
HEIGHT, WIDTH = 320, 1152
WARMUP = 3
ITERS = 10


def _probe_backend(timeout_s: float = 240.0) -> None:
    """Fail fast (rc=1) if the TPU backend is unreachable.

    On this environment the axon relay can go down for hours; backend
    init then blocks forever in a retry loop, which would hang the
    driver instead of recording a clean failure. Device listing never
    compiles anything, so a generous subprocess timeout is safe.
    """
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        if proc.returncode == 0:
            return
        detail = proc.stderr.decode(errors="replace")[-500:]
    except subprocess.TimeoutExpired:
        detail = f"device listing did not return within {timeout_s:.0f}s"
    print(f"bench.py: backend unreachable, not benchmarking: {detail}", file=sys.stderr)
    sys.exit(1)


def main() -> None:
    _probe_backend()

    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.train import TrainState, build_model, build_optimizer, make_train_step

    cfg = Config()
    t = cfg.train
    t.flownet = "C"
    t.height, t.width = HEIGHT, WIDTH
    t.batch_size = BATCH
    t.compute_dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    model = build_model(cfg)
    sample = jnp.zeros((1, HEIGHT, WIDTH, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))

    batch_np = next(batch_iterator(BATCH, HEIGHT, WIDTH, seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = jax.random.PRNGKey(0)

    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))

    # NOTE: on this environment's tunneled TPU (axon PJRT plugin),
    # jax.block_until_ready returns without waiting; a host fetch of the
    # final loss is the reliable sync (it depends transitively on every
    # step's params, so pipelined steps are fully accounted).
    for _ in range(WARMUP):
        state, logs = step(state, batch, rng)
    float(logs["loss"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, logs = step(state, batch, rng)
    loss = float(logs["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), f"non-finite loss: {loss}"
    pairs_per_sec = BATCH * ITERS / dt

    # MFU accounting (VERDICT r3 item 3): analytic conv/dot FLOPs of the
    # exact traced train step (fwd + bwd, both flow directions, all
    # scales), against the chip's bf16 peak. Pure tracing — no compile.
    from unflow_tpu.utils.flops import matmul_flops, peak_flops

    flops_per_step = matmul_flops(
        make_train_step(model, tx, cfg), state, batch, rng
    )
    flops_per_pair = flops_per_step / BATCH
    step_time_s = dt / ITERS
    model_flops_per_sec = flops_per_step / step_time_s
    peak = peak_flops()
    mfu = model_flops_per_sec / peak if peak else None
    print(
        json.dumps(
            {
                "metric": "unflow_c_train_pairs_per_sec_kitti_crop_320x1152",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/sec/chip",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
                "flops_per_pair": round(flops_per_pair),
                "model_tflops_per_sec": round(model_flops_per_sec / 1e12, 2),
                "mfu": round(mfu, 4) if mfu is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
