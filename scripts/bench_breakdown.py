"""Differential step-time breakdown on the real TPU.

Times: model fwd (2B batched), fwd+bwd with a trivial loss, and the full
unsupervised train step — to apportion step time between the conv/corr
towers and the loss stack. Sync is via scalar fetch (block_until_ready
does not block on the tunneled axon TPU — see .claude/skills/verify).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H, W = 320, 1152
ITERS = 10


def timed(fn, *args, sync):
    for _ in range(3):
        out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(sync(out))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.train import TrainState, build_model, build_optimizer, make_train_step

    cfg = Config()
    t = cfg.train
    t.flownet = "C"
    t.height, t.width = H, W
    t.batch_size = BATCH
    t.compute_dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    model = build_model(cfg)
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))

    batch_np = next(batch_iterator(BATCH, H, W, seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = jax.random.PRNGKey(0)
    n1 = batch["im1"]
    n2 = batch["im2"]
    both1 = jnp.concatenate([n1, n2], axis=0)
    both2 = jnp.concatenate([n2, n1], axis=0)

    @jax.jit
    def fwd(params, a, b):
        flows = model.apply({"params": params}, a, b)
        return flows[-1][0]

    ms_fwd = timed(
        lambda p: fwd(p, both1, both2), params,
        sync=lambda o: jnp.abs(o).sum(),
    )
    print(f"fwd 2B={2*BATCH}: {ms_fwd:.1f} ms")

    @jax.jit
    def fwd_bwd(params, a, b):
        def loss(p):
            flows = model.apply({"params": p}, a, b)
            return sum(jnp.square(f).mean() for stage in flows for f in stage)
        l, g = jax.value_and_grad(loss)(params)
        import optax
        return l + optax.global_norm(g)

    ms_fb = timed(
        lambda p: fwd_bwd(p, both1, both2), params,
        sync=lambda o: o,
    )
    print(f"fwd+bwd trivial-loss 2B: {ms_fb:.1f} ms")

    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))

    def full(state):
        s, logs = step(state, batch, rng)
        return s, logs["loss"]

    for _ in range(3):
        state, l = full(state)
    float(l)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, l = full(state)
    float(l)
    ms_full = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"full train step: {ms_full:.1f} ms "
          f"({BATCH / ms_full * 1e3:.1f} pairs/s)")
    print(f"  -> loss stack + aug + adam overhead: {ms_full - ms_fb:.1f} ms")


if __name__ == "__main__":
    main()
