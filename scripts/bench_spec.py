"""Train-throughput bench for an arbitrary stack spec (C, CS, csS, CSS...).

Same measurement contract as bench.py (full unsupervised train step at
the KITTI 320x1152 crop on one real chip; host-fetch sync), but
parameterized so the cascade numbers (VERDICT round-1 item 3) are
measured, not estimated.

  python scripts/bench_spec.py --spec csS --batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="C")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=1152)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--train-all", action="store_true")
    args = ap.parse_args()

    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.train import TrainState, build_model, build_optimizer, make_train_step

    cfg = Config()
    t = cfg.train
    t.flownet = args.spec
    t.height, t.width = args.height, args.width
    t.batch_size = args.batch
    t.train_all = args.train_all
    t.compute_dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"

    model = build_model(cfg)
    sample = jnp.zeros((1, t.height, t.width, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    batch = {
        k: jnp.asarray(v)
        for k, v in next(batch_iterator(args.batch, t.height, t.width, seed=0)).items()
    }
    rng = jax.random.PRNGKey(0)
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))

    for _ in range(3):
        state, logs = step(state, batch, rng)
    float(logs["loss"])  # sync (axon block_until_ready returns early)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, logs = step(state, batch, rng)
    loss = float(logs["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss
    pairs = args.batch * args.iters / dt

    # Spec-matched TF1 denominator (BASELINE.md "Spec-matched throughput
    # denominators"): one trained net = 3F, frozen stage = 1F, both flow
    # directions; TF1 C = 10 pairs/s at 6F.
    cost_f = sum(3 if c.isupper() else 1 for c in (args.spec or "C")) * 2
    baseline = 10.0 * 6.0 / cost_f
    print(
        json.dumps(
            {
                "metric": f"unflow_{args.spec}_train_pairs_per_sec_{args.height}x{args.width}",
                "value": round(pairs, 3),
                "unit": "pairs/sec/chip",
                "batch": args.batch,
                "spec_matched_baseline": round(baseline, 2),
                "vs_baseline": round(pairs / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
