"""Conv-ceiling sweep: stride-2 conv bwd + deconv lowerings on-chip.

Measures bench.py's exact train step (UnFlow-C, 320x1152, batch 8,
bf16) across the lowering matrix:

  conv_impl   in {native, phase, phase_folded}  (ops/conv2d.py — the
              stride-2 data gradient: XLA's zero-dilated transposed
              conv costs 4x forward FLOPs, ~75% zeros)
  deconv_impl in {native, phase}                (models/flownet.py::
              _PhaseDeconv — the on-chip measurement its commit said
              'default stays native pending')

Writes benchmarks/conv_ceiling.json with pairs/s + analytic FLOPs per
cell (the FLOP column shifts with the lowering: dilated-zero work is
counted when XLA executes it, not when phase decomposition removes it).

  python scripts/bench_conv_impl.py [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, HEIGHT, WIDTH = 8, 320, 1152


def measure(conv_impl: str, deconv_impl: str, iters: int, warmup: int) -> dict:
    import jax
    import jax.numpy as jnp

    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.train import (
        TrainState,
        build_model,
        build_optimizer,
        make_train_step,
    )
    from unflow_tpu.utils.flops import matmul_flops, peak_flops

    cfg = Config()
    t = cfg.train
    t.flownet = "C"
    t.height, t.width = HEIGHT, WIDTH
    t.batch_size = BATCH
    t.compute_dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    t.conv_impl = conv_impl
    t.deconv_impl = deconv_impl

    model = build_model(cfg)
    sample = jnp.zeros((1, HEIGHT, WIDTH, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)["params"]
    tx = build_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    batch = {
        k: jnp.asarray(v)
        for k, v in next(batch_iterator(BATCH, HEIGHT, WIDTH, seed=0)).items()
    }
    rng = jax.random.PRNGKey(0)
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))

    for _ in range(warmup):
        state, logs = step(state, batch, rng)
    float(logs["loss"])  # tunneled-TPU sync (block_until_ready is a no-op)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, batch, rng)
    loss = float(logs["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss

    flops = matmul_flops(make_train_step(model, tx, cfg), state, batch, rng)
    peak = peak_flops()
    pairs = BATCH * iters / dt
    return {
        "pairs_per_sec": round(pairs, 1),
        "step_ms": round(1e3 * dt / iters, 1),
        "analytic_gflop_per_pair": round(flops / BATCH / 1e9, 1),
        "model_tflops_per_sec": round(flops / (dt / iters) / 1e12, 2),
        "mfu": round(flops / (dt / iters) / peak, 4) if peak else None,
        "loss": round(loss, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--out", default="conv_ceiling.json")
    args = ap.parse_args()

    cells = [
        ("native", "native"),  # bench.py's r4 configuration
        ("phase", "native"),
        ("phase_folded", "native"),
        ("native", "phase"),
        ("phase", "phase"),
    ]
    results = {}
    for conv_impl, deconv_impl in cells:
        key = f"conv={conv_impl},deconv={deconv_impl}"
        print(f"=== {key} ===", flush=True)
        results[key] = measure(conv_impl, deconv_impl, args.iters, args.warmup)
        print(json.dumps(results[key]), flush=True)

    base = results["conv=native,deconv=native"]["pairs_per_sec"]
    best_key = max(results, key=lambda k: results[k]["pairs_per_sec"])
    summary = {
        "geometry": f"UnFlow-C unsupervised train step, {HEIGHT}x{WIDTH} batch {BATCH} bf16",
        "method": f"{args.warmup} warmup + {args.iters} timed steps, loss-fetch sync",
        "cells": results,
        "best": best_key,
        "best_speedup_vs_native": round(
            results[best_key]["pairs_per_sec"] / base, 4
        ),
        "note": ("analytic_gflop_per_pair differs per lowering because the "
                 "zero-dilated data-gradient convs' wasted FLOPs are counted "
                 "when XLA executes them and absent when phase decomposition "
                 "removes them — pairs_per_sec is the comparable column"),
    }
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks")
    with open(os.path.join(bench_dir, args.out), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
