"""Per-site matmul/conv FLOP breakdown of the bench train step.

Answers "where do the FLOPs go" analytically (traced jaxpr, no hardware,
no compile) — the denominator side of bench.py's MFU number. Backward
convs show up as their transposed-kernel signatures (e.g. a
``rhs=(16, 80, 288, 64)`` entry is a filter-gradient conv).

  python scripts/flops_breakdown.py [--spec C] [--height 320] [--width 1152] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="C")
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=1152)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--conv-impl", default="native",
                    choices=("native", "phase", "phase_folded"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # tracing only

    import jax.numpy as jnp

    from unflow_tpu.config import Config
    from unflow_tpu.train import (
        TrainState,
        build_model,
        build_optimizer,
        make_train_step,
    )
    from unflow_tpu.utils.flops import matmul_flops_by_site

    cfg = Config()
    t = cfg.train
    t.flownet = args.spec
    t.height, t.width = args.height, args.width
    t.batch_size = args.batch
    t.compute_dtype = "bfloat16"
    t.conv_impl = args.conv_impl

    model = build_model(cfg)
    sample = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample, sample)[
        "params"
    ]
    tx = build_optimizer(cfg, params)
    opt_state = jax.eval_shape(tx.init, params)
    sds = lambda tree: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )
    state = TrainState(
        jax.ShapeDtypeStruct((), jnp.int32), sds(params), sds(opt_state)
    )
    batch = {
        k: jax.ShapeDtypeStruct(
            (args.batch, args.height, args.width, 3), jnp.float32
        )
        for k in ("im1", "im2")
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    sites = matmul_flops_by_site(make_train_step(model, tx, cfg), state, batch, rng)
    total = sum(sites.values())
    print(f"total matmul/conv FLOPs per step: {total / 1e12:.2f} TF "
          f"({total / args.batch / 1e9:.1f} GF/pair)")
    for key, fl in sorted(sites.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{100 * fl / total:5.1f}%  {fl / 1e9:8.1f} GF  {key}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
