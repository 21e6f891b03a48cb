"""Per-example prediction autopsy of a trained checkpoint.

Loads an experiment's latest checkpoint and prints, for each of a few
held-out synthetic pairs, the predicted vs ground-truth flow statistics
(per-example mean/std and AEE). This is the instrument that diagnosed
the r5 input-independence collapse: a net parked at the zero-flow basin
predicts an IDENTICAL near-constant flow for every example (pred std
~0.1 px, same mean everywhere), which a scalar AEE curve cannot
distinguish from "slightly wrong per-example motion".

(Reference analog: none — upstream debugging was visual, via
src/eval_gui.py's flow panels. This is the numeric equivalent.)

  python scripts/checkpoint_autopsy.py --exp log/ex/heldout/affine_off \
      [--hw 128 256] [--batch 8] [--grad-clip 25.0] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True, help="experiment dir with checkpoints/")
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=777_000)
    ap.add_argument("--max-shift", type=float, default=8.0)
    ap.add_argument("--flownet", default="C")
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="must match the training config (optimizer-state "
                         "tree shape differs with clipping on)")
    ap.add_argument("--supervised", action="store_true",
                    help="checkpoint was trained supervised (opt-state "
                         "tree must match for restore)")
    ap.add_argument("--cpu", action="store_true", help="run on CPU")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from unflow_tpu.augment import normalize
    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.models import full_res_flow
    from unflow_tpu.train import TrainState, build_model, build_optimizer
    from unflow_tpu.train.checkpoint import CheckpointManager
    from unflow_tpu.train.trainer import DEFAULT_NORMALIZATION

    h, w = args.hw
    cfg = Config()
    t = cfg.train
    t.flownet = args.flownet
    t.height, t.width = h, w
    t.compute_dtype = "float32" if args.cpu else "bfloat16"
    t.grad_clip_norm = args.grad_clip
    t.supervised = args.supervised

    model = build_model(cfg)
    sample = jnp.zeros((1, h, w, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample, sample)["params"]
    ck = CheckpointManager(args.exp)
    tx = build_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, tx.init(params))
    state = ck.restore(state)
    print(f"restored step {int(state.step)} from {args.exp}")

    mean, std = DEFAULT_NORMALIZATION
    batch = next(batch_iterator(args.batch, h, w, seed=args.seed,
                                supervised=True, mode="affine",
                                max_shift=args.max_shift))
    n1 = normalize(jnp.asarray(batch["im1"]), mean, std)
    n2 = normalize(jnp.asarray(batch["im2"]), mean, std)
    stages = model.apply({"params": state.params}, n1, n2)
    flow = np.asarray(full_res_flow(stages[-1], h, w))
    gt = batch["flow"]

    pred_means = []
    for i in range(args.batch):
        f, g = flow[i], gt[i]
        pred_means.append([f[..., 0].mean(), f[..., 1].mean()])
        print(f"ex{i}: pred mean=({f[..., 0].mean():+.2f},{f[..., 1].mean():+.2f})"
              f" std=({f[..., 0].std():.2f},{f[..., 1].std():.2f})"
              f"  gt mean=({g[..., 0].mean():+.2f},{g[..., 1].mean():+.2f})"
              f" std=({g[..., 0].std():.2f},{g[..., 1].std():.2f})"
              f"  aee={np.mean(np.linalg.norm(f - g, axis=-1)):.2f}")
    spread = float(np.std(np.asarray(pred_means), axis=0).mean())
    print(f"cross-example spread of predicted means: {spread:.3f} px "
          f"({'INPUT-INDEPENDENT COLLAPSE' if spread < 0.25 else 'input-dependent'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
