"""Minimal input-dependence probe of the FlowNet stack.

The r5 autopsy showed SUPERVISED stream training collapsing to an
input-independent constant prediction (benchmarks/warmstart_probe.json:
train loss parks at the constant-predictor plateau, cross-example
prediction spread 0.02 px). The single-batch overfit (round 3) never
tested input-dependence — one batch's flow field can be memorized
through biases alone.

This probe removes every confound (Trainer augmentation, photometric
noise, bf16, grad clip) and asks the narrowest question: can the raw
model + supervised loss fit TWO alternating fixed batches — 2*B distinct
(input -> target) pairs, which is impossible without conditioning on the
input? Factors are then re-enabled one at a time via flags to find which
one kills learning.

(Reference analog: none — upstream never needed this; cf.
src/e2eflow/core/supervised.py for the loss under test.)

  python scripts/input_dependence_probe.py [--steps 2000] [--lr 1e-3]
      [--dtype float32|bfloat16] [--photometric] [--batches 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--report-every", type=int, default=200)
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=2,
                    help="number of distinct fixed batches cycled")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--flownet", default="C")
    ap.add_argument("--photometric", action="store_true",
                    help="re-enable the Trainer's photometric aug")
    ap.add_argument("--data-mode", choices=("affine", "translate"),
                    default="affine")
    ap.add_argument("--max-shift", type=float, default=8.0,
                    help="synthetic max displacement in px. 8 keeps ALL "
                         "prediction scales sub-pixel (flow2 sees <=2 px, "
                         "flow6 <=0.13 px) — a harder regime for the "
                         "coarse-to-fine decoder than KITTI-scale motion")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unflow_tpu.augment import normalize, random_photometric
    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.losses.supervised import supervised_loss
    from unflow_tpu.models import full_res_flow
    from unflow_tpu.train import build_model
    from unflow_tpu.train.trainer import DEFAULT_NORMALIZATION

    h, w = args.hw
    cfg = Config()
    cfg.train.flownet = args.flownet
    cfg.train.height, cfg.train.width = h, w
    cfg.train.compute_dtype = args.dtype
    model = build_model(cfg)

    it = batch_iterator(args.batch, h, w, seed=4242, supervised=True,
                        mode=args.data_mode, max_shift=args.max_shift)
    fixed = [next(it) for _ in range(args.batches)]
    mean, std = DEFAULT_NORMALIZATION

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)))["params"]
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, im1, im2, gt, key):
        def loss_fn(p):
            a, b = im1, im2
            if args.photometric:
                a, b = random_photometric(key, [a, b])
            stages = model.apply({"params": p}, normalize(a, mean, std),
                                 normalize(b, mean, std))
            total, logs = supervised_loss(stages[-1], gt)
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, up), opt, loss

    @jax.jit
    def predict(params, im1, im2):
        stages = model.apply({"params": params}, normalize(im1, mean, std),
                             normalize(im2, mean, std))
        return full_res_flow(stages[-1], h, w)

    dev = [(jnp.asarray(b["im1"]), jnp.asarray(b["im2"]), jnp.asarray(b["flow"]))
           for b in fixed]
    held_it = batch_iterator(args.batch, h, w, seed=777_000, supervised=True,
                             mode=args.data_mode, max_shift=args.max_shift)
    held = [next(held_it) for _ in range(2)]
    held = [(jnp.asarray(b["im1"]), jnp.asarray(b["im2"]),
             jnp.asarray(b["flow"])) for b in held]

    def _stats(params, batches):
        spreads, aees, zero = [], [], []
        for im1, im2, gt in batches:
            flow = np.asarray(predict(params, im1, im2))
            gtn = np.asarray(gt)
            means = flow.mean(axis=(1, 2))          # (B, 2)
            spreads.append(means.std(axis=0).mean())
            aees.append(np.mean(np.linalg.norm(flow - gtn, axis=-1)))
            zero.append(np.mean(np.linalg.norm(gtn, axis=-1)))
        return float(np.mean(aees)), float(np.mean(zero)), float(np.mean(spreads))

    def report(params, tag):
        aee, zero_aee, spread = _stats(params, dev[: min(len(dev), 8)])
        h_aee, h_zero, _ = _stats(params, held)
        print(f"{tag}: train aee={aee:.3f} (zero {zero_aee:.3f}) "
              f"spread={spread:.3f} px | HELD-OUT aee={h_aee:.3f} "
              f"(zero {h_zero:.3f})", flush=True)
        return aee, zero_aee

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(args.steps):
        im1, im2, gt = dev[i % len(dev)]
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, im1, im2, gt, sub)
        if (i + 1) % args.report_every == 0:
            print(f"step {i+1} loss={float(loss):.3f} "
                  f"[{time.perf_counter()-t0:.0f}s]", flush=True)
            report(params, f"  step {i+1}")
    aee, zero = report(params, "final")
    print("INPUT-DEPENDENT" if aee < 0.5 * zero else "COLLAPSED/INCONCLUSIVE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
