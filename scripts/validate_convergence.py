"""Convergence validation: overfit one batch, supervised and unsupervised.

Structural sanity for the full pipeline (model -> losses -> optimizer):
a FlowNetC must be able to drive AEE toward zero on a single fixed
synthetic batch with known ground truth. Measured on TPU v5e:

  supervised   : AEE 8.75 -> ~1.0 in 600 steps (f32, Adam 1e-3)
  unsupervised : AEE 8.75 -> 0.71 in 1200 steps at the reference's
                 lr 1e-4. NOTE the objective has a zero-flow basin
                 (loss ~364 vs ~96 at the true flow); higher LRs
                 (>=2e-4) explode early and settle there — the paper's
                 1e-4 matters.

Run: python scripts/validate_convergence.py [--unsup] [--steps N]

This is deliberately NOT in tests/ — it needs minutes of real-TPU time;
the fast analytic equivalents live in tests/test_losses.py and
tests/test_train.py.

CAUTION (r5): single-batch overfit speed does NOT transfer to stream
training — one batch can be memorized through biases alone, input-
independently. For stream/generalization work use lr 1e-4 unclipped
(1e-3 diverges within 200 steps on a stream) and max_shift >= 32 at
128x256 (see scripts/input_dependence_probe.py and
benchmarks/heldout_generalization.json for the full r5 diagnosis).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from unflow_tpu.augment import normalize
from unflow_tpu.data.synthetic import batch_iterator
from unflow_tpu.losses import supervised_loss, unsupervised_loss
from unflow_tpu.models import FlowNetC, full_res_flow
from unflow_tpu.train.trainer import DEFAULT_NORMALIZATION


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--unsup", action="store_true", help="unsupervised objective")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()

    h, w = 128, 256
    batch = next(batch_iterator(4, h, w, seed=0, supervised=True))
    im1, im2 = jnp.asarray(batch["im1"]), jnp.asarray(batch["im2"])
    gt = jnp.asarray(batch["flow"])
    mean, std = DEFAULT_NORMALIZATION
    n1, n2 = normalize(im1, mean, std), normalize(im2, mean, std)

    model = FlowNetC(compute_dtype=jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), n1, n2)["params"]
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            flows_fw = model.apply({"params": p}, n1, n2)
            if args.unsup:
                flows_bw = model.apply({"params": p}, n2, n1)
                total, _ = unsupervised_loss(im1, im2, flows_fw, flows_bw)
            else:
                total, _ = supervised_loss(flows_fw, gt)
            return total

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), opt2, loss

    @jax.jit
    def aee(params):
        flows = model.apply({"params": params}, n1, n2)
        f = full_res_flow(flows, h, w)
        return jnp.mean(jnp.linalg.norm(f - gt, axis=-1))

    baseline = float(jnp.mean(jnp.linalg.norm(gt, axis=-1)))
    start = float(aee(params))
    print(f"zero-prediction baseline AEE: {baseline:.3f}; init AEE: {start:.3f}")
    for i in range(1, args.steps + 1):
        params, opt, loss = step(params, opt)
        if i % 100 == 0:
            print(f"step {i}: loss {float(loss):.3f} aee {float(aee(params)):.3f}")
    final = float(aee(params))
    ok = final < 0.5 * min(baseline, start)
    print(f"final AEE {final:.3f} -> {'OK' if ok else 'FAILED (no convergence)'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
