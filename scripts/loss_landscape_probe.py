"""Probe the unsupervised loss landscape along the zero-flow -> GT-flow line.

VERDICT r4 item 1c: the r4 held-out experiment recorded generalizes:false
and the suspected cause was a zero-flow local basin on census-degenerate
data. This script evaluates the full paper objective (census + 2nd-order
smoothness + fb + occ prior) at flow pyramids alpha * GT for a sweep of
alpha, on a batch of synthetic pairs, per motion mode. If the landscape
tilts monotonically toward alpha=1 the data has learnable signal; a
plateau or a bump between 0 and 1 is the basin the optimizer falls into.

(Reference analog: none — src/e2eflow has no landscape tooling; this is
diagnostic scaffolding for the environment-feasible generalization
experiment, cf. src/eval_gui.py as upstream's only correctness probe.)

  python scripts/loss_landscape_probe.py [--hw 128 256] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gt_pyramid(gt_full, num_levels=5):
    """Full-res GT flow (B,H,W,2) -> raw-network-unit pyramids.

    Inverts losses/unsupervised.py's scaling: level i (res 1/(4*2^i))
    applies flow_px = pred * FLOW_SCALE / 2^i with flow_px in level
    pixels, so pred_i = downsample(gt, f)/f * 2^i / FLOW_SCALE, f=4*2^i.
    """
    import jax.numpy as jnp

    from unflow_tpu.models.flownet import FLOW_SCALE
    from unflow_tpu.ops import downsample

    pyr = []
    for i in range(num_levels):
        f = 4 * (2 ** i)
        g = downsample(gt_full, f) / f
        pyr.append((g * (2 ** i) / FLOW_SCALE).astype(jnp.float32))
    return pyr


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-shift", type=float, default=8.0)
    ap.add_argument("--seed", type=int, default=777_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.losses.unsupervised import unsupervised_loss

    @jax.jit
    def loss_at(alpha, im1, im2, pyr_fw, pyr_bw):
        total, _ = unsupervised_loss(
            im1, im2,
            [alpha * p for p in pyr_fw], [alpha * p for p in pyr_bw],
        )
        return total

    h, w = args.hw
    alphas = [0.0, 0.25, 0.5, 0.75, 1.0, 1.25]
    out = {"geometry": f"{h}x{w} batch {args.batch}", "alphas": alphas,
           "modes": {}}
    for mode in ("translate", "affine"):
        batch = next(batch_iterator(args.batch, h, w, seed=args.seed,
                                    supervised=True, max_shift=args.max_shift,
                                    mode=mode))
        im1 = jnp.asarray(batch["im1"])
        im2 = jnp.asarray(batch["im2"])
        gt = jnp.asarray(batch["flow"])
        pyr_fw = gt_pyramid(gt)
        # Backward GT flow: for these smooth similarity motions,
        # bw(p) ~= -fw(p) to first order (exact for pure translation).
        pyr_bw = [-p for p in pyr_fw]
        curve = [round(float(loss_at(a, im1, im2, pyr_fw, pyr_bw)), 3)
                 for a in alphas]
        out["modes"][mode] = {
            "loss_at_alpha": dict(zip(map(str, alphas), curve)),
            "zero_minus_gt": round(curve[0] - curve[alphas.index(1.0)], 3),
            "monotone_to_gt": bool(
                all(curve[i] >= curve[i + 1]
                    for i in range(alphas.index(1.0)))),
        }
        print(mode, out["modes"][mode], flush=True)

    bench = Path(__file__).resolve().parent.parent / "benchmarks"
    bench.mkdir(exist_ok=True)
    (bench / "loss_landscape.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
