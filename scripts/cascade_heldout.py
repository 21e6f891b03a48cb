"""CSS cascade vs held-out AEE: does stacking help? (VERDICT r4 item 7)

The paper's entire reason for CSS is stage-over-stage improvement: train
C, freeze it, train an S on the residual (cS), freeze, train another S
(csS). tests/test_recipe.py proves the recipe *plumbing* (per-stage
init/freeze/restore); this script is the missing *learning* artifact —
per-stage held-out AEE on the synthetic distribution, with the r5
working recipe (lr 1e-4, max_shift 32; see heldout_generalization.py's
module docstring for the diagnosis that produced it).

Stages train UNSUPERVISED (the paper recipe; cf. reference
src/e2eflow/core/flownet.py::flownet stack dispatcher and the README's
CSS training sequence). Stage i>0 initializes from the previous stage's
experiment via the Trainer's finetune machinery — the cS checkpoint
already carries the frozen C params, so csS needs only the cS dir.

  python scripts/cascade_heldout.py [--stage-steps 8000 6000 6000]
      [--bootstrap-until N] [--noise 0] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from heldout_generalization import make_eval_fn  # noqa: E402
from warmstart_probe import _setup_compile_cache  # noqa: E402

SPECS = ("C", "cS", "csS")


def run_stage(spec, steps, args, exp_root, finetune_from, bootstrap_until=0):
    _setup_compile_cache()
    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import corpus_iterator
    from unflow_tpu.parallel import create_mesh
    from unflow_tpu.train import Trainer, build_model

    h, w = args.hw
    curve = []
    exp = exp_root / spec
    if exp.exists():
        shutil.rmtree(exp)
    exp.mkdir(parents=True)

    # Bootstrap-phase handling mirrors heldout_generalization.py: the
    # Trainer jits one program per (objective) segment, so the photo->
    # paper switch is a fresh Trainer against the same experiment dir.
    phases = []
    if bootstrap_until and bootstrap_until < steps:
        phases = [(0, bootstrap_until, True), (bootstrap_until, steps, False)]
    else:
        phases = [(0, steps, bootstrap_until >= steps)]

    for start, until, bootstrap in phases:
        cfg = Config()
        t = cfg.train
        t.flownet = spec
        t.height, t.width = h, w
        t.batch_size = args.batch
        t.num_iters = until
        t.learning_rate = args.lr
        t.decay_after = until
        t.display_interval = 250
        t.save_interval = until - start
        t.eval_interval = args.eval_every
        t.image_summary_interval = -1
        t.compute_dtype = args.dtype
        t.aug_noise_stddev = args.noise
        if bootstrap:
            t.ternary_weight = 0.0
            t.photo_weight = 1.0
            t.occ_weight = 0.0
            t.mask_occlusion = ""
        model = build_model(cfg)
        eval_fn, zero_aee = make_eval_fn(model, h, w, args.batch, "affine",
                                         max_shift=args.max_shift)
        it = corpus_iterator(args.batch, h, w, n_pairs=args.corpus, seed=0,
                             mode="affine", max_shift=args.max_shift,
                             start_batch=start,
                             cache_dir=str(exp_root / "synth_cache"),
                             dtype="uint8")
        tr = Trainer(cfg, exp, it, mesh=create_mesh(1), eval_fn=eval_fn,
                     finetune_dirs=[finetune_from] if finetune_from else ())
        tr.run(max_iters=until)
        tr.ckpt.close()
        del tr

    for line in (exp / "metrics.jsonl").read_text().splitlines():
        row = json.loads(line)
        if "eval/heldout_aee" in row:
            curve.append({"step": row["step"],
                          "aee": round(row["eval/heldout_aee"], 4)})
    return {
        "spec": spec,
        "steps": steps,
        "curve": curve,
        "final_aee": curve[-1]["aee"] if curve else None,
        "best_aee": min((c["aee"] for c in curve), default=None),
        "zero_flow_aee": round(zero_aee, 4),
    }, exp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage-steps", type=int, nargs=3, default=(8000, 6000, 6000))
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--corpus", type=int, default=4096)
    ap.add_argument("--max-shift", type=float, default=32.0)
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--bootstrap-until", type=int, default=0,
                    help="stage-1 (C) photometric escape phase length; "
                         "later stages always train the paper objective")
    ap.add_argument("--exp-root", default="log/ex/cascade")
    args = ap.parse_args()

    exp_root = Path(args.exp_root)
    exp_root.mkdir(parents=True, exist_ok=True)

    stages, prev_dir = [], None
    for i, (spec, steps) in enumerate(zip(SPECS, args.stage_steps)):
        print(f"=== stage {spec} ({steps} steps) ===", flush=True)
        result, prev_dir = run_stage(
            spec, steps, args, exp_root, prev_dir,
            bootstrap_until=args.bootstrap_until if i == 0 else 0)
        print(json.dumps(result), flush=True)
        stages.append(result)

    summary = {
        "geometry": (f"{args.hw[0]}x{args.hw[1]} batch {args.batch} "
                     f"{args.dtype}, unsupervised, lr {args.lr:g} flat, "
                     f"max_shift {args.max_shift:g}, corpus {args.corpus}, "
                     f"noise {args.noise:g}"),
        "recipe": "paper CSS: C -> freeze -> cS -> freeze -> csS "
                  "(reference core/flownet.py stack dispatcher)",
        "bootstrap_until": args.bootstrap_until,
        "stages": stages,
        "zero_flow_aee": stages[0]["zero_flow_aee"],
        "stage_final_aees": [s["final_aee"] for s in stages],
        "stacking_helps": bool(
            all(s["final_aee"] is not None for s in stages)
            and stages[-1]["final_aee"] < stages[0]["final_aee"]
        ),
    }
    bench = Path(__file__).resolve().parent.parent / "benchmarks"
    bench.mkdir(exist_ok=True)
    (bench / "cascade_heldout.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
