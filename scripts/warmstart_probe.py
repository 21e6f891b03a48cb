"""Supervised-warmstart -> unsupervised-continuation basin probe.

VERDICT r4 item 1c. The held-out experiment shows unsupervised training
from random init parking at the zero-flow basin. This probe separates
the two remaining explanations:

  * Phase A: train SUPERVISED on the same synthetic stream (direct EPE
    regression — must converge or the architecture/data are broken).
  * Phase B: continue UNSUPERVISED from phase A's params.
      - AEE holds / improves  -> the GT basin is a stable minimum of the
        paper objective; random init just can't reach it at this scale
        (optimization problem: more steps / schedule / curriculum).
      - AEE collapses back to zero-flow -> the unsupervised objective
        (as implemented) prefers zero flow; bug hunt in the loss stack.

(Reference analog: none — upstream never needed this; its CSS recipes
start from a working unsupervised C stage. Cf. src/e2eflow/core/
supervised.py for the phase-A loss.)

  python scripts/warmstart_probe.py [--sup-steps 2000] [--unsup-steps 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from heldout_generalization import HELDOUT_SEED, make_eval_fn  # noqa: E402


def _setup_compile_cache():
    import jax

    cache = Path(__file__).resolve().parent.parent / ".cache" / "jax"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_phase(name, supervised, steps, eval_every, args, exp_root,
              lr, finetune_from=None):
    _setup_compile_cache()
    from unflow_tpu.config import Config
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.parallel import create_mesh
    from unflow_tpu.train import Trainer, build_model

    h, w, batch = args.hw[0], args.hw[1], args.batch
    cfg = Config()
    t = cfg.train
    t.flownet = "C"
    t.height, t.width = h, w
    t.batch_size = batch
    t.num_iters = steps
    t.learning_rate = lr
    t.decay_after = steps
    t.display_interval = eval_every
    t.save_interval = steps
    t.eval_interval = eval_every
    t.image_summary_interval = -1
    t.compute_dtype = args.dtype
    t.supervised = supervised
    t.grad_clip_norm = args.grad_clip
    t.aug_photometric = not args.no_photometric
    t.aug_hflip = not args.no_hflip
    t.aug_noise_stddev = args.noise

    exp = exp_root / name
    if exp.exists():
        shutil.rmtree(exp)
    exp.mkdir(parents=True)

    model = build_model(cfg)
    eval_fn, zero_aee = make_eval_fn(model, h, w, batch, "affine",
                                     max_shift=args.max_shift)
    if args.corpus:
        from unflow_tpu.data.synthetic import corpus_iterator

        # uint8 frames: 4x smaller H2D transfers (and 4x slower PJRT
        # staging leak); the Trainer converts on device. GT flow stays f32.
        it = corpus_iterator(batch, h, w, n_pairs=args.corpus, seed=0,
                             supervised=supervised, mode="affine",
                             max_shift=args.max_shift,
                             cache_dir=str(exp_root / "synth_cache"),
                             dtype="uint8")
    else:
        it = batch_iterator(batch, h, w, seed=0, supervised=supervised,
                            mode="affine", max_shift=args.max_shift)
    tr = Trainer(
        cfg, exp, it,
        mesh=create_mesh(1), eval_fn=eval_fn,
        finetune_dirs=[finetune_from] if finetune_from else (),
    )
    tr.run()
    tr.ckpt.close()

    curve = []
    for line in (exp / "metrics.jsonl").read_text().splitlines():
        row = json.loads(line)
        if "eval/heldout_aee" in row:
            curve.append({"step": row["step"],
                          "aee": round(row["eval/heldout_aee"], 4)})
    losses = []
    for line in (exp / "metrics.jsonl").read_text().splitlines():
        row = json.loads(line)
        if "loss" in row:
            losses.append(round(row["loss"], 2))
    return {"curve": curve, "loss_curve": losses,
            "final_aee": curve[-1]["aee"] if curve else None,
            "zero_flow_aee": round(zero_aee, 4)}, exp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sup-steps", type=int, default=2000)
    ap.add_argument("--unsup-steps", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--sup-lr", type=float, default=1e-4,
                    help="phase-A lr. 1e-4 (FlowNet paper value): 1e-3 "
                         "diverges unclipped and parks at the input-"
                         "independent constant basin clipped (r5 "
                         "input_dependence_probe findings); overfit-speed "
                         "intuition from validate_convergence.py does NOT "
                         "transfer to stream learning")
    ap.add_argument("--unsup-lr", type=float, default=1e-4,
                    help="phase-B lr (>=2e-4 explodes to the zero-flow "
                         "basin per validate_convergence.py)")
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="global-norm clip for BOTH phases (0=off). At lr "
                         "1e-4 no clip is needed; the r5 collapse recipe "
                         "was lr 1e-3 + clip 1.0")
    ap.add_argument("--sup-eval-every", type=int, default=0,
                    help="phase-A eval cadence (0 = --eval-every)")
    ap.add_argument("--skip-b", action="store_true",
                    help="phase A only (supervised plateau calibration)")
    ap.add_argument("--corpus", type=int, default=0,
                    help="fixed train corpus of N pairs (epoch cycling) "
                         "instead of the fresh-pair stream; 0 = stream")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--max-shift", type=float, default=32.0,
                    help="synthetic max displacement (see "
                         "heldout_generalization.py --max-shift)")
    ap.add_argument("--noise", type=float, default=0.04,
                    help="photometric per-frame noise stddev (the one "
                         "aug component that corrupts matching)")
    ap.add_argument("--no-photometric", action="store_true",
                    help="disable the Trainer's photometric augmentation")
    ap.add_argument("--no-hflip", action="store_true",
                    help="disable the shared random horizontal flip")
    ap.add_argument("--exp-root", default="log/ex/warmstart")
    args = ap.parse_args()
    root = Path(args.exp_root)

    print("=== phase A: supervised ===", flush=True)
    sup, sup_dir = run_phase("sup", True, args.sup_steps,
                             args.sup_eval_every or args.eval_every,
                             args, root, args.sup_lr)
    print(json.dumps(sup), flush=True)
    if args.skip_b:
        bench = Path(__file__).resolve().parent.parent / "benchmarks"
        bench.mkdir(exist_ok=True)
        (bench / "warmstart_probe.json").write_text(json.dumps(
            {"supervised_only": sup}, indent=1))
        return 0

    print("=== phase B: unsupervised continuation ===", flush=True)
    unsup, _ = run_phase("unsup_cont", False, args.unsup_steps,
                         args.eval_every, args, root, args.unsup_lr,
                         finetune_from=sup_dir)
    print(json.dumps(unsup), flush=True)

    summary = {
        "geometry": (f"{args.hw[0]}x{args.hw[1]} batch {args.batch} "
                     f"{'bf16' if args.dtype == 'bfloat16' else 'f32'} "
                     f"FlowNetC, sup lr {args.sup_lr:g} / unsup lr "
                     f"{args.unsup_lr:g} flat, data mode=affine, "
                     f"max_shift {args.max_shift:g}"),
        "supervised": sup,
        "unsupervised_continuation": unsup,
        "zero_flow_aee": sup["zero_flow_aee"],
        "basin_stable": bool(
            unsup["final_aee"] is not None and sup["final_aee"] is not None
            and unsup["final_aee"] < 0.7 * sup["zero_flow_aee"]
        ),
    }
    bench = Path(__file__).resolve().parent.parent / "benchmarks"
    bench.mkdir(exist_ok=True)
    (bench / "warmstart_probe.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
