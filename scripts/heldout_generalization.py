"""Held-out generalization + affine-augmentation A/B on the real chip.

VERDICT r3 items 4-5, redone per VERDICT r4 item 1. Round-3 convergence
evidence was a single-batch overfit; this script trains UnFlow-C
unsupervised on the step-indexed synthetic STREAM (fresh textures +
motions every batch) and evaluates AEE on a FIXED held-out set the model
never trains on — i.e. the objective must generalize across the
distribution, not memorize.

The r4 run recorded generalizes:false on the old kron-block/global-
integer-translation data; the r5 pilot on rebuilt smooth-texture data
STILL parked at the zero-flow basin, predicting one input-independent
near-constant flow for every example (scripts/checkpoint_autopsy.py).
The r5 probe ladder (scripts/input_dependence_probe.py +
benchmarks/warmstart_probe.json) then isolated TWO causes, neither of
them the unsupervised objective:

  1. **Learning rate.** lr 1e-3 DIVERGES unclipped within 200 steps
     (probe AEE ~4900 px); clipped to 1.0 it survives but parks at the
     input-independent constant basin. All earlier "supervised
     warmstart" evidence used that recipe. lr 1e-4 (the FlowNet paper
     value) is stable and fits 2 alternating batches input-dependently
     in 300 steps.
  2. **Motion scale.** max_shift=8 at 128x256 keeps the TRUE
     displacement below every operating point of the architecture:
     <= 1 px at the 1/8-res correlation (whose stride-2 taps are 16
     full-res px apart, so the cost-volume argmax never leaves the
     center tap), <= 2 px at the finest prediction scale, <= 0.13 px at
     flow6. The matching signal is purely analog/sub-tap everywhere —
     SUPERVISED EPE regression on a fresh-pair stream stays at the
     zero-flow plateau for 4000+ steps (with or without augmentation).
     At max_shift=32 the motion spans multiple correlation taps and
     every pyramid level sees super-pixel motion: the same supervised
     recipe reaches held-out AEE 0.20x zero-flow within 4000 steps.
     KITTI/SYNTHIA motions (tens of px) are in that regime, which is
     why the reference never hit this.

--bootstrap-until remains available as an optional escape phase (plain
photometric charbonnier, occlusion masking off, then the unmodified
paper objective), but the primary fix is max_shift + lr. --segments:
long runs are split into process-recycled segments (this environment's
tunneled PJRT client leaks every H2D staging buffer, see
scripts/longrun_stability.py) that resume from checkpoints on the
step-indexed stream, bit-faithfully.

Pass criterion: final held-out AEE < --criterion * zero-flow AEE
(default 0.5). Why 0.5: zero-flow is the trivial predictor every
collapsed run matches to within noise (r4's run sat at 0.96-1.04x);
halving it cannot be noise or collapse — it requires the net to infer
per-example motion from the frames. The paper's own margin is far larger
(KITTI-2012 AEE 3.29 vs a ~9px zero-flow baseline, i.e. ~0.37x), so 0.5
is a lenient-but-meaningful bar for a short synthetic run.

(Reference analog: src/eval_gui.py metric runs are the upstream's only
correctness instrument; this is the environment-feasible equivalent —
no KITTI/Sintel data or network egress exists here.)

  python scripts/heldout_generalization.py [--steps 4000] [--eval-every 500]
      [--arms both|off|on] [--data-mode affine|translate] [--criterion 0.5]
      [--segments N] [--hw H W] [--batch B] [--lr LR] [--decay-after N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HELDOUT_SEED = 777_000  # far from any training stream seed
HELDOUT_BATCHES = 8     # fixed held-out pairs, never trained on


def make_eval_fn(model, h, w, batch, data_mode, max_shift=8.0):
    import jax
    import jax.numpy as jnp

    from unflow_tpu.augment import normalize
    from unflow_tpu.data.synthetic import batch_iterator
    from unflow_tpu.eval.metrics import flow_error_avg
    from unflow_tpu.models import full_res_flow
    from unflow_tpu.train.trainer import DEFAULT_NORMALIZATION

    mean, std = DEFAULT_NORMALIZATION
    it = batch_iterator(batch, h, w, seed=HELDOUT_SEED, supervised=True,
                        mode=data_mode, max_shift=max_shift)
    held = [next(it) for _ in range(HELDOUT_BATCHES)]

    @jax.jit
    def fwd_aee(params, im1, im2, gt):
        n1, n2 = normalize(im1, mean, std), normalize(im2, mean, std)
        stages = model.apply({"params": params}, n1, n2)
        flow = full_res_flow(stages[-1], h, w)
        return flow_error_avg(flow, gt)

    zero_flow_aee = float(
        np.mean([
            float(flow_error_avg(jnp.zeros((batch, h, w, 2)), jnp.asarray(b["flow"])))
            for b in held
        ])
    )

    def eval_fn(params):
        aees = [
            float(fwd_aee(params, jnp.asarray(b["im1"]), jnp.asarray(b["im2"]),
                          jnp.asarray(b["flow"])))
            for b in held
        ]
        return {"heldout_aee": float(np.mean(aees))}

    return eval_fn, zero_flow_aee


def build_cfg(args, affine: bool, bootstrap: bool = False):
    from unflow_tpu.config import Config

    h, w = args.hw
    cfg = Config()
    t = cfg.train
    if bootstrap:
        # Escape phase for the input-independence collapse (see module
        # docstring): the census/ternary transform is a local high-pass,
        # so at a constant wrong flow its gradient over a random-texture
        # distribution is ~zero-mean noise and the net converges to an
        # input-INDEPENDENT constant prediction (measured on the r5
        # pilot: identical flow for every held-out example). The plain
        # photometric charbonnier keeps the smooth multi-octave texture's
        # long-range intensity gradients, so each example's data gradient
        # points at ITS motion — breaking the collapse. Occlusion
        # masking/penalty are off during bootstrap (fb-inconsistency of a
        # half-trained pair of flows would mask exactly the pixels that
        # carry signal). Steps >= --bootstrap-until use the unmodified
        # paper objective.
        t.ternary_weight = 0.0
        t.photo_weight = 1.0
        t.occ_weight = 0.0
        t.mask_occlusion = ""
    t.flownet = "C"
    t.height, t.width = h, w
    t.batch_size = args.batch
    t.num_iters = args.steps
    t.learning_rate = args.lr
    t.decay_after = args.decay_after or args.steps  # default: flat LR
    t.decay_interval = max((args.steps - t.decay_after) // 2, 1)
    t.display_interval = min(args.eval_every, 250)
    t.save_interval = max(args.steps // max(args.segments, 1), 1)
    t.eval_interval = args.eval_every
    t.image_summary_interval = -1
    t.compute_dtype = args.dtype
    t.grad_clip_norm = args.grad_clip
    t.aug_photometric = not args.no_photometric
    t.aug_hflip = not args.no_hflip
    t.aug_noise_stddev = args.noise
    if affine:
        # The shipped conservative ranges (configs/synthia_pretrain_c_affine.ini)
        t.aug_translate = 0.05
        t.aug_rotate = 3.0
        t.aug_zoom_min = 0.95
        t.aug_zoom_max = 1.05
        t.aug_rel_translate = 0.01
        t.aug_rel_rotate = 0.5
        t.aug_rel_zoom = 0.01
    return cfg


def run_segment(args, exp_root: Path) -> int:
    """Child mode: resume arm at ``start``, train to ``until``, exit."""
    import jax

    cache = Path(__file__).resolve().parent.parent / ".cache" / "jax"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unflow_tpu.data.synthetic import batch_iterator, corpus_iterator
    from unflow_tpu.parallel import create_mesh
    from unflow_tpu.train import Trainer, build_model

    name, start, until = args.run_segment
    start, until = int(start), int(until)
    h, w = args.hw
    bootstrap = bool(args.bootstrap_until) and until <= args.bootstrap_until
    # Segments must not straddle the objective switch (run_variant aligns
    # the boundary); the Trainer jits ONE program per segment.
    assert bootstrap or start >= args.bootstrap_until, (start, until)
    cfg = build_cfg(args, affine=name == "affine_on", bootstrap=bootstrap)
    model = build_model(cfg)
    eval_fn, _ = make_eval_fn(model, h, w, args.batch, args.data_mode,
                              max_shift=args.max_shift)
    if args.corpus:
        # Fixed finite train corpus cycled in epochs (reference regime;
        # also decouples feeding from this host's single core).
        # uint8 frames: 4x smaller H2D transfers (and 4x slower PJRT
        # staging leak); the Trainer converts on device.
        it = corpus_iterator(args.batch, h, w, n_pairs=args.corpus, seed=0,
                             mode=args.data_mode, start_batch=start,
                             max_shift=args.max_shift,
                             cache_dir=str(Path(args.exp_root) / "synth_cache"),
                             dtype="uint8")
    else:
        it = batch_iterator(args.batch, h, w, seed=0, mode=args.data_mode,
                            max_shift=args.max_shift, start_batch=start)
    tr = Trainer(cfg, exp_root / name, it, mesh=create_mesh(1),
                 eval_fn=eval_fn)
    assert tr.step == start, f"segment resume landed at {tr.step}, wanted {start}"
    tr.run(max_iters=until)
    assert tr.step == until, tr.step
    tr.ckpt.close()
    print(f"segment {name} [{start}, {until}) done", flush=True)
    return 0


def run_variant(name: str, args, exp_root: Path):
    from unflow_tpu.train import build_model

    h, w = args.hw
    exp = exp_root / name
    if exp.exists():
        shutil.rmtree(exp)
    exp.mkdir(parents=True)

    model = build_model(build_cfg(args, affine=name == "affine_on"))
    _, zero_aee = make_eval_fn(model, h, w, args.batch, args.data_mode,
                               max_shift=args.max_shift)

    bounds = [args.steps * i // args.segments for i in range(args.segments + 1)]
    if args.bootstrap_until and 0 < args.bootstrap_until < args.steps:
        bounds = sorted(set(bounds) | {args.bootstrap_until})
    t0 = time.perf_counter()
    for start, until in zip(bounds, bounds[1:]):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--run-segment", name, str(start), str(until)]
        cmd += _forwarded_args(args)
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            raise RuntimeError(f"{name} segment [{start},{until}) rc={rc}")
        print(f"[{time.perf_counter() - t0:.0f}s] {name} segment "
              f"[{start}, {until}) done", flush=True)
    wall = time.perf_counter() - t0

    curve, train_loss = [], []
    for line in (exp / "metrics.jsonl").read_text().splitlines():
        row = json.loads(line)
        if "eval/heldout_aee" in row:
            curve.append({"step": row["step"],
                          "aee": round(row["eval/heldout_aee"], 4)})
        if "loss" in row and row["step"] % args.eval_every == 0:
            train_loss.append({"step": row["step"],
                               "loss": round(row["loss"], 2)})
    return {
        "curve": curve,
        "train_loss": train_loss,
        "final_aee": curve[-1]["aee"] if curve else None,
        "best_aee": min((c["aee"] for c in curve), default=None),
        "zero_flow_aee": round(zero_aee, 4),
        "wall_s": round(wall, 1),
    }


def _forwarded_args(args) -> list[str]:
    fwd = ["--steps", str(args.steps), "--eval-every", str(args.eval_every),
           "--hw", str(args.hw[0]), str(args.hw[1]),
           "--batch", str(args.batch), "--lr", str(args.lr),
           "--decay-after", str(args.decay_after),
           "--grad-clip", str(args.grad_clip),
           "--segments", str(args.segments), "--corpus", str(args.corpus),
           "--bootstrap-until", str(args.bootstrap_until),
           "--max-shift", str(args.max_shift), "--dtype", args.dtype,
           "--noise", str(args.noise),
           "--data-mode", args.data_mode, "--exp-root", str(args.exp_root)]
    if args.no_photometric:
        fwd.append("--no-photometric")
    if args.no_hflip:
        fwd.append("--no-hflip")
    return fwd


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--decay-after", type=int, default=0,
                    help="LR halving start step; 0 = flat LR for the window")
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="optax global-norm clip (0 = off)")
    ap.add_argument("--segments", type=int, default=1,
                    help="process-recycling boundaries (PJRT leak, see "
                         "module docstring); each is a kill/resume")
    ap.add_argument("--arms", choices=("both", "off", "on"), default="both")
    ap.add_argument("--data-mode", choices=("affine", "translate"),
                    default="affine")
    ap.add_argument("--max-shift", type=float, default=32.0,
                    help="synthetic max displacement in px. Default 32: "
                         "motions must span multiple correlation taps and "
                         "exceed a pixel at the prediction scales or the "
                         "matching signal is unlearnably analog (the r5 "
                         "diagnosis; 8 reproduces the failing regime)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--noise", type=float, default=0.04,
                    help="photometric per-frame noise stddev")
    ap.add_argument("--no-photometric", action="store_true")
    ap.add_argument("--no-hflip", action="store_true")
    ap.add_argument("--corpus", type=int, default=0,
                    help="train on a FIXED corpus of N pairs cycled in "
                         "epochs (reference regime) instead of the "
                         "infinite fresh-pair stream; 0 = stream")
    ap.add_argument("--bootstrap-until", type=int, default=0,
                    help="steps before this train with the photometric "
                         "bootstrap objective (photo=1, ternary=0, occ=0, "
                         "no occlusion masking) to break the input-"
                         "independence collapse; steps after use the "
                         "unmodified paper objective. 0 = paper objective "
                         "throughout")
    ap.add_argument("--criterion", type=float, default=0.5,
                    help="pass iff final AEE < criterion * zero-flow AEE "
                         "(see module docstring for why 0.5)")
    ap.add_argument("--exp-root", default="log/ex/heldout")
    ap.add_argument("--out", default="heldout_generalization.json",
                    help="artifact filename under benchmarks/")
    ap.add_argument("--run-segment", nargs=3, metavar=("ARM", "START", "UNTIL"),
                    help=argparse.SUPPRESS)  # internal child mode
    args = ap.parse_args()

    if args.run_segment:
        return run_segment(args, Path(args.exp_root))

    arms = {"both": ("affine_off", "affine_on"), "off": ("affine_off",),
            "on": ("affine_on",)}[args.arms]
    results = {}
    for name in arms:
        print(f"=== {name} ===", flush=True)
        results[name] = run_variant(name, args, Path(args.exp_root))
        print(json.dumps(results[name]), flush=True)

    primary = results.get("affine_off") or results["affine_on"]
    summary = {
        "geometry": (f"{args.hw[0]}x{args.hw[1]} batch {args.batch} "
                     f"{'bf16' if args.dtype == 'bfloat16' else 'f32'}, "
                     f"FlowNetC unsupervised, lr {args.lr:g}"
                     + ("" if args.decay_after else " flat")
                     + f", max_shift {args.max_shift:g}"),
        "train_stream": (
            f"fixed corpus of {args.corpus} pairs seed 0, "
            f"mode={args.data_mode}, per-epoch reshuffle" if args.corpus else
            f"synthetic step-indexed stream seed 0, "
            f"mode={args.data_mode} (fresh pairs every batch)"),
        "heldout": (f"{HELDOUT_BATCHES * args.batch} fixed pairs, "
                    f"seed {HELDOUT_SEED} (never trained on)"),
        "steps": args.steps,
        "segments": args.segments,
        "bootstrap": (
            f"steps [0, {args.bootstrap_until}): photometric-charbonnier "
            "data term, no occlusion masking/penalty (collapse-escape "
            "phase, see module docstring); steps >= "
            f"{args.bootstrap_until}: unmodified paper objective "
            "(census + 2nd-order smooth + fb + occ)"
            if args.bootstrap_until else "none (paper objective throughout)"),
        "zero_flow_aee": primary["zero_flow_aee"],
        "criterion": (f"final_aee < {args.criterion} * zero_flow_aee; 0.5 "
                      "because collapsed runs match zero-flow within ~5% "
                      "(r4 artifact) while the paper's real-data margin is "
                      "~0.37x — see module docstring"),
        **results,
    }
    if "affine_off" in results and "affine_on" in results:
        off, on = results["affine_off"], results["affine_on"]
        if off["final_aee"] is not None and on["final_aee"] is not None:
            summary["affine_aee_delta"] = round(
                on["final_aee"] - off["final_aee"], 4)
    summary["generalizes"] = bool(
        primary["final_aee"] is not None
        and primary["final_aee"] < args.criterion * primary["zero_flow_aee"]
    )
    bench_dir = Path(__file__).resolve().parent.parent / "benchmarks"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / args.out).write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
