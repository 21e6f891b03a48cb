"""Stacked CSS cascade vs the held-out metric (VERDICT r4 item 7).

The paper's entire reason for stacking (reference SURVEY.md §3.2,
`core/flownet.py::flownet` stack dispatcher) is that each refinement
stage IMPROVES flow quality: train C, freeze it, train S on the residual
(cS), freeze both, train the second S (csS). The recipe plumbing is
already exercised end to end (tests/test_recipe.py); what no artifact
showed before this script is stacking *helping* on data the model never
trains on.

This script measures exactly that, on the held-out generalization setup
that produced `benchmarks/heldout_h2_bootstrap.json` (the first
generalizes:true artifact): same fixed 4096-pair synthetic corpus (seed
0, affine similarity motions up to 32 px), same 64 fixed held-out pairs
(seed 777000), same geometry (128x256 batch 8 bf16, lr 1e-4 flat).

  stage 1 (C):   NOT retrained — the completed h2 affine_off experiment
                 (--stage1, default log/ex/h2/affine_off) is restored
                 and its held-out AEE re-measured as the baseline.
  stage 2 (cS):  flownet=cS, stage0 frozen + restored from stage 1,
                 trained with the UNMODIFIED paper objective (no
                 bootstrap phase: the collapse is a cold-start
                 pathology — see scripts/heldout_generalization.py —
                 and stage0 already feeds the S stage a near-true flow
                 plus the warped second frame).
  stage 3 (csS): flownet=csS, stages 0-1 frozen + restored from
                 stages 1-2, second S trained the same way.

Pass criterion: held-out AEE improves stage-over-stage
(csS < cS < C). Long runs are split into process-recycled segments
(--segments) for the tunneled-PJRT staging-buffer leak, resuming from
checkpoints on the step-indexed stream (see
scripts/longrun_stability.py).

  python scripts/cascade_heldout.py [--steps 4000] [--eval-every 250]
      [--batch 8] [--corpus 4096] [--segments 2]
      [--stage1 log/ex/h2/affine_off] [--out cascade_heldout.json]
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import numpy as np

from heldout_generalization import (  # noqa: E402
    HELDOUT_BATCHES,
    HELDOUT_SEED,
    build_cfg,
    make_eval_fn,
)

STAGE_SPECS = {"cS": 1, "csS": 2}  # spec -> index of the trainable stage


def _stage_cfg(args, spec: str):
    """The h2 recipe config with the cascade spec swapped in."""
    ns = argparse.Namespace(**vars(args), no_photometric=False,
                            no_hflip=False, noise=0.04)
    cfg = build_cfg(ns, affine=False, bootstrap=False)
    cfg.train.flownet = spec
    return cfg


def _finetune_dirs(args, spec: str, exp_root: Path) -> list[Path]:
    dirs = [Path(args.stage1)]
    if spec == "csS":
        dirs.append(exp_root / "cS")
    return dirs


def run_segment(args, exp_root: Path) -> int:
    import jax

    cache = Path(REPO) / ".cache" / "jax"
    cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unflow_tpu.data.synthetic import corpus_iterator
    from unflow_tpu.parallel import create_mesh
    from unflow_tpu.train import Trainer, build_model

    spec, start, until = args.run_segment
    start, until = int(start), int(until)
    h, w = args.hw
    cfg = _stage_cfg(args, spec)
    model = build_model(cfg)
    eval_fn, _ = make_eval_fn(model, h, w, args.batch, "affine",
                              max_shift=args.max_shift)
    it = corpus_iterator(args.batch, h, w, n_pairs=args.corpus, seed=0,
                         mode="affine", start_batch=start,
                         max_shift=args.max_shift,
                         cache_dir=args.synth_cache, dtype="uint8")
    tr = Trainer(cfg, exp_root / spec, it, mesh=create_mesh(1),
                 eval_fn=eval_fn,
                 finetune_dirs=_finetune_dirs(args, spec, exp_root))
    assert tr.step == start, f"segment resume landed at {tr.step}, wanted {start}"
    tr.run(max_iters=until)
    assert tr.step == until, tr.step
    tr.ckpt.close()
    print(f"segment {spec} [{start}, {until}) done", flush=True)
    return 0


def eval_stage1(args) -> tuple[float, float]:
    """Held-out AEE of the restored stage-1 (C) experiment, measured
    with the same eval path the cascade stages use."""
    import jax

    from unflow_tpu.train import build_model
    from unflow_tpu.train.checkpoint import restore_params

    h, w = args.hw
    ns = argparse.Namespace(**vars(args), no_photometric=False,
                            no_hflip=False, noise=0.04)
    cfg = build_cfg(ns, affine=False, bootstrap=False)  # flownet = "C"
    model = build_model(cfg)
    eval_fn, zero = make_eval_fn(model, h, w, args.batch, "affine",
                                 max_shift=args.max_shift)
    params = restore_params(Path(args.stage1))
    aee = eval_fn(jax.device_put(params))["heldout_aee"]
    return float(aee), float(zero)


def run_stage(spec: str, args, exp_root: Path) -> dict:
    exp = exp_root / spec
    if exp.exists():
        shutil.rmtree(exp)
    exp.mkdir(parents=True)

    bounds = [args.steps * i // args.segments for i in range(args.segments + 1)]
    t0 = time.perf_counter()
    for start, until in zip(bounds, bounds[1:]):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--run-segment", spec, str(start), str(until)]
        cmd += _forwarded_args(args)
        rc = subprocess.run(cmd).returncode
        if rc != 0:
            raise RuntimeError(f"{spec} segment [{start},{until}) rc={rc}")
        print(f"[{time.perf_counter() - t0:.0f}s] {spec} segment "
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
        "spec": spec,
        "curve": curve,
        "train_loss": train_loss,
        "final_aee": curve[-1]["aee"] if curve else None,
        "best_aee": min((c["aee"] for c in curve), default=None),
        "wall_s": round(wall, 1),
    }


def _forwarded_args(args) -> list[str]:
    return ["--steps", str(args.steps), "--eval-every", str(args.eval_every),
            "--hw", str(args.hw[0]), str(args.hw[1]),
            "--batch", str(args.batch), "--lr", str(args.lr),
            "--decay-after", str(args.decay_after),
            "--grad-clip", str(args.grad_clip),
            "--segments", str(args.segments), "--corpus", str(args.corpus),
            "--max-shift", str(args.max_shift), "--dtype", args.dtype,
            "--bootstrap-until", "0",
            "--stage1", str(args.stage1),
            "--synth-cache", str(args.synth_cache),
            "--exp-root", str(args.exp_root)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--decay-after", type=int, default=0)
    ap.add_argument("--grad-clip", type=float, default=0.0)
    ap.add_argument("--segments", type=int, default=2)
    ap.add_argument("--corpus", type=int, default=4096)
    ap.add_argument("--max-shift", type=float, default=32.0)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--bootstrap-until", type=int, default=0,
                    help="kept for build_cfg compat; cascade stages train "
                         "with the unmodified paper objective")
    ap.add_argument("--stage1", default="log/ex/h2/affine_off",
                    help="completed FlowNetC experiment dir (stage-1 "
                         "checkpoint; see benchmarks/heldout_h2_bootstrap.json)")
    ap.add_argument("--synth-cache", default="log/ex/h2/synth_cache",
                    help="corpus cache dir (reuses the h2 corpus by default)")
    ap.add_argument("--exp-root", default="log/ex/cascade")
    ap.add_argument("--out", default="cascade_heldout.json")
    ap.add_argument("--run-segment", nargs=3, metavar=("SPEC", "START", "UNTIL"),
                    help=argparse.SUPPRESS)  # internal child mode
    args = ap.parse_args()

    exp_root = Path(args.exp_root)
    if args.run_segment:
        return run_segment(args, exp_root)

    print("=== stage 1 (C, restored) ===", flush=True)
    c_aee, zero = eval_stage1(args)
    print(f"stage1 heldout_aee={c_aee:.4f} zero_flow={zero:.4f}", flush=True)

    stages = {"C": {"spec": "C", "final_aee": round(c_aee, 4),
                    "restored_from": str(args.stage1)}}
    for spec in ("cS", "csS"):
        print(f"=== stage {spec} ===", flush=True)
        stages[spec] = run_stage(spec, args, exp_root)
        print(json.dumps({k: v for k, v in stages[spec].items()
                          if k not in ("curve", "train_loss")}), flush=True)

    improves = (stages["csS"]["final_aee"] < stages["cS"]["final_aee"]
                < stages["C"]["final_aee"])
    summary = {
        "geometry": (f"{args.hw[0]}x{args.hw[1]} batch {args.batch} "
                     f"{'bf16' if args.dtype == 'bfloat16' else 'f32'}, "
                     f"lr {args.lr:g} flat, max_shift {args.max_shift:g}"),
        "train_stream": (f"fixed corpus of {args.corpus} pairs seed 0, "
                         "mode=affine, per-epoch reshuffle (the h2 corpus)"),
        "heldout": (f"{HELDOUT_BATCHES * args.batch} fixed pairs, "
                    f"seed {HELDOUT_SEED} (never trained on)"),
        "steps_per_stage": args.steps,
        "objective": ("unmodified paper objective (census + 2nd-order "
                      "smooth + fb + occ); no bootstrap phase — the "
                      "refinement stages start from a working stage-1 flow"),
        "zero_flow_aee": round(zero, 4),
        "stages": stages,
        "criterion": "held-out AEE improves stage-over-stage: csS < cS < C",
        "stacking_improves": bool(improves),
    }
    bench_dir = Path(REPO) / "benchmarks"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / args.out).write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
